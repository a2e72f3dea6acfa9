package graft.core

/** LSB-first (little-endian bit order) bit stream kernel.
  *
  * Bit k of the stream lives at bit (k % 8) of byte (k / 8), matching the
  * LE convention of the reference's bit IO (dsi-bitstream `BitWrite<LE>` /
  * `BitRead<LE>`, see /root/reference/src/huffman/encoder.rs:287-305):
  * `writeBits(v, n)` appends the n low bits of `v`, least-significant first.
  *
  * Pure JVM, no Spark dependency — used inside executor-side codec kernels.
  */
final class BitWriter(initialCapacity: Int = 256) {
  private var buf: Array[Byte] = new Array[Byte](math.max(initialCapacity, 16))
  // LE long view over buf — one intrinsified putLong per flushed word
  // instead of eight byte stores; re-wrapped whenever buf grows
  private var bb: java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
  private var byteLen: Int = 0 // full bytes flushed into buf
  private var acc: Long = 0L // pending bits (LSB-first)
  private var accBits: Int = 0 // number of pending bits in acc, always < 64

  /** Total bits written so far. */
  def bitsWritten: Long = byteLen.toLong * 8 + accBits

  private def ensure(extra: Int): Unit = {
    if (byteLen + extra > buf.length) {
      val n = new Array[Byte](math.max(buf.length * 2, byteLen + extra))
      System.arraycopy(buf, 0, n, 0, byteLen)
      buf = n
      bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    }
  }

  private def emitWord(w: Long): Unit = {
    ensure(8)
    bb.putLong(byteLen, w)
    byteLen += 8
  }

  /** Append the n (0..63) low bits of `value`, LSB first. */
  def writeBits(value: Long, n: Int): Unit = {
    if (n == 0) return
    require(n > 0 && n < 64, s"writeBits supports 0..63 bits, got $n")
    val v = value & ((1L << n) - 1)
    val old = accBits
    acc |= v << old
    accBits += n
    if (accBits >= 64) {
      emitWord(acc)
      accBits -= 64
      acc = if (old == 0) 0L else v >>> (64 - old)
    }
  }

  /** Flush pending bits (zero-padded to a byte boundary) and return the bytes. */
  def toBytes: Array[Byte] = {
    val nTail = (accBits + 7) / 8
    val out = new Array[Byte](byteLen + nTail)
    System.arraycopy(buf, 0, out, 0, byteLen)
    var i = 0
    var x = acc
    while (i < nTail) {
      out(byteLen + i) = (x & 0xff).toByte
      x >>>= 8
      i += 1
    }
    out
  }
}

/** LSB-first bit reader over a byte array; see [[BitWriter]] for the layout.
  * Reading past the end yields zero bits (the stream is not self-terminating;
  * callers always know the value count, mirroring the reference's decode loop
  * at /root/reference/src/main.rs:383-386).
  */
final class BitReader(bytes: Array[Byte], startBit: Long = 0L) {
  // LE long view over bytes — refill loads up to 8 bytes with one
  // intrinsified getLong instead of a per-byte loop (the refill is on the
  // critical path of every decoded value)
  private val bb: java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
  private var pos: Int = 0 // next byte index to load
  private var acc: Long = 0L
  private var accBits: Int = 0

  if (startBit > 0) seek(startBit)

  /** Absolute bit position of the next bit to be read. */
  def bitPos: Long = pos.toLong * 8 - accBits

  def seek(bit: Long): Unit = {
    pos = (bit / 8).toInt
    acc = 0L
    accBits = 0
    refill()
    val skip = (bit % 8).toInt
    if (skip > 0) {
      acc >>>= skip
      accBits -= skip
    }
  }

  private def refill(): Unit = {
    if (pos + 8 <= bytes.length) {
      if (accBits <= 56) {
        val nAdd = (64 - accBits) >>> 3 // whole bytes that fit: 1..8
        val w = bb.getLong(pos)
        acc |= (if (nAdd == 8) w else w & ((1L << (nAdd << 3)) - 1)) << accBits
        pos += nAdd
        accBits += nAdd << 3
      }
    } else {
      while (accBits <= 56 && pos < bytes.length) {
        acc |= (bytes(pos) & 0xffL) << accBits
        pos += 1
        accBits += 8
      }
    }
  }

  /** Read n (0..57) bits, LSB first; bits past EOF read as 0. */
  def readBits(n: Int): Long = {
    if (n == 0) return 0L
    // refill() only guarantees 57 buffered bits; a wider read would silently
    // drop its top bits and desynchronize the stream — fail loudly instead.
    require(n <= 57, s"readBits supports 0..57 bits, got $n")
    if (accBits < n) refill()
    val v = acc & (if (n >= 64) -1L else (1L << n) - 1)
    val consumed = math.min(n, accBits)
    acc = if (consumed >= 64) 0L else acc >>> consumed
    accBits -= consumed
    if (accBits < 0) accBits = 0
    v
  }

  /** Peek n (<=16) bits without consuming; zero-padded past EOF. */
  def peekBits(n: Int): Int = {
    if (accBits < n) refill()
    (acc & ((1L << n) - 1)).toInt
  }

  /** Skip n bits previously peeked. */
  def skipBits(n: Int): Unit = {
    val consumed = math.min(n, accBits)
    acc >>>= consumed
    accBits -= consumed
  }
}
