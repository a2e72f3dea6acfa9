package graft.codec

/** FSST — Fast Static Symbol Table string compression (Boncz, Neumann, Leis,
  * VLDB 2020; public algorithm, re-implemented from the paper). A table of at
  * most 255 symbols of 1..8 bytes each; encoding greedily replaces the
  * longest matching symbol with its 1-byte code; bytes with no match are
  * escaped as (255, literal). Trained per block by a few rounds of
  * counting single-symbol and adjacent-pair gains on a sample.
  */
final class FsstTable(val symbols: Array[Array[Byte]]) extends Serializable {
  require(symbols.length <= 255, s"at most 255 symbols, got ${symbols.length}")
  require(symbols.forall(s => s.length >= 1 && s.length <= 8))

  final val Escape: Int = 255

  // symbols grouped by first byte, longest first, for greedy longest-match
  @transient private lazy val byFirst: Array[Array[Int]] = {
    val groups = Array.fill(256)(List.empty[Int])
    for (i <- symbols.indices) {
      val b = symbols(i)(0) & 0xff
      groups(b) = i :: groups(b)
    }
    groups.map(_.sortBy(i => -symbols(i).length).toArray)
  }

  /** Longest symbol matching input at `pos`, or -1. */
  @inline private def matchAt(input: Array[Byte], pos: Int): Int = {
    val cands = byFirst(input(pos) & 0xff)
    var ci = 0
    while (ci < cands.length) {
      val si = cands(ci)
      val s = symbols(si)
      if (pos + s.length <= input.length) {
        var k = 1
        var ok = true
        while (ok && k < s.length) {
          if (input(pos + k) != s(k)) ok = false
          k += 1
        }
        if (ok) return si
      }
      ci += 1
    }
    -1
  }

  def encode(input: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(input.length / 2 + 8)
    var i = 0
    while (i < input.length) {
      val si = matchAt(input, i)
      if (si >= 0) {
        out.write(si)
        i += symbols(si).length
      } else {
        out.write(Escape)
        out.write(input(i))
        i += 1
      }
    }
    out.toByteArray
  }

  def decode(encoded: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(encoded.length * 2 + 8)
    var i = 0
    while (i < encoded.length) {
      val c = encoded(i) & 0xff
      if (c == Escape) {
        out.write(encoded(i + 1))
        i += 2
      } else {
        out.write(symbols(c), 0, symbols(c).length)
        i += 1
      }
    }
    out.toByteArray
  }

  /** Encoded byte count without materializing. */
  def encodedLength(input: Array[Byte]): Int = {
    var n = 0
    var i = 0
    while (i < input.length) {
      val si = matchAt(input, i)
      if (si >= 0) { n += 1; i += symbols(si).length }
      else { n += 2; i += 1 }
    }
    n
  }

  /** Table serialization: [nSymbols:1][per symbol: len:1, bytes]. */
  def serialize: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(symbols.length)
    symbols.foreach { s => out.write(s.length); out.write(s, 0, s.length) }
    out.toByteArray
  }

  def serializedLength: Int = 1 + symbols.map(_.length + 1).sum
}

object FsstTable {
  def deserialize(bytes: Array[Byte], off: Int = 0): (FsstTable, Int) = {
    var i = off
    val n = bytes(i) & 0xff
    i += 1
    val symbols = new Array[Array[Byte]](n)
    var s = 0
    while (s < n) {
      val len = bytes(i) & 0xff
      i += 1
      symbols(s) = java.util.Arrays.copyOfRange(bytes, i, i + len)
      i += len
      s += 1
    }
    (new FsstTable(symbols), i - off)
  }
}

object Fsst {

  /** Train a symbol table on a sample of strings: a few rounds of greedy
    * re-encoding, counting gains of current symbols and of adjacent-symbol
    * concatenations, keeping the top candidates by saved bytes.
    */
  def train(sample: IndexedSeq[Array[Byte]], iterations: Int = 4, maxSymbols: Int = 255): FsstTable = {
    var table = new FsstTable(Array.empty[Array[Byte]])
    var it = 0
    while (it < iterations) {
      val gains = new java.util.HashMap[java.nio.ByteBuffer, Long]()
      @inline def addGain(bytes: Array[Byte], from: Int, until: Int): Unit = {
        if (until - from >= 1 && until - from <= 8) {
          val key = java.nio.ByteBuffer.wrap(java.util.Arrays.copyOfRange(bytes, from, until))
          // gain per occurrence ≈ bytes covered minus the 1 code byte
          val g = (until - from) * 2 - 1L // count escapes avoided generously
          gains.merge(key, g, (a, b) => a + b)
        }
      }
      sample.foreach { s =>
        var i = 0
        var prevStart = -1
        var prevEnd = -1
        while (i < s.length) {
          val si = if (table.symbols.nonEmpty) {
            val groups = table.symbols
            // reuse table's matcher via encodedLength logic: inline match
            var best = -1
            var bestLen = 0
            var c = 0
            while (c < groups.length) {
              val sym = groups(c)
              if (sym.length > bestLen && i + sym.length <= s.length) {
                var k = 0
                var ok = true
                while (ok && k < sym.length) {
                  if (s(i + k) != sym(k)) ok = false
                  k += 1
                }
                if (ok) { best = c; bestLen = sym.length }
              }
              c += 1
            }
            best
          } else -1
          val segLen = if (si >= 0) table.symbols(si).length else 1
          // count this segment and its extension candidates
          addGain(s, i, i + segLen)
          addGain(s, i, math.min(i + segLen + 1, s.length)) // extend by one byte
          if (prevStart >= 0) addGain(s, prevStart, math.min(i + segLen, prevStart + 8))
          prevStart = i
          prevEnd = i + segLen
          i += segLen
        }
      }
      val top = gains
        .entrySet()
        .toArray(Array.empty[java.util.Map.Entry[java.nio.ByteBuffer, Long]])
        .sortBy(e => (-e.getValue, e.getKey)) // deterministic tie-break
        .take(maxSymbols)
        .map(_.getKey.array())
      table = new FsstTable(top)
      it += 1
    }
    table
  }

  implicit private val byteBufferOrdering: Ordering[java.nio.ByteBuffer] =
    (a, b) => a.compareTo(b)
}
