package graft.codec

import graft.core.{BitReader, BitWriter}
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Per-block string-column codecs with cost-based auto-selection:
  * plain (varint length + UTF-8), dict (sorted dictionary + bit-packed
  * indexes — ideal for low-cardinality columns like `source`), and FSST
  * (shared-prefix/substring compression — ideal for `doc_id`).
  */
object StringCodecs {

  def writeVarint(out: ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    require(v >= 0)
    while ((v & ~0x7f) != 0) {
      out.write((v & 0x7f) | 0x80)
      v >>>= 7
    }
    out.write(v)
  }

  final class ByteCursor(val bytes: Array[Byte], var pos: Int = 0) {
    def readVarint(): Int = {
      var v = 0
      var shift = 0
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        v |= (b & 0x7f) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def readBytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
  }

  val Plain = "plain_s"
  val Dict = "dict_s"
  val Fsst = "fsst_s"

  def encodePlain(strings: Array[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    strings.foreach { s =>
      val b = s.getBytes(UTF_8)
      writeVarint(out, b.length)
      out.write(b, 0, b.length)
    }
    out.toByteArray
  }

  def decodePlain(bytes: Array[Byte], n: Int): Array[String] = {
    val c = new ByteCursor(bytes)
    Array.fill(n)(new String(c.readBytes(c.readVarint()), UTF_8))
  }

  def encodeDict(strings: Array[String]): Array[Byte] = {
    val dict = strings.distinct.sorted
    val index = dict.zipWithIndex.toMap
    val out = new ByteArrayOutputStream()
    writeVarint(out, dict.length)
    dict.foreach { s =>
      val b = s.getBytes(UTF_8)
      writeVarint(out, b.length)
      out.write(b, 0, b.length)
    }
    val width = IntCodecs.bitsFor(dict.length.toLong - 1)
    val w = new BitWriter(strings.length * width / 8 + 8)
    strings.foreach(s => w.writeBits(index(s).toLong, width))
    val packed = w.toBytes
    writeVarint(out, packed.length)
    out.write(packed, 0, packed.length)
    out.toByteArray
  }

  def decodeDict(bytes: Array[Byte], n: Int): Array[String] = {
    val c = new ByteCursor(bytes)
    val card = c.readVarint()
    val dict = Array.fill(card)(new String(c.readBytes(c.readVarint()), UTF_8))
    val packedLen = c.readVarint()
    val r = new BitReader(c.readBytes(packedLen))
    val width = IntCodecs.bitsFor(card.toLong - 1)
    Array.fill(n)(dict(r.readBits(width).toInt))
  }

  def encodeFsst(strings: Array[String]): Array[Byte] = {
    val raw = strings.map(_.getBytes(UTF_8))
    val sample: IndexedSeq[Array[Byte]] =
      if (raw.length <= 512) raw.toIndexedSeq
      else (0 until 512).map(i => raw(i * raw.length / 512))
    val table = graft.codec.Fsst.train(sample)
    val out = new ByteArrayOutputStream()
    val t = table.serialize
    out.write(t, 0, t.length)
    raw.foreach { b =>
      val enc = table.encode(b)
      writeVarint(out, enc.length)
      out.write(enc, 0, enc.length)
    }
    out.toByteArray
  }

  def decodeFsst(bytes: Array[Byte], n: Int): Array[String] = {
    val (table, consumed) = FsstTable.deserialize(bytes)
    val c = new ByteCursor(bytes, consumed)
    Array.fill(n)(new String(table.decode(c.readBytes(c.readVarint())), UTF_8))
  }

  /** Encode with the smallest of plain / dict / FSST. Dict is tried only
    * when cardinality is materially below the row count; FSST is tried only
    * when a sampled estimate (train on <=128 strings, extrapolate the
    * sample's compression ratio) beats the current best — a full FSST
    * train+encode per block would dominate encode time otherwise.
    */
  def select(strings: Array[String]): (String, Array[Byte]) = {
    val plain = encodePlain(strings)
    var bestName = Plain
    var best = plain
    val card = strings.iterator.take(4096).toSet.size
    if (card < 4096 && card.toLong * 4 <= math.max(strings.length, 1)) {
      val dict = encodeDict(strings)
      if (dict.length < best.length) { bestName = Dict; best = dict }
    }
    if (strings.length >= 16 && card * 2 > strings.length) {
      val sampleSize = math.min(128, strings.length)
      val sample = (0 until sampleSize)
        .map(i => strings(i * strings.length / sampleSize).getBytes(UTF_8))
      // cap the table so its serialized size stays a small fraction of the
      // column: ~9 bytes/symbol vs plain.length bytes of data
      val maxSymbols = math.max(16, math.min(255L, plain.length / 64L)).toInt
      val table = graft.codec.Fsst.train(sample, iterations = 3, maxSymbols = maxSymbols)
      val sampleRaw = sample.iterator.map(_.length).sum.max(1)
      val sampleEnc = sample.iterator.map(table.encodedLength).sum
      val rawTotal = plain.length.toLong
      val estimate = table.serializedLength + rawTotal * sampleEnc / sampleRaw
      if (estimate < best.length * 9L / 10) {
        // commit: encode all strings with the sampled table
        val out = new ByteArrayOutputStream()
        val t = table.serialize
        out.write(t, 0, t.length)
        strings.foreach { s =>
          val enc = table.encode(s.getBytes(UTF_8))
          writeVarint(out, enc.length)
          out.write(enc, 0, enc.length)
        }
        val fsst = out.toByteArray
        if (fsst.length < best.length) { bestName = Fsst; best = fsst }
      }
    }
    (bestName, best)
  }

  def decode(name: String, bytes: Array[Byte], n: Int): Array[String] = name match {
    case Plain => decodePlain(bytes, n)
    case Dict => decodeDict(bytes, n)
    case Fsst => decodeFsst(bytes, n)
    case other => throw new IllegalArgumentException(s"unknown string codec $other")
  }
}
