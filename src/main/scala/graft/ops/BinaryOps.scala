package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: images/audio/video ride as opaque `binary`
  * columns with typed metadata, processed in batched per-partition passes
  * (the Scala analog of a Pandas UDF over mapInPandas: per-partition setup
  * amortized, one batch per task).
  *
  * The container ships no media libraries, so the corpus is SYNTHESIZED in
  * real, minimal formats — BMP (24bpp bottom-up rows with 4-byte padding),
  * WAV (RIFF/fmt/data, 16-bit mono PCM) and a framed "GFTV" video container
  * — and [[extractFeatures]] genuinely PARSES those bytes: magic checks,
  * little-endian header fields, row-padding-aware pixel walks, sample
  * decoding. Payload bytes derive from the XHash 62-bit chain, so the
  * DuckDB oracle can independently recompute every parsed feature
  * (dimensions, rates, unit counts, content sums) — a wrong parser offset
  * or a missed pad byte fails the oracle.
  */
object BinaryOps {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Long, // image/video; 0 for audio
      height: Long, // image/video; 0 for audio
      rate: Long, // bpp / sample rate / fps
      n_units: Long, // pixel rows / samples / frames
      frames_sampled: Long, // every frameStride-th unit
      content_sum: Long // sum of pixel bytes / abs samples / frame bytes
  )

  /** Deterministic payload byte i for document seed `dseed`. */
  @inline private def chainByte(dseed: Long, i: Long): Int =
    (XHash.mix62(dseed ^ i) & 255L).toInt

  /** Deterministic 16-bit PCM sample i for document seed `dseed`. */
  @inline private def chainSample(dseed: Long, i: Long): Int =
    ((XHash.mix62(dseed ^ i) & 65535L) - 32768L).toInt

  // ---- little-endian field IO ----------------------------------------
  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
  }
  private def getU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def getU32(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  // ---- synthesis (real containers, deterministic content) ------------

  /** 24bpp BMP: 14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up
    * rows padded to 4 bytes. Pixel bytes come from the per-doc chain
    * indexed by PIXEL counter (pad bytes are zero).
    */
  def makeBmp(dseed: Long, width: Int, height: Int): Array[Byte] = {
    val rowSize = (width * 3 + 3) & ~3
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong)
    putU32(out, 10, 54L)
    putU32(out, 14, 40L)
    putU32(out, 18, width.toLong)
    putU32(out, 22, height.toLong)
    putU16(out, 26, 1) // planes
    putU16(out, 28, 24) // bpp
    putU32(out, 34, dataSize.toLong)
    var px = 0L
    var row = 0
    while (row < height) {
      var c = 0
      while (c < width * 3) {
        out(54 + row * rowSize + c) = chainByte(dseed, px).toByte
        px += 1; c += 1
      }
      row += 1
    }
    out
  }

  /** Mono 16-bit PCM WAV: RIFF/WAVE + fmt(16) + data chunks. */
  def makeWav(dseed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataSize = nSamples * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, (36 + dataSize).toLong)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16L)
    putU16(out, 20, 1) // PCM
    putU16(out, 22, 1) // mono
    putU32(out, 24, sampleRate.toLong)
    putU32(out, 28, sampleRate.toLong * 2) // byte rate
    putU16(out, 32, 2) // block align
    putU16(out, 34, 16) // bits/sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataSize.toLong)
    var i = 0
    while (i < nSamples) {
      putU16(out, 44 + 2 * i, chainSample(dseed, i.toLong) & 0xffff)
      i += 1
    }
    out
  }

  /** Framed video container: "GFTV" magic + u32le width/height/fps/nFrames
    * + nFrames frames of width*height bytes.
    */
  def makeGftv(dseed: Long, width: Int, height: Int, fps: Int, nFrames: Int): Array[Byte] = {
    val out = new Array[Byte](20 + nFrames * width * height)
    out(0) = 'G'; out(1) = 'F'; out(2) = 'T'; out(3) = 'V'
    putU32(out, 4, width.toLong)
    putU32(out, 8, height.toLong)
    putU32(out, 12, fps.toLong)
    putU32(out, 16, nFrames.toLong)
    var i = 0L
    while (i < nFrames.toLong * width * height) {
      out((20 + i).toInt) = chainByte(dseed, i).toByte
      i += 1
    }
    out
  }

  /** Synthesize the media table from documents: kind = doc_id mod 3, all
    * container parameters closed-form in n_chars (so the oracle can
    * recompute them), content from the per-doc XHash chain.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (docId, nChars) =>
        val dseed = XHash.mix62(docId)
        (docId % 3) match {
          case 0 =>
            MediaRow(docId, "image", makeBmp(dseed, (4 + nChars % 29).toInt, (3 + nChars % 17).toInt))
          case 1 =>
            MediaRow(
              docId,
              "audio",
              makeWav(dseed, (8000 + (nChars % 5) * 4000).toInt, (64 + nChars % 200).toInt)
            )
          case _ =>
            MediaRow(
              docId,
              "video",
              makeGftv(
                dseed,
                (8 + nChars % 8).toInt,
                (6 + nChars % 6).toInt,
                (12 + (nChars % 2) * 12).toInt,
                (4 + nChars % 12).toInt
              )
            )
        }
      }
  }

  // ---- parsing (the real decode path) ---------------------------------

  def parseBmp(b: Array[Byte], frameStride: Int): MediaFeature = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    val dataOff = getU32(b, 10).toInt
    val width = getU32(b, 18).toInt
    val height = getU32(b, 22).toInt
    val bpp = getU16(b, 28)
    require(bpp == 24, s"unsupported bpp $bpp")
    val rowSize = (width * 3 + 3) & ~3
    var sum = 0L
    var row = 0
    while (row < height) {
      var c = 0
      while (c < width * 3) { // pad bytes excluded — offset-aware walk
        sum += (b(dataOff + row * rowSize + c) & 0xff)
        c += 1
      }
      row += 1
    }
    MediaFeature(-1, "image", b.length.toLong, width.toLong, height.toLong, bpp.toLong,
      height.toLong, (height.toLong + frameStride - 1) / frameStride, sum)
  }

  def parseWav(b: Array[Byte], frameStride: Int): MediaFeature = {
    require(
      b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(8) == 'W' && b(9) == 'A',
      "not a WAV"
    )
    val sampleRate = getU32(b, 24)
    val bits = getU16(b, 34)
    require(bits == 16, s"unsupported bits $bits")
    val dataSize = getU32(b, 40).toInt
    val nSamples = dataSize / 2
    var sum = 0L
    var i = 0
    while (i < nSamples) {
      val s = getU16(b, 44 + 2 * i)
      val signed = if (s >= 32768) s - 65536 else s
      sum += math.abs(signed)
      i += 1
    }
    MediaFeature(-1, "audio", b.length.toLong, 0L, 0L, sampleRate, nSamples.toLong,
      (nSamples.toLong + frameStride - 1) / frameStride, sum)
  }

  def parseGftv(b: Array[Byte], frameStride: Int): MediaFeature = {
    require(
      b.length >= 20 && b(0) == 'G' && b(1) == 'F' && b(2) == 'T' && b(3) == 'V',
      "not a GFTV"
    )
    val width = getU32(b, 4)
    val height = getU32(b, 8)
    val fps = getU32(b, 12)
    val nFrames = getU32(b, 16)
    var sum = 0L
    var i = 20
    while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
    MediaFeature(-1, "video", b.length.toLong, width, height, fps, nFrames,
      (nFrames + frameStride - 1) / frameStride, sum)
  }

  /** Per-partition batched feature extraction; dispatches on the container
    * magic, not the kind tag (tag is verified against the parse result).
    */
  def extractFeatures(media: Dataset[MediaRow], frameStride: Int = 4): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup happens once here in a real deployment
      rows.map { r =>
        val b = r.payload
        val f =
          if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') parseBmp(b, frameStride)
          else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I') parseWav(b, frameStride)
          else parseGftv(b, frameStride)
        require(f.kind == r.kind, s"media ${r.media_id}: container ${f.kind} != tag ${r.kind}")
        f.copy(media_id = r.media_id)
      }
    }
  }
}
