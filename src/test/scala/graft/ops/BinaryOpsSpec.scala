package graft.ops

import graft.pipeline.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class BinaryOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("BMP synthesis produces a valid header and the parser walks padded rows") {
    val dseed = XHash.mix62(42L)
    val b = BinaryOps.makeBmp(dseed, width = 5, height = 3) // rowSize 16 ≠ 15: padding exercised
    assert(b(0) == 'B' && b(1) == 'M')
    assert(b.length == 54 + 16 * 3)
    val f = BinaryOps.parseBmp(b, frameStride = 4)
    assert(f.width == 5 && f.height == 3 && f.rate == 24 && f.n_bytes == b.length)
    // content sum = chain bytes over the 45 pixel bytes only (pads excluded)
    val want = (0L until 45L).map(i => (XHash.mix62(dseed ^ i) & 255L)).sum
    assert(f.content_sum == want)
    assert(f.frames_sampled == 1) // ceil(3/4)
  }

  test("WAV synthesis/parse roundtrips rate, sample count and abs-sum") {
    val dseed = XHash.mix62(7L)
    val b = BinaryOps.makeWav(dseed, sampleRate = 16000, nSamples = 100)
    val f = BinaryOps.parseWav(b, frameStride = 4)
    assert(f.rate == 16000 && f.n_units == 100 && f.n_bytes == 44 + 200)
    val want = (0L until 100L).map { i =>
      math.abs((XHash.mix62(dseed ^ i) & 65535L) - 32768L)
    }.sum
    assert(f.content_sum == want)
  }

  test("GFTV synthesis/parse roundtrips dims, fps, frames and byte sum") {
    val dseed = XHash.mix62(9L)
    val b = BinaryOps.makeGftv(dseed, width = 4, height = 3, fps = 24, nFrames = 5)
    val f = BinaryOps.parseGftv(b, frameStride = 4)
    assert(f.width == 4 && f.height == 3 && f.rate == 24 && f.n_units == 5)
    assert(f.frames_sampled == 2) // ceil(5/4)
    val want = (0L until 60L).map(i => (XHash.mix62(dseed ^ i) & 255L)).sum
    assert(f.content_sum == want)
  }

  test("extractFeatures parses a mixed media corpus distributed") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abc", "en", "s", 120L),
      (1L, "defg", "en", "s", 77L),
      (2L, "hij", "en", "s", 203L),
      (3L, "klmn", "en", "s", 64L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = BinaryOps
      .extractFeatures(BinaryOps.mediaFromDocuments(docs))
      .collect()
      .map(f => f.media_id -> f)
      .toMap
    assert(feats(0L).kind == "image" && feats(0L).width == 4 + 120 % 29)
    assert(feats(3L).kind == "image" && feats(3L).height == 3 + 64 % 17)
    assert(feats(1L).kind == "audio" && feats(1L).rate == 8000 + (77 % 5) * 4000)
    assert(feats(2L).kind == "video" && feats(2L).n_units == 4 + 203 % 12)
    assert(feats.values.forall(_.content_sum > 0))
  }
}
