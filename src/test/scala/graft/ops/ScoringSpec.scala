package graft.ops

import graft.core.Hybrid
import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Scoring]] — repetition accounting and unigram log-loss, the two
  * per-document curation screens. Hand-computed fixtures pin the exact
  * integer semantics the DuckDB oracles recompute.
  */
class ScoringSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("source", lit("s"))
  }

  test("repetition: hand-computed word/bigram duplicate mass") {
    val out = Scoring
      .repetition(docs(Seq(
        1L -> "a b a b a", // words 5/distinct 2; bigrams [a b, b a, a b, b a] -> 4 total, 2 distinct
        2L -> "x y z",     // all unique: 3 words, 2 grams, 0 dups
        3L -> "w",         // one word: no grams
        4L -> ""           // split("") = [""]: 1 word, no grams
      )), n = 2)
      .select("doc_id", "n_words", "n_dup_words", "n_grams", "n_dup_grams", "top_gram_cnt", "dup_gram_ppm")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

    assert(out(1L) == ((5L, 3L, 4L, 2L, 2L, 500000L)))
    assert(out(2L) == ((3L, 0L, 2L, 0L, 1L, 0L)))
    assert(out(3L) == ((1L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(4L) == ((1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("repetition: a planted boilerplate doc ranks first by dup_gram_ppm") {
    val boiler = Seq.fill(40)("click here now").mkString(" ")
    val clean = (1 to 120).map(i => s"tok$i").mkString(" ")
    val top = Scoring
      .repetition(docs(Seq(1L -> clean, 2L -> boiler, 3L -> (clean + " extra"))), n = 3)
      .orderBy(col("dup_gram_ppm").desc, col("doc_id"))
      .select("doc_id", "dup_gram_ppm", "top_gram_cnt")
      .head()
    assert(top.getLong(0) == 2L)
    assert(top.getLong(1) > 900000L) // 118 grams, 3 distinct
    assert(top.getLong(2) == 40L)    // "click here now" tiled 40x -> top window count
  }

  test("docCostUdf: per-value cost = costBits(token) + rawBits, summed; ppm floor") {
    import spark.implicits._
    // cost table: token t costs t+1 bits (arbitrary, distinguishable)
    val costs = Array.tabulate(256)(_ + 1)
    val vals = Seq(0L, 15L, 16L, 255L, 65535L)
    val expected = vals.map { v =>
      val t = Hybrid.token(v)
      (costs(t) + Hybrid.tokenNBits(t)).toLong
    }.sum
    val row = Seq((1L, vals))
      .toDF("doc_id", "tokens")
      .withColumn("c", Scoring.docCostUdf(costs)(col("tokens")))
      .select(col("c._1"), col("c._2"))
      .head()
    assert(row.getLong(0) == expected)
    assert(row.getLong(1) == expected * 1000000L / vals.length)
    // empty doc scores (0, 0), not a division error
    val empty = Seq((2L, Seq.empty[Long]))
      .toDF("doc_id", "tokens")
      .withColumn("c", Scoring.docCostUdf(costs)(col("tokens")))
      .select(col("c._1"), col("c._2"))
      .head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("unigramLogLoss: repetitive docs land in the LOW tail, junk in the HIGH tail") {
    import spark.implicits._
    // corpus dominated by token 3; doc 1 = pure mode (low), doc 3 = rare
    // large values (high), doc 2 = in between
    val corpus = Seq(
      (1L, Seq.fill(50)(3L)),
      (2L, Seq(3L, 3L, 3L, 7L, 3L, 3L, 9L, 3L)),
      (3L, Seq(1000003L, 2000003L, 3000003L, 4000003L))
    ).toDF("doc_id", "tokens")
    val hist = new graft.core.Histograms(1, 256)
    corpus.select("tokens").as[Seq[Long]].collect().foreach { ts =>
      ts.foreach(v => hist.counts(0)(Hybrid.token(v)) += 1)
    }
    val scored = Scoring
      .unigramLogLoss(corpus, hist.costModel(0), col("tokens"))
      .select("doc_id", "bpt_ppm")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(scored(1L) < scored(2L) && scored(2L) < scored(3L))
  }
}
