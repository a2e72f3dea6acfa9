package graft.ops

import graft.core.Hybrid
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document quality scoring for training-data curation — the two screens a
  * pretraining pipeline runs before anything expensive:
  *
  *   - **Repetition accounting** (the Gopher-style rule family, Rae et al.
  *     2021 §A1.1): fraction of duplicated words / word n-grams WITHIN a
  *     document. Boilerplate, scraper loops and template pages light up
  *     here long before a cross-doc dedup pass would see them.
  *   - **Unigram log-loss** (compression cost as a perplexity proxy): a
  *     document's quantized bits-per-token under the corpus's own token
  *     distribution — precisely the cost model the encode pipeline's
  *     estimator trio already uses (reference
  *     /root/reference/src/huffman/encoder.rs:179-198). Docs in the LOW
  *     tail compress suspiciously well (repetitive/templated); docs in the
  *     HIGH tail don't fit the corpus at all (binary junk, wrong language).
  *     "Filter by compression ratio" is the cheapest quality signal an
  *     entropy-coding engine gets for free.
  *
  * Scale shape: both are embarrassingly parallel per row. Repetition is a
  * single map over the corpus (per-doc local counting, NO shuffle, output
  * doc-sized). Log-loss costs one 256-cell histogram aggregation (map-side
  * combined, bytes per partition) and then one map; the cost table rides a
  * broadcast. Nothing here materializes anything corpus-sized beyond the
  * per-doc score column itself.
  *
  * Everything is integer-exact in both engines (counts, floor-log2 costs,
  * ppm ratios via integer division), so every step sits under the hard
  * DuckDB oracle — no float drift, no sampling.
  */
object Scoring {

  /** Per-document repetition stats over a word sequence:
    * (n_words, n_dup_words, n_grams, n_dup_grams, top_gram_cnt) where
    * `n_dup_* = total - distinct` (the "duplicate mass") and `top_gram_cnt`
    * is the highest multiplicity of any single n-gram (0 if no grams).
    * Grams are the words joined by a single space — words can't contain the
    * separator (they come from a split on it), so the join is unambiguous
    * and matches the SQL twin `ws[j] || ' ' || ws[j+1] ...` exactly.
    */
  def repetitionUdf(n: Int) = udf { words: Seq[String] =>
    if (words == null || words.isEmpty) (0L, 0L, 0L, 0L, 0L)
    else {
      val arr = words.toArray
      val wordCnt = new java.util.HashMap[String, Int]()
      arr.foreach(w => wordCnt.merge(w, 1, Integer.sum _))
      val nWords = arr.length.toLong
      val nDupWords = nWords - wordCnt.size
      if (arr.length < n) (nWords, nDupWords, 0L, 0L, 0L)
      else {
        val gramCnt = new java.util.HashMap[String, Int]()
        var j = 0
        var top = 0
        while (j + n <= arr.length) {
          val g = arr.slice(j, j + n).mkString(" ")
          val c = gramCnt.merge(g, 1, Integer.sum _)
          if (c > top) top = c
          j += 1
        }
        val nGrams = (arr.length - n + 1).toLong
        (nWords, nDupWords, nGrams, nGrams - gramCnt.size, top.toLong)
      }
    }
  }

  /** Per-document repetition accounting over `documents(doc_id, text, …)`.
    * Adds integer columns n_words / n_dup_words / n_grams / n_dup_grams /
    * top_gram_cnt / dup_gram_ppm (floor(10^6 · dup/grams), 0 when gramless).
    * One corpus map, no shuffle — the screen's own filter/top-k is the only
    * aggregation a caller pays.
    */
  def repetition(documents: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    val st = repetitionUdf(n)(split(col(textCol), " "))
    documents
      .withColumn("__rep", st)
      .withColumn("n_words", col("__rep._1"))
      .withColumn("n_dup_words", col("__rep._2"))
      .withColumn("n_grams", col("__rep._3"))
      .withColumn("n_dup_grams", col("__rep._4"))
      .withColumn("top_gram_cnt", col("__rep._5"))
      .withColumn(
        "dup_gram_ppm",
        when(col("n_grams") > 0, col("n_dup_grams") * 1000000L / col("n_grams"))
          .otherwise(0L)
          .cast("long")
      )
      .drop("__rep")
  }

  /** Quantized per-value bit cost under a unigram cost table:
    * costBits(hybridToken(v)) + rawBits(v) — the estimator cost model
    * ([[graft.core.Histograms.costModel]]) applied per document. Returns
    * (cost_bits, bpt_ppm = floor(10^6 · cost_bits / n_values)); (0, 0) for
    * an empty doc. `costs` is small (≤256 ints) and serializes into the
    * UDF closure — effectively a broadcast.
    */
  def docCostUdf(costs: Array[Int]) = udf { tokens: Seq[Long] =>
    if (tokens == null || tokens.isEmpty) (0L, 0L)
    else {
      var bits = 0L
      tokens.foreach { v =>
        val t = Hybrid.token(v)
        bits += costs(t) + Hybrid.tokenNBits(t)
      }
      (bits, bits * 1000000L / tokens.length)
    }
  }

  /** Convenience: score a tokens-array DataFrame with per-doc unigram
    * log-loss columns cost_bits / bpt_ppm (bits-per-token, ppm-scaled so
    * the ordering is integer-exact cross-engine).
    */
  def unigramLogLoss(df: DataFrame, costs: Array[Int], tokensCol: Column): DataFrame =
    df.withColumn("__nll", docCostUdf(costs)(tokensCol.cast("array<long>")))
      .withColumn("cost_bits", col("__nll._1"))
      .withColumn("bpt_ppm", col("__nll._2"))
      .drop("__nll")
}
