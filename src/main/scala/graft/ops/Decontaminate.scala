package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Eval-set decontamination: flag corpus documents whose token stream
  * contains ANY consecutive n-gram of a benchmark/eval set.
  *
  * This is the multi-needle generalization of the DSv2 `containsSeq` screen
  * (one needle, index-pruned): a real decontamination pass screens 100 TB of
  * training data against an ENTIRE eval suite — thousands of benchmark items
  * → up to millions of n-grams — in one corpus pass. The scale shape:
  *
  *   - The eval side is small by construction (benchmarks are human-written);
  *     its distinct n-gram hashes are collected, sorted, and BROADCAST
  *     (~8 MB per million grams). The corpus — the 100 TB side — is read
  *     once, shuffle-free: each task slides a window over its own rows and
  *     binary-searches the broadcast array per window. Output is hit docs
  *     only, so the result is eval-sized, not corpus-sized.
  *   - If an eval set ever outgrew broadcast (it should not), the fallback is
  *     the gram equi-join: explode both sides to (gram_hash) and semi-join —
  *     one shuffle of corpus grams. Not implemented; the broadcast path is
  *     the right default by orders of magnitude.
  *
  * Hashes live in the 62-bit [[XHash]] domain so the DuckDB oracle recomputes
  * them exactly (both engines compute the SAME hash, so even a collision —
  * ~1e-10 at 1M grams — cannot make the engines disagree). Token ids must be
  * non-negative (vocab ids), as everywhere in this engine.
  */
object Decontaminate {

  /** Rolling-window gram hash: XHash.fold over the raw token values —
    * h = mix62(h ^ token), seeded FoldInit. The DuckDB twin is
    * `list_reduce(list_prepend(FoldInit, tokens[p:p+n-1]), sqlFoldStep)`.
    */
  def gramHash(tokens: Array[Long], start: Int, n: Int): Long = {
    var h = XHash.FoldInit
    var i = 0
    while (i < n) { h = XHash.mix62(h ^ tokens(start + i)); i += 1 }
    h
  }

  /** Hard ceiling on the collected eval gram set (distinct grams). The
    * screen's design point is an EVAL-sized needle set broadcast against a
    * corpus-sized haystack; a caller that passes a corpus as `evalSeqs`
    * would otherwise silently materialize billions of hashes on the driver.
    * 100M grams ≈ 800 MB collected — already generous for any real eval
    * suite, and the failure names the misuse instead of OOMing the driver.
    */
  val MaxEvalGrams: Long = 100_000_000L

  /** Distinct n-gram hashes of every eval sequence, sorted for binary search.
    * Distinct-per-partition first so the driver collects at most the global
    * distinct set per partition, then deduped once more driver-side. Gated
    * by [[MaxEvalGrams]] — one cheap distributed count before any collect.
    */
  def evalGramHashes(
      evalSeqs: DataFrame,
      n: Int,
      tokensCol: String = "tokens",
      maxGrams: Long = MaxEvalGrams
  ): Array[Long] = {
    val spark = evalSeqs.sparkSession
    import spark.implicits._
    // upper bound without hashing: sum of per-row window counts — if even
    // the bound passes, the collected distinct set surely fits
    val windowBound = evalSeqs
      .agg(
        coalesce(
          sum(greatest(size(col(tokensCol)) - n + 1, lit(0)).cast("long")),
          lit(0L)
        )
      )
      .head()
      .getLong(0)
    require(
      windowBound <= maxGrams,
      s"evalSeqs yields up to $windowBound $n-gram windows (> $maxGrams): this looks like " +
        "a corpus, not an eval set — the decontamination screen broadcasts the EVAL grams and " +
        "must not materialize corpus-scale hashes on the driver. Pass the (small) eval side " +
        "as evalSeqs, or split the eval suite and run the screen per shard."
    )
    val hashes = evalSeqs
      .select(col(tokensCol).cast("array<long>").as("t"))
      .as[Seq[Long]]
      .mapPartitions { rows =>
        val seen = new java.util.HashSet[java.lang.Long]()
        rows.foreach { t =>
          val arr = t.toArray
          var p = 0
          while (p + n <= arr.length) { seen.add(gramHash(arr, p, n)): Unit; p += 1 }
        }
        val out = new Array[Long](seen.size)
        val it = seen.iterator()
        var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        out.iterator
      }
      .collect()
    val distinct = hashes.distinct
    java.util.Arrays.sort(distinct)
    distinct
  }

  /** One shuffle-free pass over `corpus`: per document, hash every
    * consecutive n-gram window and probe the broadcast eval set. Emits hit
    * documents only, with exact hit accounting the oracle recomputes:
    *
    *   - `n_hit_windows` — windows whose gram is in the eval set;
    *   - `n_hit_grams`   — DISTINCT eval grams the doc matched (a doc
    *                        repeating one leaked item k times scores k
    *                        windows / 1 gram — the quantity that matters for
    *                        "which eval items are burned");
    *   - `first_pos`     — 1-based position of the first hit window.
    */
  def screen(
      corpus: DataFrame,
      evalSeqs: DataFrame,
      n: Int,
      docIdCol: String = "doc_id",
      tokensCol: String = "tokens"
  ): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    val spark = corpus.sparkSession
    val grams = evalGramHashes(evalSeqs, n, tokensCol)
    val bc = spark.sparkContext.broadcast(grams)
    val out = screenAgainst(corpus, bc, n, docIdCol, tokensCol)
    // materialization is the caller's business; the broadcast is small and
    // torn down with the session (callers holding many eval sets can rebuild
    // via screenAgainst and destroy their own broadcasts)
    out
  }

  /** The corpus pass against an already-broadcast sorted gram array —
    * reusable across corpora/snapshots for one eval set.
    */
  def screenAgainst(
      corpus: DataFrame,
      evalGrams: org.apache.spark.broadcast.Broadcast[Array[Long]],
      n: Int,
      docIdCol: String = "doc_id",
      tokensCol: String = "tokens"
  ): DataFrame = {
    val spark = corpus.sparkSession
    val docIdType = corpus.schema(docIdCol).dataType
    val outSchema = StructType(Seq(
      StructField("doc_id", docIdType, nullable = true),
      StructField("n_hit_windows", LongType, nullable = false),
      StructField("n_hit_grams", LongType, nullable = false),
      StructField("first_pos", LongType, nullable = false)
    ))
    val in = corpus.select(col(docIdCol), col(tokensCol).cast("array<long>"))
    val rdd = in.rdd.mapPartitions { rows =>
      val grams = evalGrams.value
      rows.flatMap { r =>
        val toks = r.getSeq[Long](1)
        if (toks == null || toks.length < n) Iterator.empty
        else {
          val arr = toks.toArray
          var windows = 0L
          var firstPos = 0L
          var hitGrams: java.util.HashSet[java.lang.Long] = null
          var p = 0
          while (p + n <= arr.length) {
            val g = gramHash(arr, p, n)
            if (java.util.Arrays.binarySearch(grams, g) >= 0) {
              windows += 1
              if (firstPos == 0L) firstPos = p + 1L
              if (hitGrams == null) hitGrams = new java.util.HashSet[java.lang.Long]()
              hitGrams.add(g): Unit
            }
            p += 1
          }
          if (windows == 0L) Iterator.empty
          else Iterator.single(Row(r.get(0), windows, hitGrams.size.toLong, firstPos))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
