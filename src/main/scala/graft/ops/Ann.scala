package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline
  * (broadcast the query set, never the corpus); the LSH variant
  * (random-hyperplane signatures + bucket join) is the scale path —
  * candidates come from an equi-join on signature buckets, so the corpus
  * is never all-pairs compared.
  */
object Ann {

  val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, score with cosine, keep k per query via a window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"),
      col("embedding").as("query_emb")
    )
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosineUdf(col("embedding"), col("query_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    * generate candidates (equi-join on signature, never all-pairs), exact
    * cosine filters at `threshold`. The embedding-space member of the dedup
    * family (alongside exact / MinHash / SimHash / n-gram Jaccard).
    */
  def cosineNearDups(
      corpus: DataFrame,
      threshold: Double = 0.95,
      nPlanes: Int = 8,
      nTables: Int = 6,
      seed: Long = 0x5eedL,
      maxBucket: Int = 1024
  ): DataFrame = {
    val spark = corpus.sparkSession
    val tablesDf = spark.range(nTables).select(col("id").cast("int").as("lsh_table"))
    val sigUdf = udf { (emb: Seq[Float], table: Int) =>
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        var dot = 0.0
        var d = 0
        while (d < emb.length) {
          val r = TextOps.mix64(seed ^ (table.toLong << 48) ^ (p.toLong << 32) ^ d.toLong)
          dot += (if ((r & 1L) == 0L) emb(d) else -emb(d))
          d += 1
        }
        if (dot > 0) sig |= 1L << p
        p += 1
      }
      sig
    }
    // capped bucket self-join: a degenerate bucket (zero vectors, clustered
    // corpora) of m members emits m²/2 pairs — drop buckets above maxBucket
    // (members still pair through other tables), same as Dedup.capBuckets
    val bw = Window.partitionBy(col("lsh_table"), col("bucket"))
    val banded = corpus
      .crossJoin(tablesDf)
      .withColumn("bucket", sigUdf(col("embedding"), col("lsh_table")))
      .select(col("lsh_table"), col("bucket"), col("vec_id"), col("embedding"))
      .withColumn("__bucket_size", count(lit(1)).over(bw))
      .where(col("__bucket_size") <= maxBucket)
      .drop("__bucket_size")
    val a = banded.select(col("lsh_table"), col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = banded.select(col("lsh_table"), col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("lsh_table", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("emb_a"), col("emb_b"))
      .distinct()
      .withColumn("cosine", cosineUdf(col("emb_a"), col("emb_b")))
      .where(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Deterministic random-hyperplane signature: bit p = sign of the dot
    * product with a seeded Rademacher (+/-1) plane.
    */
  def planeSignatureUdf(nPlanes: Int, seed: Long) = udf { emb: Seq[Float] =>
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 0
      while (d < emb.length) {
        val r = TextOps.mix64(seed ^ (p.toLong << 32) ^ d.toLong)
        dot += (if ((r & 1L) == 0L) emb(d) else -emb(d))
        d += 1
      }
      if (dot > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** LSH ANN: signature buckets (multiple rotations widen recall), exact
    * cosine within candidates, top-k per query.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      seed: Long = 0x5eedL,
      maxBucket: Int = 4096
  ): DataFrame = {
    val spark = corpus.sparkSession
    val tablesDf = spark.range(nTables).select(col("id").cast("int").as("lsh_table"))
    // per-table seeds give each LSH table distinct planes
    val sigUdf = udf { (emb: Seq[Float], table: Int) =>
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        var dot = 0.0
        var d = 0
        while (d < emb.length) {
          val r = TextOps.mix64(seed ^ (table.toLong << 48) ^ (p.toLong << 32) ^ d.toLong)
          dot += (if ((r & 1L) == 0L) emb(d) else -emb(d))
          d += 1
        }
        if (dot > 0) sig |= 1L << p
        p += 1
      }
      sig
    }
    // cap hot corpus buckets: candidate volume per query is the sum of its
    // bucket sizes, so one degenerate bucket would dominate every probe
    val bw = Window.partitionBy(col("lsh_table"), col("bucket"))
    val c = corpus
      .crossJoin(tablesDf)
      .withColumn("bucket", sigUdf(col("embedding"), col("lsh_table")))
      .select(col("lsh_table"), col("bucket"), col("vec_id"), col("embedding"))
      .withColumn("__bucket_size", count(lit(1)).over(bw))
      .where(col("__bucket_size") <= maxBucket)
      .drop("__bucket_size")
    val q = queries
      .crossJoin(tablesDf)
      .withColumn("bucket", sigUdf(col("embedding"), col("lsh_table")))
      .select(
        col("lsh_table"),
        col("bucket"),
        col("vec_id").as("query_id"),
        col("embedding").as("query_emb")
      )
    val candidates = c
      .join(broadcast(q), Seq("lsh_table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_emb"), col("vec_id"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    candidates
      .withColumn("cosine", cosineUdf(col("embedding"), col("query_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
