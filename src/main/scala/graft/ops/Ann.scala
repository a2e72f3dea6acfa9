package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline
  * (broadcast the query set, never the corpus); the LSH variant
  * (random-hyperplane signatures + capped bucket join) is the scale path —
  * candidates come from an equi-join on signature buckets, so the corpus
  * is never all-pairs compared.
  *
  * Scoring runs in a QUANTIZED integer domain: embeddings quantize to
  * qe[d] = floor(x*1000 + 0.5) (exact in any engine), and similarity is
  * icos = floor(dot * 1e6 / sqrt(|a|²·|b|²)). dot, the squared norms, and
  * dot*1e6 are exact 64-bit integers (dot ≤ dim·|qe|² ≈ 6.2e8 at the
  * bounds below, so dot*1e6 ≤ ~6.2e14 < 2^53); the norm PRODUCT na·nb can
  * reach ~3.8e17 > 2^53, so its i64→double cast rounds — determinism holds
  * because both engines perform the IDENTICAL correctly-rounded cast
  * before the same sqrt/divide/floor sequence, not because every
  * intermediate is exact. That makes ANN results (and their tie-breaking
  * order) reproducible bit-for-bit and recomputable by the DuckDB oracle —
  * which a float-summation cosine is not.
  */
object Ann {

  /** icos unit: icos = cosine * 1e6, floored. */
  val IcosScale = 1000000L

  /** Plain float cosine (for exploratory use; NOT the oracle-checked path). */
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

  /** qe[d] = floor(x*1000 + 0.5) — round-half-up, exact cross-engine. */
  @inline def quantize(x: Float): Long = math.floor(x.toDouble * 1000.0 + 0.5).toLong

  val quantizeUdf = udf { emb: Seq[Float] =>
    if (emb == null) Array.empty[Long] else emb.iterator.map(quantize).toArray
  }

  /** Deterministic integer-quantized cosine (see object doc). Requires
    * |qe| <= ~1100 per element and dim <= ~512 so dot and each squared
    * norm stay exact in i64 and dot*1e6 stays below 2^53; na*nb may exceed
    * 2^53 — cross-engine determinism relies on the identical IEEE
    * i64→double cast in both engines (see object doc).
    */
  def icos(a: Array[Long], b: Array[Long]): Long = {
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    if (na == 0L || nb == 0L) 0L
    else math.floor(dot.toDouble * 1000000.0 / math.sqrt((na * nb).toDouble)).toLong
  }

  val icosUdf = udf { (a: Seq[Long], b: Seq[Long]) => icos(a.toArray, b.toArray) }

  /** Random-hyperplane signature over the quantized embedding: bit p of
    * table `table` is set iff sum_d(±qe[d]) > 0, with the Rademacher sign
    * for (table, p, d) drawn from XHash.mix62 (cross-engine exact). Field
    * layout table<<20 / p<<10 / (d+1) keeps distinct triples distinct.
    */
  def planeSig(qe: Array[Long], table: Int, nPlanes: Int, seed: Long): Long = {
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0L
      var d = 0
      while (d < qe.length) {
        val r = XHash.mix62(seed ^ (table.toLong << 20) ^ (p.toLong << 10) ^ (d + 1).toLong)
        dot += (if ((r & 1L) == 0L) qe(d) else -qe(d))
        d += 1
      }
      if (dot > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  def planeSigUdf(nPlanes: Int, seed: Long) = udf { (qe: Seq[Long], table: Int) =>
    planeSig(qe.toArray, table, nPlanes, seed)
  }

  val DefaultSeed: Long = 0x5eedL // 24301, below the p<<10 field

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, score with icos, keep k per query via a window. Ordering
    * (icos desc, vec_id) is a total deterministic order.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"),
      quantizeUdf(col("embedding")).as("query_qe")
    )
    val scored = corpus
      .withColumn("qe", quantizeUdf(col("embedding")))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("icos", icosUdf(col("qe"), col("query_qe")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("icos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("icos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    * generate candidates (capped equi-join, never all-pairs), exact icos
    * filters at `threshold` (compared as icos >= floor-scaled threshold).
    * The embedding-space member of the dedup family.
    */
  def cosineNearDups(
      corpus: DataFrame,
      threshold: Double = 0.95,
      nPlanes: Int = 8,
      nTables: Int = 6,
      seed: Long = DefaultSeed,
      maxBucket: Int = 1024
  ): DataFrame = {
    val spark = corpus.sparkSession
    val tablesDf = spark.range(nTables).select(col("id").cast("int").as("lsh_table"))
    val sig = planeSigUdf(nPlanes, seed)
    // salt-split bucket self-join: a degenerate bucket (zero vectors,
    // clustered corpora) of m members would emit m²/2 pairs — rank members
    // by vec_id and pair within salt groups of <= maxBucket, bounding work
    // at O(m·cap) while still reporting the bucket's duplicates (same rule
    // as Dedup.saltBuckets; members also pair through other tables)
    val bw = Window.partitionBy(col("lsh_table"), col("bucket")).orderBy(col("vec_id"))
    val banded = corpus
      .withColumn("qe", quantizeUdf(col("embedding")))
      .crossJoin(tablesDf)
      .withColumn("bucket", sig(col("qe"), col("lsh_table")))
      .select(col("lsh_table"), col("bucket"), col("vec_id"), col("qe"))
      .withColumn("__salt", ((row_number().over(bw) - 1) / maxBucket).cast("int"))
    val a = banded.select(col("lsh_table"), col("bucket"), col("__salt"), col("vec_id").as("vec_a"), col("qe").as("qe_a"))
    val b = banded.select(col("lsh_table"), col("bucket"), col("__salt"), col("vec_id").as("vec_b"), col("qe").as("qe_b"))
    val minIcos = (threshold * IcosScale).toLong
    a.join(b, Seq("lsh_table", "bucket", "__salt"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("qe_a"), col("qe_b"))
      .distinct()
      .withColumn("icos", icosUdf(col("qe_a"), col("qe_b")))
      .where(col("icos") >= minIcos)
      .withColumn("cosine", col("icos").cast("double") / IcosScale.toDouble)
      .select(col("vec_a"), col("vec_b"), col("icos"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Deterministic IVF coarse-quantizer trainer, fully recomputable by the
    * DuckDB oracle (every step is exact integer/icos arithmetic with pinned
    * tie-breaking):
    *
    *   1. **Seeding — greedy farthest-point (k-center).** Start from the
    *      lowest vec_id; each subsequent centroid is the not-yet-chosen
    *      vector MINIMIZING its max icos to the chosen set (ties: lowest
    *      vec_id). On a clustered corpus this lands one seed per cluster —
    *      the geometric spread a lowest-id seed cannot give — and is the
    *      deterministic stand-in for k-means++/k-means||'s randomized
    *      spread.
    *   2. **`iters` Lloyd rounds.** Assign every vector to its nearest
    *      centroid (icos desc, centroid id asc); recompute each centroid as
    *      the per-dimension floor-mean (`floor(sum/count)` through the
    *      identical i64→double cast in both engines) of its members; an
    *      empty list keeps its previous centroid. Centroid ids stay the
    *      seed vector's vec_id — stable labels across rounds.
    *
    * Scale shape — O(1) Spark jobs, never one per centroid: seeding runs
    * DRIVER-SIDE over a deterministically capped candidate set. The corpus
    * is counted (1 job); when it exceeds `seedCandidateCap` the candidates
    * are the `vec_id % m == 0` slice with `m = ceil(n / cap)` (the same
    * modulo sampling rule every deterministic fixture here uses, exactly
    * recomputable by the oracle), collected in ONE job (≤ cap quantized
    * rows — bounded driver memory by construction), and the k-center loop
    * runs in memory with semantics IDENTICAL to the distributed
    * formulation: start at the lowest candidate vec_id, repeatedly take the
    * candidate minimizing max-icos to the chosen set, ties to the lowest
    * vec_id. At `n ≤ cap` (every committed fixture) the candidate set is
    * the whole corpus and the result is bit-equal to the historical
    * step-per-centroid job loop this replaced (r4 verdict: nLists
    * sequential driver-coordinated jobs do not scale). Each Lloyd round
    * then stays one distributed map + one (list, dim) aggregation of
    * nLists·dim rows. The driver holds ≤ cap candidates transiently and
    * nLists centroids after.
    */
  def trainIvfCentroids(
      corpus: DataFrame,
      nLists: Int,
      iters: Int = 3,
      seedCandidateCap: Int = 1 << 15
  ): Array[(Long, Array[Long])] = {
    require(
      seedCandidateCap >= math.max(1, nLists),
      s"seedCandidateCap ($seedCandidateCap) must be >= nLists ($nLists)"
    )
    val spark = corpus.sparkSession
    // cached: the quantized corpus feeds the seeding count/collect and each
    // Lloyd round — without the cache each of those re-scans the source and
    // re-runs the quantize UDF
    val qc = corpus
      .select(col("vec_id").cast("long").as("vec_id"), quantizeUdf(col("embedding")).as("qe"))
      .cache()
    // finally-block: a failed job mid-training must not leak the cached
    // quantized corpus in executor storage for the application lifetime
    try {

    // 1. farthest-point seeding over the capped candidate set, driver-side
    val n = qc.count()
    if (n == 0L) return Array.empty // empty corpus: no lists
    val m = (n + seedCandidateCap - 1L) / seedCandidateCap.toLong
    val candDf = if (m <= 1L) qc else qc.where(pmod(col("vec_id"), lit(m)) === 0L)
    val cands = candDf
      .orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    // a sparse-id corpus can modulo-sample thin; k-center then simply
    // exhausts early (same contract as the historical loop's exhaustion)
    val nc = cands.length
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]()
    if (nc > 0) {
      val used = new Array[Boolean](nc)
      val msim = new Array[Long](nc)
      chosen += cands(0) // lowest candidate vec_id (cands is id-sorted)
      used(0) = true
      var i = 0
      while (i < nc) { msim(i) = icos(cands(i)._2, cands(0)._2); i += 1 }
      while (chosen.length < math.min(nLists, nc)) {
        // argmin msim, ties to the lowest vec_id: strict < over id order
        var best = -1
        var bestSim = Long.MaxValue
        i = 0
        while (i < nc) {
          if (!used(i) && msim(i) < bestSim) { best = i; bestSim = msim(i) }
          i += 1
        }
        used(best) = true
        chosen += cands(best)
        val cqe = cands(best)._2
        i = 0
        while (i < nc) {
          if (!used(i)) {
            val s = icos(cands(i)._2, cqe)
            if (s > msim(i)) msim(i) = s
          }
          i += 1
        }
      }
    }
    var cents = chosen.toArray.sortBy(_._1)

    // 2. Lloyd refinement in the icos domain
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val assignU = udf { qe: Seq[Long] =>
        val q = qe.toArray
        var bestId = -1L
        var best = Long.MinValue
        bc.value.foreach { case (id, cq) =>
          val s = icos(q, cq)
          if (s > best) { best = s; bestId = id } // strict >: lowest cid wins ties
        }
        bestId
      }
      val sums = qc
        .withColumn("list_id", assignU(col("qe")))
        .select(col("list_id"), posexplode(col("qe")).as(Seq("d", "v")))
        .groupBy(col("list_id"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = sums.groupBy(_.getLong(0)).map { case (cid, rows) =>
        cid -> rows
          .sortBy(_.getInt(1))
          .map(r => math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
      }
      cents = cents.map { case (cid, old) => (cid, next.getOrElse(cid, old)) }
      bc.unpersist()
    }
    cents

    } finally qc.unpersist()
  }

  /** IVF (inverted-file) ANN — the partitioned-index scale path next to
    * LSH: the corpus is assigned to `nLists` inverted lists by nearest
    * coarse centroid, and a query scores only the vectors in its `nProbe`
    * closest lists — touching ~nProbe/nLists of the corpus instead of all
    * of it. Centroids come from [[trainIvfCentroids]] (farthest-point
    * seeding + `trainIters` Lloyd rounds; `trainIters = -1` selects the
    * untrained lowest-vec_id quantizer, the pre-trainer fallback);
    * assignment and scoring run in the exact icos domain with (icos desc,
    * id asc) tie-breaking, so the DuckDB oracle recomputes the whole
    * train→assign→probe→score→rank chain bit-for-bit.
    *
    * Scale shape: centroids broadcast (bounded driver collect of nLists
    * rows); assignment is one narrow map over the corpus; candidates come
    * from an equi-join on list_id with the (small) probe set broadcast —
    * never an all-pairs compare, and lists are size-balanced by the trained
    * centroid spread rather than a hash-bucket cliff.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nLists: Int = 8,
      nProbe: Int = 2,
      trainIters: Int = 3
  ): DataFrame = {
    val spark = corpus.sparkSession
    val cents: Array[(Long, Array[Long])] =
      if (trainIters >= 0) trainIvfCentroids(corpus, nLists, trainIters)
      else
        corpus // untrained fallback: the nLists lowest vec_ids
          .orderBy(col("vec_id"))
          .limit(nLists)
          .select(col("vec_id"), quantizeUdf(col("embedding")).as("qe"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
          .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents)

    // nearest centroid by (icos desc, centroid id asc)
    val assignUdf = udf { qe: Seq[Long] =>
      val q = qe.toArray
      var bestId = -1L
      var bestScore = Long.MinValue
      bc.value.foreach { case (cid, cqe) =>
        val s = icos(q, cqe)
        if (s > bestScore) { bestScore = s; bestId = cid }
      }
      bestId
    }
    // the query's nProbe nearest centroids, same order
    val probesUdf = udf { qe: Seq[Long] =>
      val q = qe.toArray
      bc.value
        .map { case (cid, cqe) => (cid, icos(q, cqe)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(nProbe)
        .map(_._1)
    }

    val lists = corpus
      .withColumn("qe", quantizeUdf(col("embedding")))
      .withColumn("list_id", assignUdf(col("qe")))
      .select(col("list_id"), col("vec_id"), col("qe"))
    val probes = queries
      .withColumn("query_qe", quantizeUdf(col("embedding")))
      .withColumn("list_id", explode(probesUdf(col("query_qe"))))
      .select(col("list_id"), col("vec_id").as("query_id"), col("query_qe"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("icos").desc, col("vec_id"))
    lists
      .join(broadcast(probes), Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_qe"), col("vec_id"), col("qe"))
      .distinct()
      .withColumn("icos", icosUdf(col("qe"), col("query_qe")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("icos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH ANN: signature buckets (multiple tables widen recall), exact icos
    * within candidates, top-k per query. Hot corpus buckets are truncated
    * to their first `maxBucket` members (deterministic vec_id rank) — a
    * query joining a hot bucket scores a bounded candidate prefix instead
    * of the whole bucket (partial recall) or nothing (the old drop rule);
    * candidate volume per query is the sum of its capped bucket sizes.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      seed: Long = DefaultSeed,
      maxBucket: Int = 4096
  ): DataFrame = {
    val spark = corpus.sparkSession
    val tablesDf = spark.range(nTables).select(col("id").cast("int").as("lsh_table"))
    val sig = planeSigUdf(nPlanes, seed)
    val bw = Window.partitionBy(col("lsh_table"), col("bucket")).orderBy(col("vec_id"))
    val c = corpus
      .withColumn("qe", quantizeUdf(col("embedding")))
      .crossJoin(tablesDf)
      .withColumn("bucket", sig(col("qe"), col("lsh_table")))
      .select(col("lsh_table"), col("bucket"), col("vec_id"), col("qe"))
      .withColumn("__rank", row_number().over(bw))
      .where(col("__rank") <= maxBucket)
      .drop("__rank")
    val q = queries
      .withColumn("query_qe", quantizeUdf(col("embedding")))
      .crossJoin(tablesDf)
      .withColumn("bucket", sig(col("query_qe"), col("lsh_table")))
      .select(
        col("lsh_table"),
        col("bucket"),
        col("vec_id").as("query_id"),
        col("query_qe")
      )
    val candidates = c
      .join(broadcast(q), Seq("lsh_table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_qe"), col("vec_id"), col("qe"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("icos").desc, col("vec_id"))
    candidates
      .withColumn("icos", icosUdf(col("qe"), col("query_qe")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("icos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
