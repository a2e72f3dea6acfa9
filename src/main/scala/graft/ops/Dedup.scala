package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each shaped for
  * scale: exact dedup is a hash group-by; MinHash+LSH and SimHash generate
  * candidate pairs via bucket equi-joins (shuffle on the bucket key — never
  * an all-pairs comparison), then verify candidates exactly.
  *
  * Every bucket join is CAPPED: a degenerate bucket (empty texts, boilerplate
  * pages, zero vectors) of m members would otherwise emit m²/2 pairs onto one
  * shuffle partition — at 100 TB a single hot bucket is billions of rows.
  * Buckets above `maxBucket` are SALT-SPLIT before the self-join
  * ([[saltBuckets]]): work stays bounded at O(m·cap) per hot bucket, and the
  * bucket's duplicates are still reported (within salt groups, plus through
  * their other bands/tables) instead of silently dropped — the analog of the
  * reference's chunked "Approximated" selection
  * (/root/reference/src/graphs/parameters.rs:131-134), which bounds work per
  * chunk while still processing every element.
  */
object Dedup {

  /** Salt-split bucket groups for a bounded self-join: members of each
    * bucket are ranked deterministically by `orderCol` and assigned salt
    * group rank/cap, so the join key (keys + __salt) holds at most `cap`
    * members — a hot bucket of m rows costs O(m·cap) pairs, not O(m²), and
    * every member still pairs within its group (no recall cliff to zero).
    * One window over the same key the join shuffles on — no extra exchange.
    */
  private[ops] def saltBuckets(
      banded: DataFrame,
      keys: Seq[String],
      orderCol: String,
      cap: Int
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    banded.withColumn("__salt", ((row_number().over(w) - 1) / cap).cast("int"))
  }

  /** Exact duplicate accounting by content hash (xxhash64 group-by).
    *
    * `n_copies`/`keep_doc_id` are exact at any group size; the example id
    * list is CAPPED at the `maxExamples` smallest doc_ids. Web-scale
    * corpora make the hot-group case the NORMAL case (an empty page or
    * boilerplate error page duplicated 10⁸–10⁹ times), and an unbounded
    * `collect_list` would materialize every copy's id into one aggregation
    * buffer — a single-group executor OOM. The window rank bounds what is
    * collected BEFORE aggregation (rows past the cap contribute null, which
    * collect_list drops), and partitions on the same content_hash the
    * group-by shuffles on, so the bound costs no extra exchange.
    */
  def exact(docs: DataFrame, maxExamples: Int = 16): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    docs
      .select(xxhash64(col("text")).as("content_hash"), col("doc_id"))
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("content_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keep_doc_id"),
        sort_array(collect_list(when(col("__rk") <= maxExamples, col("doc_id"))))
          .as("doc_ids")
      )
      .where(col("n_copies") > 1)
  }

  /** Per-permutation salt for MinHash (cross-engine: see [[XHash]]). */
  def minhashSalt(i: Int): Long = XHash.mix62(0x5eedL + i)

  /** MinHash signatures: k seeded min-hashes over word n-gram shingles.
    * Permutation i is the 62-bit bijection s -> mix62(s ^ salt_i); an empty
    * shingle set yields the max-62-bit sentinel in every slot (the DuckDB
    * oracle's coalesce default — NOT Long.MaxValue, which exceeds the
    * cross-engine domain).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 64, shingleN: Int = 3): DataFrame =
    minhashFromShingles(
      docs.withColumn("shingles", TextOps.shingleUdf(shingleN)(TextOps.wordsCol(col("text")))),
      k
    )

  /** MinHash signatures over an already-shingled frame (doc_id, shingles:
    * array<long>) — the shared back half of [[minhashSignatures]] and the
    * token-shingle path ([[tokenShingles]] + the corpus near-dedup verb).
    */
  def minhashFromShingles(shingled: DataFrame, k: Int = 64): DataFrame = {
    val salts = Array.tabulate(k)(minhashSalt)
    val sigUdf = udf { shingles: Seq[Long] =>
      if (shingles == null || shingles.isEmpty) Array.fill(k)(XHash.Mask62)
      else {
        val sig = Array.fill(k)(XHash.Mask62)
        shingles.foreach { s =>
          var i = 0
          while (i < k) {
            val h = XHash.mix62(s ^ salts(i))
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        sig
      }
    }
    shingled
      .withColumn("minhash", sigUdf(col("shingles")))
      .select(col("doc_id"), col("shingles"), col("minhash"))
  }

  /** Distinct token n-gram shingles per document — the token-stream analog
    * of the word shingles: each consecutive n-window folds through
    * [[Decontaminate.gramHash]] (XHash.fold over raw token values, the same
    * rule the eval-set screen uses, so the DuckDB twin is the proven
    * `list_reduce(list_prepend(FoldInit, toks[p:p+n-1]), sqlFoldStep)`).
    * Docs shorter than n yield an empty set (the sentinel-signature case).
    */
  def tokenShingles(corpus: DataFrame, n: Int = 4): DataFrame = {
    val shUdf = udf { tokens: Seq[Int] =>
      if (tokens == null || tokens.length < n) Array.empty[Long]
      else {
        val arr = new Array[Long](tokens.length)
        var i = 0
        while (i < arr.length) { arr(i) = tokens(i).toLong; i += 1 }
        val seen = new java.util.LinkedHashSet[java.lang.Long]()
        var p = 0
        while (p + n <= arr.length) { seen.add(Decontaminate.gramHash(arr, p, n)): Unit; p += 1 }
        val out = new Array[Long](seen.size)
        val it = seen.iterator()
        var j = 0
        while (it.hasNext) { out(j) = it.next(); j += 1 }
        out
      }
    }
    corpus.select(col("doc_id"), shUdf(col("tokens")).as("shingles"))
  }

  /** LSH banding: split the k-signature into `bands` bands of k/bands rows;
    * docs sharing any band bucket are candidates. Bucket join = one shuffle
    * on the band key; pairs are built per bucket (buckets are small when
    * bands/rows are sized for the target similarity).
    */
  /** The band-bucket key rule shared by [[lshCandidatePairs]] and the
    * band-sketch sidecar ([[graft.sources.SignatureIndex]]'s sketch level):
    * fold band `band`'s rows of the k-signature.
    */
  def bandHash(sig: Array[Long], bands: Int, band: Int): Long = {
    val rows = sig.length / bands
    var h = XHash.FoldInit ^ band.toLong
    var i = band * rows
    while (i < (band + 1) * rows) { h = XHash.mix62(h ^ sig(i)); i += 1 }
    h
  }

  /** 32-bit truncation of every band's hash — the sketch sidecar's stored
    * form (bands·4 B/doc instead of k·8): bucketing on the truncation
    * admits a superset of the full-hash candidates (a 1-in-4G extra
    * collision per band), and exact-Jaccard verification decides membership
    * either way — precision is untouched and recall can only gain.
    */
  def bandSketch(sig: Array[Long], bands: Int): Array[Int] =
    Array.tabulate(bands)(b => (bandHash(sig, bands, b) & 0xffffffffL).toInt)

  def lshCandidatePairs(sigs: DataFrame, bands: Int = 16, maxBucket: Int = 1024): DataFrame = {
    val bandUdf = udf { (sig: Seq[Long], band: Int) => bandHash(sig.toArray, bands, band) }
    val banded = saltBuckets(
      sigs
        .select(col("doc_id"), col("minhash"))
        .crossJoin(spark_range_bands(sigs, bands))
        .withColumn("bucket", bandUdf(col("minhash"), col("band"))),
      Seq("band", "bucket"),
      "doc_id",
      maxBucket
    )
    val a = banded.select(col("band"), col("bucket"), col("__salt"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("__salt"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket", "__salt"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  private def spark_range_bands(df: DataFrame, bands: Int): DataFrame =
    df.sparkSession.range(bands).select(col("id").cast("int").as("band"))

  /** LSH candidates from PRE-COMPUTED band sketches (`doc_id`, `bands:
    * array<int>` — [[bandSketch]] rows, e.g. the signature sidecar's sketch
    * level): no signatures in flight, one posexplode plus the identical
    * salt-capped bucket join. Bucketing on the 32-bit sketch instead of the
    * 62-bit hash can only MERGE buckets (extra candidates, killed by exact
    * verification), never split them.
    */
  def lshCandidatePairsFromBands(bandsDf: DataFrame, maxBucket: Int = 1024): DataFrame = {
    val exploded = bandsDf
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
    val banded = saltBuckets(exploded, Seq("band", "bucket"), "doc_id", maxBucket)
    val a = banded.select(col("band"), col("bucket"), col("__salt"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("__salt"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket", "__salt"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact Jaccard similarity over shingle sets for candidate verification. */
  def jaccard(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    val sa = shingled.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    pairs
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn(
        "jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni")).otherwise(0.0)
      )
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
  }

  /** Full MinHash near-dup pipeline: signatures -> LSH candidates -> exact
    * Jaccard filter at `threshold`.
    */
  def minhashNearDups(
      docs: DataFrame,
      threshold: Double = 0.5,
      k: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      maxBucket: Int = 1024
  ): DataFrame = {
    val sigs = minhashSignatures(docs, k, shingleN)
    val candidates = lshCandidatePairs(sigs, bands, maxBucket)
    // integer threshold test (inter/uni are exact set sizes) so the filter is
    // reproducible in any engine without floating-point comparison
    jaccard(candidates, sigs.select("doc_id", "shingles"))
      .where(col("uni") > 0 && col("inter").cast("double") >= col("uni") * threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup candidates: 64-bit signature, banded into 4x16-bit
    * keys (Hamming distance <= 3 guarantees an exact match in at least one
    * band), verified by exact Hamming distance.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 1024): DataFrame = {
    val sigs = docs
      .withColumn("simhash", TextOps.simhashUdf(TextOps.wordsCol(col("text"))))
      .select(col("doc_id"), col("simhash"))
    val banded = saltBuckets(
      sigs
        .crossJoin(spark_range_bands(sigs, 4))
        .withColumn("bucket", expr("(simhash >> (band * 16)) & 65535")),
      Seq("band", "bucket"),
      "doc_id",
      maxBucket
    )
    val a = banded.select(col("band"), col("bucket"), col("__salt"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("__salt"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("band", "bucket", "__salt"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** N-gram Jaccard near-dups without LSH (exact, for small verification
    * sets): prefilter pairs sharing at least one rare shingle.
    */
  def ngramJaccardPairs(docs: DataFrame, shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val shingled = docs
      .withColumn("shingles", TextOps.shingleUdf(shingleN)(TextOps.wordsCol(col("text"))))
      .select(col("doc_id"), col("shingles"))
    val posting = shingled
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val w = Window.partitionBy(col("shingle"))
    val rare = posting
      .withColumn("df", count(lit(1)).over(w))
      .where(col("df") <= 50) // skip stop-shingles: bounded bucket size
    val a = rare.select(col("shingle"), col("doc_id").as("doc_a"))
    val b = rare.select(col("shingle"), col("doc_id").as("doc_b"))
    val pairs = a
      .join(b, "shingle")
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    jaccard(pairs, shingled)
      .where(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Resolve near-duplicate pairs into connected components — the step a
    * dedup pipeline needs AFTER pair generation: near-dup similarity is not
    * transitive (A~B, B~C without A~C), so keeping "one of each pair"
    * under- or over-deletes; the component gives each doc a canonical
    * cluster id (the smallest doc_id reachable through pair edges), and
    * "keep cluster == doc_id" keeps exactly one doc per cluster.
    *
    * Iterated min-label propagation to fixpoint: labels only decrease, one
    * shuffle round per iteration, converging in O(component diameter)
    * rounds — pair sets from the capped LSH joins keep components small, so
    * this is a handful of rounds at any corpus size. Fails loudly rather
    * than returning a non-fixpoint labeling.
    *
    * @param pairs (doc_a, doc_b) near-dup pairs (any further columns ignored)
    * @return (doc_id, cluster) for every doc that appears in a pair
    */
  def resolveClusters(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .cache()
    // localCheckpoint per round: iterative self-joins otherwise nest each
    // round's plan inside the next — exponential lineage that OOMs the
    // driver long before the data does
    var labels = edges
      .select(col("a").as("doc_id"))
      .distinct()
      .withColumn("cluster", col("doc_id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("b"), col("cluster").as("nl")), Seq("b"))
        .groupBy(col("a").as("doc_id"))
        .agg(min(col("nl")).as("nmin"))
      val next = labels
        .join(neighborMin, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster")
        )
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("doc_id"), col("cluster").as("old")), Seq("doc_id"))
        .where(col("cluster") =!= col("old"))
        .count()
      unpersistCheckpoint(labels)
      labels = next
      iter += 1
    }
    edges.unpersist()
    require(changed == 0, s"cluster resolution did not converge in $maxIters rounds")
    labels
  }

  /** Free a `localCheckpoint(true)`'d round's storage NOW. `Dataset
    * .unpersist` is a no-op for checkpoints (they persist the RDD directly,
    * bypassing the cache manager, and are otherwise only reclaimed when the
    * ContextCleaner gets to the GC'd reference) — so walk this dataset's own
    * physical lineage to its persisted ancestor and unpersist that.
    */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit = {
    var r: org.apache.spark.rdd.RDD[_] = df.queryExecution.toRdd
    while (r.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE &&
      r.dependencies.nonEmpty) r = r.dependencies.head.rdd
    if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
      r.unpersist(blocking = false): Unit
  }
}
