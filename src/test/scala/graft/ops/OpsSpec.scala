package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Synthetic doc corpus with planted near-duplicates: base docs plus
    * mutated copies (a few words changed) and exact copies.
    */
  lazy val docs: DataFrame = {
    import spark.implicits._
    val vocab = Array(
      "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
      "window", "small", "hash", "join", "batch", "stream", "spark", "data",
      "row", "group", "query", "filter", "agg", "value", "line", "big", "slow"
    )
    def baseWords(id: Int): Array[String] =
      Array.tabulate(60)(j => vocab(TextOps.mix64(id.toLong * 77 + j).toInt.abs % vocab.length))
    val rows = (0 until 120).flatMap { id =>
      val base = baseWords(id)
      val orig = (id.toLong, base.mkString(" "), "en", s"src${id % 4}")
      val extra =
        if (id % 10 == 0) {
          // near-dup: mutate 4 of 60 words
          val mut = base.clone()
          for (j <- Seq(3, 17, 31, 45)) mut(j) = vocab((j * 7 + id) % vocab.length)
          Seq((1000L + id, mut.mkString(" "), "en", s"src${id % 4}"))
        } else if (id % 15 == 0) {
          Seq((2000L + id, base.mkString(" "), "en", s"src${id % 4}")) // exact dup
        } else Seq.empty
      orig +: extra
    }
    rows.toDF("doc_id", "text", "lang", "source").withColumn("n_chars", length($"text"))
  }

  test("exact dedup finds exactly the planted exact copies") {
    val dups = Dedup.exact(docs).collect()
    val planted = (0 until 120).count(id => id % 15 == 0 && id % 10 != 0)
    assert(dups.length == planted, s"found ${dups.length}, planted $planted")
    assert(dups.forall(_.getAs[Long]("n_copies") == 2))
  }

  test("exact dedup bounds the example list on a web-scale hot key") {
    import spark.implicits._
    // the NORMAL degenerate case at corpus scale: one boilerplate text
    // duplicated 100k times — the group must aggregate to ONE bounded row,
    // not a 100k-element array in a single aggregation buffer
    val hot = spark
      .range(100000)
      .select($"id".as("doc_id"), lit("error page not found").as("text"))
      .union(spark.range(3).select(($"id" + 500000).as("doc_id"), concat(lit("unique "), $"id").as("text")))
    val rows = Dedup.exact(hot, maxExamples = 16).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_copies") == 100000L)
    assert(r.getAs[Long]("keep_doc_id") == 0L)
    val examples = r.getAs[scala.collection.Seq[Long]]("doc_ids")
    assert(examples.size == 16, s"example list not capped: ${examples.size}")
    assert(examples.toSeq == (0L until 16L))
  }

  test("minhash LSH finds every planted near-dup pair (jaccard >= 0.5)") {
    val near = Dedup.minhashNearDups(docs, threshold = 0.5).collect()
    val foundPairs = near.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (id <- 0 until 120 if id % 10 == 0) {
      assert(
        foundPairs.contains((id.toLong, 1000L + id)),
        s"missing near-dup pair ($id, ${1000 + id}); found ${foundPairs.size} pairs"
      )
    }
    // jaccard values are genuine (not just candidates)
    assert(near.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("ngram jaccard agrees with minhash on planted pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.5).collect()
    val pairs = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (id <- 0 until 120 if id % 10 == 0)
      assert(pairs.contains((id.toLong, 1000L + id)))
  }

  test("simhash finds exact copies at hamming 0 and near-dups at small distance") {
    val near = Dedup.simhashNearDups(docs, maxHamming = 6).collect()
    val pairs = near.map(r => (r.getLong(0), r.getLong(1))).toMap.keySet ++
      near.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (id <- 0 until 120 if id % 15 == 0 && id % 10 != 0)
      assert(pairs.exists(p => p == ((id.toLong, 2000L + id))), s"missing exact pair at $id")
  }

  test("resolveClusters labels chains transitively with the component min") {
    import spark.implicits._
    // A~B, B~C, D~E: two components; similarity is NOT transitive (no A~C
    // pair) but the component label must be
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = graft.ops.Dedup
      .resolveClusters(pairs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // long chain: convergence takes O(diameter) rounds, must still fixpoint
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = graft.ops.Dedup.resolveClusters(chain).collect()
    assert(labels.forall(_.getLong(1) == 1L))
  }

  test("quality features and subword counts are sane") {
    import spark.implicits._
    val q = TextOps.withQualityFeatures(docs)
    val row = q.where($"doc_id" === 0L).select($"word_count", $"chars_nospace").head()
    assert(row.getLong(0) == 60L)
    val sub = docs
      .withColumn("subwords", TextOps.subwordCountUdf($"text"))
      .agg(sum($"subwords"))
      .head()
      .getLong(0)
    assert(sub > 0)
  }

  test("langId heuristic classifies stopword-bearing text") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat is on the mat and the dog is in the house"),
      (2L, "el perro es un animal que vive en la casa"),
      (3L, "der hund ist ein tier und die katze ist zu haus")
    ).toDF("id", "text")
    val out = samples
      .withColumn("lang", TextOps.langIdUdf(TextOps.wordsCol($"text")))
      .select($"id", $"lang")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  lazy val embeddings: DataFrame = {
    import spark.implicits._
    // clustered embeddings: 8 centers, 30 points each, deterministic jitter
    val rows = for (c <- 0 until 8; i <- 0 until 30) yield {
      val emb = Array.tabulate(32) { d =>
        val center = if (TextOps.mix64(c.toLong * 31 + d) % 3 == 0) 1.0f else -1.0f
        val jitter = (TextOps.mix64(c.toLong << 32 | i.toLong << 8 | d.toLong) % 100) / 1000.0f
        center + jitter
      }
      (c * 100L + i, emb, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("brute-force cosine top-k returns k neighbors, mostly same-cluster") {
    import spark.implicits._
    val queries = embeddings.where($"vec_id" % 100 === 0) // one per cluster
    val topk = Ann.bruteForceTopK(embeddings, queries, k = 5).collect()
    assert(topk.length == 8 * 5)
    val sameCluster = topk.count(r => r.getLong(0) / 100 == r.getLong(1) / 100)
    assert(sameCluster >= 36, s"only $sameCluster/40 same-cluster neighbors")
  }

  test("embedding-cosine near-dups finds same-cluster pairs, none below threshold") {
    import spark.implicits._
    val pairs = Ann.cosineNearDups(embeddings, threshold = 0.9, nPlanes = 6, nTables = 6).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.9))
    // clustered corpus: high-cosine pairs should be overwhelmingly same-cluster
    val sameCluster = pairs.count(r => r.getLong(0) / 100 == r.getLong(1) / 100)
    assert(sameCluster.toDouble / pairs.length >= 0.9, s"$sameCluster/${pairs.length}")
  }

  test("hot-bucket salt-split: planted identical-doc flood stays bounded AND reports dups") {
    import spark.implicits._
    // 260 byte-identical docs: every band of every minhash signature lands
    // in ONE bucket. The old drop-rule returned ZERO pairs here (silent
    // recall loss on boilerplate corpora); salt groups of <= 64 bound the
    // join at O(m·cap) while still pairing within groups.
    val text = "the fast key order sort table scan merge part window small hash join"
    val flood = (0 until 260)
      .map(id => (id.toLong, text, "en", "boiler"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
    val cap = 64
    val pairs = Dedup.minhashNearDups(flood, threshold = 0.9, maxBucket = cap).collect()
    // deterministic salt groups by doc_id rank: 64+64+64+64+4 members
    // (identical across bands, so distinct() collapses the 16 bands)
    val groups = Seq(64, 64, 64, 64, 4)
    val expected = groups.map(g => g * (g - 1) / 2).sum
    assert(pairs.length == expected, s"got ${pairs.length}, want $expected bounded pairs")
    // every reported pair is a true duplicate (identical text -> jaccard 1)
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
    // and pairs never cross a salt group boundary (the work bound)
    assert(pairs.forall(r => r.getLong(0) / cap == r.getLong(1) / cap))
  }

  test("cosine near-dup salt-split bounds identical-vector floods without dropping them") {
    import spark.implicits._
    val vec = Array.tabulate(16)(d => if (d % 3 == 0) 1.0f else 0.5f)
    val flood = (0 until 150)
      .map(id => (id.toLong, vec, 0))
      .toDF("vec_id", "embedding", "label")
    val cap = 50
    val pairs =
      Ann.cosineNearDups(flood, threshold = 0.99, nPlanes = 4, nTables = 2, maxBucket = cap)
        .collect()
    val expected = 3 * (cap * (cap - 1) / 2) // groups of 50/50/50, same per table
    assert(pairs.length == expected, s"got ${pairs.length}, want $expected")
    assert(pairs.forall(_.getAs[Long]("icos") == Ann.IcosScale))
    assert(pairs.forall(r => r.getLong(0) / cap == r.getLong(1) / cap))
  }

  test("LSH top-k truncates hot buckets to a bounded prefix instead of dropping them") {
    import spark.implicits._
    val vec = Array.tabulate(16)(d => if (d % 2 == 0) 1.0f else -0.25f)
    val flood = (0 until 120).map(id => (id.toLong, vec, 0)).toDF("vec_id", "embedding", "label")
    val queries = flood.where($"vec_id" === 0L)
    // old drop rule: bucket of 120 > cap 32 vanished -> zero results;
    // rank-truncation keeps the first 32 members as candidates
    val topk = Ann.lshTopK(flood, queries, k = 5, nPlanes = 2, nTables = 2, maxBucket = 32).collect()
    assert(topk.length == 5, s"got ${topk.length} of 5")
    // candidates come from the deterministic vec_id-rank prefix
    assert(topk.forall(_.getLong(1) < 32L))
  }

  test("IVF top-k touches only probed lists and recalls most of brute force") {
    import spark.implicits._
    val queries = embeddings.where($"vec_id" % 100 === 0)
    val exact = Ann
      .bruteForceTopK(embeddings, queries, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // 16 lists over 8 clusters; probing 4 lists per query
    val ivf = Ann.ivfTopK(embeddings, queries, k = 5, nLists = 16, nProbe = 4).collect()
    assert(ivf.length == 8 * 5)
    // deterministic total order: rank 1..5 per query
    assert(ivf.groupBy(_.getLong(0)).values.forall(_.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    val recalled = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & recalled).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("trained IVF centroids balance lists by geometry, not id order") {
    import spark.implicits._
    val cents = Ann.trainIvfCentroids(embeddings, nLists = 8, iters = 3)
    assert(cents.length == 8)
    // farthest-point seeding on 8 well-separated clusters lands one seed
    // per cluster (the k-center property) — the lowest-id quantizer would
    // have put all 8 in cluster 0
    assert(cents.map(_._1 / 100).toSet.size == 8, s"seed clusters: ${cents.map(_._1).mkString(",")}")
    // every list ends up with its cluster's ~30 members
    val vecs = embeddings
      .select($"vec_id", $"embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(Ann.quantize).toArray))
    val sizes = vecs
      .groupBy { case (_, qe) =>
        cents.foldLeft((-1L, Long.MinValue)) { case (acc @ (_, best), (cid, cqe)) =>
          val s = Ann.icos(qe, cqe)
          if (s > best) (cid, s) else acc
        }._1
      }
      .view
      .mapValues(_.length)
    assert(sizes.size == 8)
    assert(sizes.values.max <= 2 * sizes.values.min, s"unbalanced: $sizes")
  }

  test("IVF trainer runs O(1) Spark jobs, not one per centroid") {
    import spark.implicits._
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val cents = Ann.trainIvfCentroids(embeddings, nLists = 64, iters = 2)
      assert(cents.length == 64)
      Thread.sleep(2000) // listener bus is async — let job-start events drain
      // count + candidate collect + 2 Lloyd collects (+ a little slack for
      // cache materialization); the replaced step-per-centroid loop ran 64+
      assert(jobs <= 10, s"trainer ran $jobs jobs for 64 centroids")
      // the capped driver-side seeding picks the SAME centroids as the
      // distributed formulation: geometric spread across the 8 clusters
      assert(cents.map(_._1 / 100).toSet.size == 8)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("IVF trainer candidate sampling engages above the cap, deterministically") {
    import spark.implicits._
    // cap 128 over the 240-vector fixture -> m = ceil(240/128) = 2 ->
    // candidates are the vec_id % 2 == 0 slice; seeding still spreads
    // across clusters
    val cents = Ann.trainIvfCentroids(embeddings, nLists = 8, iters = 0, seedCandidateCap = 128)
    assert(cents.length == 8)
    assert(cents.forall(_._1 % 2 == 0), s"seeds outside the modulo-2 slice: ${cents.map(_._1).mkString(",")}")
    assert(cents.map(_._1 / 100).toSet.size == 8)
    val again = Ann.trainIvfCentroids(embeddings, nLists = 8, iters = 0, seedCandidateCap = 128)
    assert(cents.map(_._1).toSeq == again.map(_._1).toSeq)
  }

  test("IVF on an empty corpus returns empty, not a crash") {
    import spark.implicits._
    val empty = embeddings.where(lit(false))
    assert(Ann.trainIvfCentroids(empty, nLists = 4).isEmpty)
    assert(Ann.ivfTopK(empty, embeddings.where($"vec_id" < 5), k = 3).collect().isEmpty)
  }

  test("LSH top-k recalls most of brute-force top-k") {
    import spark.implicits._
    val queries = embeddings.where($"vec_id" % 100 === 0)
    val exact = Ann
      .bruteForceTopK(embeddings, queries, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val approx = Ann
      .lshTopK(embeddings, queries, k = 5, nPlanes = 8, nTables = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall")
  }
}
