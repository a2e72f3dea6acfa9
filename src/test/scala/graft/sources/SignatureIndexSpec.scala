package graft.sources

import graft.ops.Dedup
import graft.pipeline.{EncodeJob, Maintenance, SparkTestBase, TokenTables}
import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[SignatureIndex]] — the persistent MinHash-signature sidecar behind
  * `dedup_near(incremental => true)`: signatures must pin the query-side
  * chain (tokenShingles → minhashFromShingles) exactly, coverage must be
  * file-incremental, and the incremental verb must delete exactly what the
  * full-scan verb deletes.
  */
class SignatureIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 64, maxBlockValues = 32768)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def shingleSet(tokens: Array[Int], n: Int = 4): Set[Long] = {
    val arr = tokens.map(_.toLong)
    (0 to arr.length - n).map(p => graft.ops.Decontaminate.gramHash(arr, p, n)).toSet
  }

  /** DedupNearSpec's self-validating fixture: truncated near-copies in both
    * keeper directions plus an unrelated replacement.
    */
  private def nearDups(seed: Long) = {
    val base = TokenTables.synthetic(spark, 150L, seed = seed).collect()
    val candidates = base.filter(_.n_tok >= 40).filter { d =>
      val so = shingleSet(d.tokens)
      val sc = shingleSet(d.tokens.dropRight(2))
      sc.size < so.size && sc.size.toDouble >= so.size * 0.75
    }
    assert(candidates.length >= 2, s"fixture found only ${candidates.length} candidates")
    val a = candidates(0)
    val b = candidates(1)
    val planted = Seq(
      a.copy(doc_id = s"aa-near-${a.doc_id}", tokens = a.tokens.dropRight(2), n_tok = a.n_tok - 2),
      b.copy(doc_id = s"zz-near-${b.doc_id}", tokens = b.tokens.dropRight(2), n_tok = b.n_tok - 2)
    )
    (base.toSeq, planted, a.doc_id, b.doc_id)
  }

  test("index signatures pin the tokenShingles->minhash chain; coverage is incremental") {
    import spark.implicits._
    val input = TokenTables.synthetic(spark, 120L, seed = 31L)
    val rows = input.collect().toSeq
    val dir = freshDir("graft-six")
    EncodeJob.run(input, dir, cfg)
    val conf = spark.sparkContext.hadoopConfiguration
    val live = Maintenance.liveBlockFiles(dir, conf).map(_._1)

    val (e1, built1) = SignatureIndex.ensure(spark, dir, live, shingleN = 4, k = 16)
    assert(built1 == live.length.toLong)
    val got = e1
      .select("doc_id", "minhash")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList)
      .toMap
    val expected = Dedup
      .minhashFromShingles(
        Dedup.tokenShingles(spark.createDataset(rows).toDF(), 4),
        16
      )
      .select("doc_id", "minhash")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList)
      .toMap
    assert(got == expected, "sidecar signatures must equal the query-side chain")

    // short-doc sentinel is exercised iff the fixture has one; the kernel's
    // < shingleN branch is pinned by the map equality either way
    val (_, built2) = SignatureIndex.ensure(spark, dir, live, shingleN = 4, k = 16)
    assert(built2 == 0L, "covered ensure must sign nothing")

    // different params = different sidecar: a k=8 ensure builds from scratch
    val (e8, built8) = SignatureIndex.ensure(spark, dir, live, shingleN = 4, k = 8)
    assert(built8 == live.length.toLong)
    assert(e8.select("minhash").head().getSeq[Long](0).length == 8)
  }

  test("incremental dedupNear: same deletions as full-scan, only new files signed, idempotent") {
    import spark.implicits._
    val (base, planted, aId, bId) = nearDups(57L)

    // twin dirs, identical corpora: full-scan on one, incremental on the other
    val dirFull = freshDir("graft-six-full")
    val dirIncr = freshDir("graft-six-incr")
    EncodeJob.run(spark.createDataset(base ++ planted), dirFull, cfg)

    // incr dir: prime the index on the base corpus, then APPEND the planted
    // near-dups — the verb must sign only the appended files
    EncodeJob.run(spark.createDataset(base), dirIncr, cfg)
    val conf = spark.sparkContext.hadoopConfiguration
    val live0 = Maintenance.liveBlockFiles(dirIncr, conf).map(_._1)
    SignatureIndex.ensure(spark, dirIncr, live0, shingleN = 4, k = 64): Unit
    spark.createDataset(planted).write.format("graft").mode("append").save(dirIncr)
    val liveAll = Maintenance.liveBlockFiles(dirIncr, conf).map(_._1)

    val rFull = Maintenance.dedupNear(spark, dirFull, threshold = 0.7)
    val rIncr = Maintenance.dedupNear(spark, dirIncr, threshold = 0.7, incremental = true)
    assert(rIncr.snapshotId.nonEmpty)
    assert(rIncr.filesSigned > 0L && rIncr.filesSigned < liveAll.length.toLong,
      s"must sign only appended files: ${rIncr.filesSigned} of ${liveAll.length}")
    assert(rIncr.nPairs == rFull.nPairs && rIncr.docsDeleted == rFull.docsDeleted,
      s"incremental $rIncr != full ${rFull}")

    def kept(dir: String): Set[String] =
      spark.read.format("graft").load(dir).select("doc_id").collect().map(_.getString(0)).toSet
    assert(kept(dirIncr) == kept(dirFull), "both paths must keep the same documents")
    assert(kept(dirIncr).contains(s"aa-near-$aId") && !kept(dirIncr).contains(aId))
    assert(kept(dirIncr).contains(bId) && !kept(dirIncr).contains(s"zz-near-$bId"))

    // idempotent: deletes are live now, so liveness flows through the
    // (_file, doc_id) semi-join; nothing new to sign, nothing to delete
    val r2 = Maintenance.dedupNear(spark, dirIncr, threshold = 0.7, incremental = true)
    assert(r2.snapshotId.isEmpty && r2.docsDeleted == 0L && r2.filesSigned == 0L, s"got $r2")
  }

  test("SQL face reports files_signed; vacuum sweeps _sig_index staging only") {
    import spark.implicits._
    val (base, planted, _, _) = nearDups(91L)
    val dir = freshDir("graft-six-sql")
    EncodeJob.run(spark.createDataset(base ++ planted), dir, cfg)

    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    // pre-build through the SQL face: the off-peak indexing verb (same
    // params as the dedup's defaults, so the sidecars are the same dir)
    val bld = spark.sql(s"CALL graft.system.build_sig_index(path => '$dir')").head()
    assert(bld.getLong(0) > 0L, "first build signs files")
    val bld2 = spark.sql(s"CALL graft.system.build_sig_index(path => '$dir')").head()
    assert(bld2.getLong(0) == 0L && bld2.getInt(1) > 0, "second build is covered")
    val row = spark
      .sql(s"CALL graft.system.dedup_near(path => '$dir', incremental => true)")
      .head()
    assert(!row.isNullAt(0), "snapshot committed")
    assert(row.getLong(3) >= 2L) // docs_deleted
    assert(!row.isNullAt(4) && row.getLong(4) == 0L,
      "dedup after pre-build must be a pure sidecar read")
    // full-scan face keeps files_signed null
    val full = spark.sql(s"CALL graft.system.dedup_near(path => '$dir')").head()
    assert(full.isNullAt(4))

    val conf = spark.sparkContext.hadoopConfiguration
    val six = new org.apache.hadoop.fs.Path(dir, SignatureIndex.dirName(4, 64))
    val fs = six.getFileSystem(conf)
    val debris = new org.apache.hadoop.fs.Path(six, ".tmp-crashed")
    fs.mkdirs(debris)
    val committed = fs.listStatus(six).count(_.getPath.getName.startsWith("six-"))
    assert(committed > 0)
    Maintenance.vacuum(spark, dir, olderThanMs = 0L)
    assert(!fs.exists(debris), "vacuum must sweep .tmp- under _sig_index dirs")
    assert(fs.listStatus(six).count(_.getPath.getName.startsWith("six-")) == committed)
  }

  test("band-sketch level: same deletions as full signatures, a fraction of the bytes") {
    import spark.implicits._
    val (base, planted, aId, bId) = nearDups(143L)
    val dirSig = freshDir("graft-skx-sig")
    val dirSkx = freshDir("graft-skx")
    EncodeJob.run(spark.createDataset(base ++ planted), dirSig, cfg)
    EncodeJob.run(spark.createDataset(base ++ planted), dirSkx, cfg)
    val conf = spark.sparkContext.hadoopConfiguration

    // sketch rows pin the bandSketch(sigRow) chain: bands ints per doc
    val live = Maintenance.liveBlockFiles(dirSkx, conf).map(_._1)
    val (sk, builtSk) = SignatureIndex.ensureSketch(spark, dirSkx, live, 4, 64, 16)
    assert(builtSk == live.length.toLong)
    assert(sk.select("bands").head().getSeq[Int](0).length == 16)

    // recall/precision parity: the sketch-incremental verb deletes exactly
    // what the full-signature full-scan verb deletes
    val rSig = Maintenance.dedupNear(spark, dirSig, threshold = 0.7)
    val rSkx =
      Maintenance.dedupNear(spark, dirSkx, threshold = 0.7, incremental = true, sketch = true)
    assert(rSkx.filesSigned == 0L, "pre-built sketch: nothing to sign")
    assert(rSkx.nPairs == rSig.nPairs && rSkx.docsDeleted == rSig.docsDeleted,
      s"sketch $rSkx != full $rSig")
    def kept(dir: String): Set[String] =
      spark.read.format("graft").load(dir).select("doc_id").collect().map(_.getString(0)).toSet
    assert(kept(dirSkx) == kept(dirSig))
    assert(kept(dirSkx).contains(s"aa-near-$aId") && !kept(dirSkx).contains(aId))
    assert(kept(dirSkx).contains(bId) && !kept(dirSkx).contains(s"zz-near-$bId"))

    // sketch => true without incremental is a contract error, named
    val e = intercept[IllegalArgumentException](
      Maintenance.dedupNear(spark, dirSkx, sketch = true)
    )
    assert(e.getMessage.contains("incremental"), e.getMessage)
  }

  test("sketch footprint stays under 0.1x payload at 1k-token docs") {
    import spark.implicits._
    // the honest-sizing scenario from the r4 verdict: 1000-token documents,
    // where the k=64 signature sidecar was ~0.5x payload. Tokens must be
    // entropy-bearing (mix64 draws, ~15 bits each) — a linear progression
    // would let the delta codec crush the payload and overstate the ratio
    val docs = (0 until 512).map { i =>
      graft.pipeline.TokenRow(
        f"doc-$i%04d",
        Array.tabulate(1000)(j =>
          (graft.ops.TextOps.mix64(i.toLong * 1009L + j) & 0x7fffL).toInt
        ),
        1000,
        "s"
      )
    }
    val dir = freshDir("graft-skx-size")
    EncodeJob.run(spark.createDataset(docs), dir, cfg)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    def bytesUnder(sub: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir, sub)
      if (!fs.exists(p)) 0L
      else {
        val it = fs.listFiles(p, true)
        var b = 0L
        while (it.hasNext) b += it.next().getLen
        b
      }
    }
    val payload = bytesUnder("blocks")
    val live = Maintenance.liveBlockFiles(dir, conf).map(_._1)
    SignatureIndex.ensureSketch(spark, dir, live, 4, 64, 16): Unit
    SignatureIndex.ensure(spark, dir, live, 4, 64): Unit
    val sketchBytes = bytesUnder(SignatureIndex.sketchDirName(4, 64, 16))
    val sigBytes = bytesUnder(SignatureIndex.dirName(4, 64))
    assert(sketchBytes > 0L && payload > 0L)
    assert(sketchBytes * 10L <= payload,
      s"sketch $sketchBytes bytes > 0.1x payload $payload")
    assert(sketchBytes * 3L <= sigBytes,
      s"sketch $sketchBytes not meaningfully smaller than signatures $sigBytes")
  }
}
