package graft.pipeline

import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[Maintenance.dedupNear]] — in-place NEAR-dup corpus dedup (MinHash+LSH
  * over token shingles, exact-Jaccard verified, component-resolved, one
  * equality-delete snapshot).
  */
class DedupNearSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 128, maxBlockValues = 32768)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** The op's shingle rule, locally (Dedup.tokenShingles twin). */
  private def shingleSet(tokens: Array[Int], n: Int = 4): Set[Long] = {
    val arr = tokens.map(_.toLong)
    (0 to arr.length - n).map(p => graft.ops.Decontaminate.gramHash(arr, p, n)).toSet
  }

  /** Base corpus plus planted NEAR duplicates: two docs get truncated copies
    * (last two tokens dropped). Candidates are selected by their LOCALLY
    * computed shingle sets so the fixture is self-validating: the copy's set
    * must be a STRICT subset of the original's (so threshold 1.0 rejects the
    * pair) with Jaccard >= 0.75 (so threshold 0.7 accepts it) — repetitive
    * docs where truncation changes nothing are skipped. One copy id sorts
    * BEFORE its original, one after. A third doc gets an UNRELATED
    * replacement (disjoint token range) that must NOT pair with anything.
    */
  private def nearDupInput(seed: Long) = {
    import spark.implicits._
    val base = TokenTables.synthetic(spark, 150L, seed = seed).collect()
    val candidates = base.filter(_.n_tok >= 40).filter { d =>
      val so = shingleSet(d.tokens)
      val sc = shingleSet(d.tokens.dropRight(2))
      sc.size < so.size && sc.size.toDouble >= so.size * 0.75
    }
    assert(candidates.length >= 3, s"fixture found only ${candidates.length} candidates")
    val a = candidates(0)
    val b = candidates(1)
    val planted = Seq(
      a.copy(
        doc_id = s"aa-near-${a.doc_id}",
        tokens = a.tokens.dropRight(2),
        n_tok = a.n_tok - 2
      ),
      b.copy(
        doc_id = s"zz-near-${b.doc_id}",
        tokens = b.tokens.dropRight(2),
        n_tok = b.n_tok - 2
      ),
      candidates(2).copy(
        doc_id = s"mm-unrelated",
        tokens = Array.tabulate(candidates(2).n_tok)(i => 900000000 + i * 7919)
      )
    )
    (spark.createDataset(base.toSeq ++ planted), a.doc_id, b.doc_id)
  }

  test("dedupNear deletes the larger id of each near-dup pair, leaves the rest") {
    val (input, aId, bId) = nearDupInput(57L)
    val all = input.collect().map(_.doc_id).toSet

    val dir = freshDir("graft-neardup")
    EncodeJob.run(input, dir, cfg)
    val r = Maintenance.dedupNear(spark, dir, threshold = 0.7)
    assert(r.snapshotId.nonEmpty)
    assert(r.nPairs >= 2L)
    assert(r.docsDeleted >= 2L)

    val after = spark.read.format("graft").load(dir)
    val kept = after.select("doc_id").collect().map(_.getString(0)).toSet

    // pair (aa-near-X, X): 'a…' < 'd…' so the COPY is the keeper
    assert(kept.contains(s"aa-near-$aId") && !kept.contains(aId))
    // pair (Y, zz-near-Y): the ORIGINAL is the keeper
    assert(kept.contains(bId) && !kept.contains(s"zz-near-$bId"))
    // the unrelated doc never pairs
    assert(kept.contains("mm-unrelated"))
    // nothing outside the reported deletions vanished
    assert((all -- kept).size == r.docsDeleted)

    // fixpoint on this (uncapped-bucket) corpus: a second run finds nothing
    val r2 = Maintenance.dedupNear(spark, dir, threshold = 0.7)
    assert(r2 == Maintenance.DedupNearResult(None, 0L, 0L, 0L))
  }

  test("threshold gates pairing: at 1.0 truncated copies no longer match") {
    val (input, _, _) = nearDupInput(91L)
    val dir = freshDir("graft-neardup-thr")
    EncodeJob.run(input, dir, cfg)
    // truncated-copy Jaccard < 1.0; only EXACT shingle-set equality survives
    val r = Maintenance.dedupNear(spark, dir, threshold = 1.0)
    assert(r.docsDeleted == 0L, s"got $r")
    intercept[IllegalArgumentException](Maintenance.dedupNear(spark, dir, threshold = 0.0))
  }

  test("CALL graft.system.dedup_near drives the same chain from SQL") {
    val (input, _, _) = nearDupInput(123L)
    val dir = freshDir("graft-neardup-sql")
    EncodeJob.run(input, dir, cfg)
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    val row = spark
      .sql(s"CALL graft.system.dedup_near(path => '$dir', threshold => 0.7D)")
      .head()
    assert(!row.isNullAt(0))
    assert(row.getLong(3) >= 2L) // docs_deleted
    // default-threshold call on the already-deduped dir is a no-op row
    val again = spark.sql(s"CALL graft.system.dedup_near(path => '$dir')").head()
    assert(again.isNullAt(0) && again.getLong(3) == 0L)
  }

  test("until_fixpoint iterates a salt-capped degenerate corpus to the fixpoint") {
    import spark.implicits._
    // 40 IDENTICAL docs: every signature lands in one LSH bucket, and a
    // maxBucket=8 salt cap splits it into 5 windows — pairs only form
    // WITHIN a window, so pass 1 keeps one doc per window (deletes 35),
    // pass 2 regroups the 5 survivors into one window (deletes 4), pass 3
    // finds nothing: the fixpoint in 3 passes, geometric shrink throughout
    val toks = Array.tabulate(64)(i => 10 + (i * 13) % 97)
    val input = spark.createDataset(
      (0 until 40).map(i => TokenRow(f"dup-$i%03d", toks, toks.length, "s"))
    )
    val dir = freshDir("graft-neardup-fix")
    EncodeJob.run(input, dir, cfg)

    val fix = Maintenance.dedupNearFixpoint(spark, dir, threshold = 0.7, maxBucket = 8)
    assert(fix.converged, s"did not converge: ${fix.passes.map(_.docsDeleted)}")
    assert(fix.docsDeleted == 39L, s"per-pass: ${fix.passes.map(_.docsDeleted)}")
    assert(fix.passes.map(_.docsDeleted) == Seq(35L, 4L, 0L), s"per-pass: ${fix.passes.map(_.docsDeleted)}")
    val kept = spark.read.format("graft").load(dir).select("doc_id").as[String].collect()
    assert(kept.toSeq == Seq("dup-000"))

    // the SQL face reports the per-pass trail on one row
    val dir2 = freshDir("graft-neardup-fix-sql")
    EncodeJob.run(input, dir2, cfg)
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    val row = spark
      .sql(s"CALL graft.system.dedup_near(path => '$dir2', max_bucket => 8, " +
        "until_fixpoint => true)")
      .head()
    assert(row.getAs[Long]("docs_deleted") == 39L)
    assert(row.getAs[Int]("passes") == 3)
    assert(row.getAs[String]("pass_deletes") == "35,4,0")
    assert(row.getAs[Boolean]("converged"))
  }
}
