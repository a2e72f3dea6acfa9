package graft.pipeline

import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[Maintenance.decontaminate]] — the eval-set screen composed with the
  * equality-delete commit, and its SQL procedure face.
  */
class DecontaminateVerbSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 128, maxBlockValues = 32768)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Corpus with a planted eval 4-gram in known docs: two docs get the
    * sequence [71001, 71002, 71003, 71004] spliced in (one mid-doc, one at
    * the tail); the eval set holds that sequence inside a longer row.
    */
  private def fixture(seed: Long) = {
    import spark.implicits._
    val base = TokenTables.synthetic(spark, 120L, seed = seed).collect()
    val gram = Array(71001, 71002, 71003, 71004)
    val c0 = base(5)
    val c1 = base(9)
    val contaminated = Seq(
      c0.copy(
        doc_id = s"hit-mid-${c0.doc_id}",
        tokens = c0.tokens.take(3) ++ gram ++ c0.tokens.drop(3),
        n_tok = c0.n_tok + 4
      ),
      c1.copy(
        doc_id = s"hit-tail-${c1.doc_id}",
        tokens = c1.tokens ++ gram,
        n_tok = c1.n_tok + 4
      )
    )
    val evalRows = Seq((1L, Array(900001, 900002) ++ gram ++ Array(900003)))
    val eval = spark.createDataset(evalRows).toDF("eval_id", "tokens")
    (spark.createDataset(base.toSeq ++ contaminated), eval,
      contaminated.map(_.doc_id).toSet)
  }

  test("review mode flags without committing; delete mode removes exactly the hits") {
    val (input, eval, hitIds) = fixture(203L)
    val dir = freshDir("graft-decon")
    EncodeJob.run(input, dir, cfg)
    val total = input.count()

    val review = Maintenance.decontaminate(spark, dir, eval, n = 4, delete = false)
    assert(review == Maintenance.DecontaminateResult(None, hitIds.size.toLong, 0L))
    assert(spark.read.format("graft").load(dir).count() == total)

    val applied = Maintenance.decontaminate(spark, dir, eval, n = 4, delete = true)
    assert(applied.snapshotId.nonEmpty)
    assert(applied.docsFlagged == hitIds.size.toLong)
    assert(applied.docsDeleted == hitIds.size.toLong)
    val kept = spark.read.format("graft").load(dir)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert((kept & hitIds).isEmpty)
    assert(kept.size.toLong == total - hitIds.size)

    // clean corpus: nothing flagged, nothing committed
    val again = Maintenance.decontaminate(spark, dir, eval, n = 4, delete = true)
    assert(again == Maintenance.DecontaminateResult(None, 0L, 0L))
  }

  test("CALL graft.system.decontaminate drives the same chain from SQL") {
    val (input, eval, hitIds) = fixture(407L)
    val dir = freshDir("graft-decon-sql")
    EncodeJob.run(input, dir, cfg)
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    eval.createOrReplaceTempView("decon_eval")

    val review = spark
      .sql(s"CALL graft.system.decontaminate(path => '$dir', eval_view => 'decon_eval')")
      .head()
    assert(review.isNullAt(0) && review.getLong(1) == hitIds.size.toLong && review.getLong(2) == 0L)

    val applied = spark
      .sql(s"CALL graft.system.decontaminate(path => '$dir', eval_view => 'decon_eval', delete => true)")
      .head()
    assert(!applied.isNullAt(0) && applied.getLong(2) == hitIds.size.toLong)
    assert(
      spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) ==
        input.count() - hitIds.size
    )
  }
}
