package graft.pipeline

import graft.ops.XHash
import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[Maintenance.dedupExact]] — in-place exact corpus dedup as one
  * merge-on-read equality-delete snapshot, plus the
  * [[graft.functions.TokenFold]] content hash it keys on.
  */
class DedupExactSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 128, maxBlockValues = 32768)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Base corpus plus planted exact duplicates: one doc copied twice under
    * ids SMALLER than any base id (the keeper must be a copy), another
    * copied once under a LARGER id (the keeper stays the original).
    */
  private def dupInput(seed: Long) = {
    import spark.implicits._
    val base = TokenTables.synthetic(spark, 200L, seed = seed).collect()
    val a = base(3) // 'doc-...' ids; 'a...' sorts before, 'z...' after
    val b = base(7)
    val planted = Seq(
      a.copy(doc_id = s"aa-copy-1-${a.doc_id}"),
      a.copy(doc_id = s"aa-copy-2-${a.doc_id}"),
      b.copy(doc_id = s"zz-copy-${b.doc_id}")
    )
    spark.createDataset(base.toSeq ++ planted)
  }

  /** The spec's own keeper rule: min string doc_id per identical token seq. */
  private def expectedSurvivors(rows: Seq[TokenRow]): Set[String] =
    rows
      .groupBy(r => (r.tokens.toSeq, r.n_tok))
      .values
      .map(_.map(_.doc_id).min)
      .toSet

  test("token_fold matches the XHash reference chain, interpreted and codegen'd") {
    import spark.implicits._

    def reference(tokens: Array[Int], seed: Long): Long = {
      var h = XHash.mix62((XHash.FnvInit ^ seed) & XHash.Mask62)
      tokens.foreach(t => h = XHash.fnvStep(h, t.toLong & 0xffffffffL))
      XHash.mix62(h)
    }

    val cases = Seq(
      Array.empty[Int],
      Array(0),
      Array(1, 2, 3),
      Array(3, 2, 1), // order matters
      Array(-1, Int.MinValue, Int.MaxValue), // sign bits widen unsigned
      Array.tabulate(1000)(i => i * 31)
    )
    val df = spark
      .createDataset(cases.zipWithIndex.map { case (a, i) => (i, a) })
      .toDF("i", "tokens")
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("fold_in")
    val got = spark
      .sql("SELECT i, graft_token_fold(tokens) AS h0, graft_token_fold(tokens, 7) AS h7 FROM fold_in")
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    cases.zipWithIndex.foreach { case (a, i) =>
      assert(got(i) == (reference(a, 0L), reference(a, 7L)), s"case $i")
    }
    // distinct inputs hash apart (incl. the order/sign cases)
    assert(got.values.map(_._1).toSet.size == cases.length)
    // seeds decorrelate
    assert(got.values.forall { case (h0, h7) => h0 != h7 })
  }

  test("dedupExact deletes all but the min-doc_id copy per identical-token group") {
    val input = dupInput(21L)
    val rows = input.collect().toSeq
    val survivors = expectedSurvivors(rows)
    assert(rows.size - survivors.size >= 3, "fixture must plant losers")

    val dir = freshDir("graft-dedup")
    EncodeJob.run(input, dir, cfg)
    val preSnap = EncodeJob
      .loadSnapshots(dir, spark.sparkContext.hadoopConfiguration)
      .map(_._1)
      .max

    val r = Maintenance.dedupExact(spark, dir)
    assert(r.snapshotId.nonEmpty)
    assert(r.docsDeleted == rows.size - survivors.size)
    assert(r.dupGroups >= 2) // the two planted groups (plus any natural ones)

    val after = spark.read.format("graft").load(dir)
    assert(after.select("doc_id").collect().map(_.getString(0)).toSet == survivors)
    // the keeper-is-a-copy case really occurred
    assert(survivors.exists(_.startsWith("aa-copy-1-")))
    assert(!survivors.exists(_.startsWith("aa-copy-2-")))
    assert(!survivors.exists(_.startsWith("zz-copy-")))

    // pre-dedup time travel still shows every copy
    val asOf = spark.read.format("graft").option("snapshot", preSnap).load(dir)
    assert(asOf.count() == rows.size.toLong)

    // idempotent: a second run finds nothing and commits nothing
    val r2 = Maintenance.dedupExact(spark, dir)
    assert(r2 == Maintenance.DedupExactResult(None, 0L, 0L))
  }

  test("CALL graft.system.dedup_exact drives the same chain from SQL") {
    val input = dupInput(33L)
    val rows = input.collect().toSeq
    val survivors = expectedSurvivors(rows)

    val dir = freshDir("graft-dedup-sql")
    EncodeJob.run(input, dir, cfg)
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    val row = spark.sql(s"CALL graft.system.dedup_exact(path => '$dir')").head()
    assert(!row.isNullAt(0)) // snapshot committed
    assert(row.getLong(2) == rows.size - survivors.size)
    assert(
      spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) ==
        survivors.size.toLong
    )
    // and the no-op second call reports a null snapshot
    val again = spark.sql(s"CALL graft.system.dedup_exact(path => '$dir')").head()
    assert(again.isNullAt(0) && again.getLong(1) == 0L && again.getLong(2) == 0L)
  }
}
