package graft.sources

import graft.pipeline.GraftPipeline.Config
import graft.pipeline.{EncodeJob, GraftPipeline, SparkTestBase, TokenTables}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The DSv2 read surface: `spark.read.format("graft").load(outDir)` over an
  * EncodeJob output — roundtrip equality, column pruning (metadata queries
  * never run the entropy decoder), doc_id filter pushdown with bin pruning
  * and per-row bit-seek, all observed through the scan's DSv2 custom metrics.
  */
class GraftSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  lazy val input = TokenTables.synthetic(spark, 700L, seed = 11L).cache()

  // dir A: production defaults (auto-select, external tables)
  lazy val dirA: String = {
    val d = Files.createTempDirectory("graft-src-a").toString
    EncodeJob.run(input, d, Config(numContexts = 16, numBins = 8, maxBlockRows = 64))
    d
  }
  // dir B: pure hybrid + embedded headers — every block has a row-bit index,
  // so point reads must decode EXACTLY the hit rows' token values
  lazy val dirB: String = {
    val d = Files.createTempDirectory("graft-src-b").toString
    EncodeJob.run(
      input, d,
      Config(numContexts = 16, numBins = 8, maxBlockRows = 64, autoSelect = false, embedTables = true)
    )
    d
  }

  private def findScan(plan: SparkPlan): BatchScanExec = {
    def rec(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec                                  => rec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => rec(q.plan)
      case b: BatchScanExec                                          => Seq(b)
      case other                                                     => other.children.flatMap(rec)
    }
    rec(plan).headOption.getOrElse(fail(s"no BatchScanExec in:\n$plan"))
  }

  private def metric(scan: BatchScanExec, name: String): Long =
    scan.metrics.collectFirst { case (k, m) if k == name => m.value }
      .getOrElse(fail(s"metric $name absent; have ${scan.metrics.keys.mkString(",")}"))

  test("roundtrip: format(\"graft\") returns the source corpus exactly") {
    import spark.implicits._
    val decoded = spark.read.format("graft").load(dirA).as[graft.pipeline.TokenRow]
    assert(GraftPipeline.verify(input, decoded) == 0L)
  }

  test("roundtrip through embedded-header, pure-hybrid blocks") {
    import spark.implicits._
    val decoded = spark.read.format("graft").load(dirB).as[graft.pipeline.TokenRow]
    assert(GraftPipeline.verify(input, decoded) == 0L)
  }

  test("driver-side binOf matches the write path's binCol expression") {
    import spark.implicits._
    val rows = input
      .select($"doc_id", GraftPipeline.binCol(8, 0x5eedL).as("bin"))
      .collect()
    rows.foreach { r =>
      assert(GraftDataSource.binOf(r.getString(0), 8, 0x5eedL) == r.getInt(1), r.getString(0))
    }
  }

  test("metadata-only query never runs the entropy decoder") {
    import spark.implicits._
    val df = spark.read.format("graft").load(dirA).groupBy($"source").agg(sum($"n_tok").as("t"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = input
      .groupBy($"source")
      .agg(sum($"n_tok"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == want)
    val scan = findScan(df.queryExecution.executedPlan)
    assert(metric(scan, GraftMetrics.TokenValuesDecoded) == 0L)
    assert(metric(scan, GraftMetrics.RowsEmitted) == input.count())
    // and the scan itself advertises the pruned read schema
    assert(scan.toString.contains("readSchema=[n_tok,source]")
      || scan.toString.contains("readSchema=[source,n_tok]"))
  }

  test("doc_id filter: bin pruning + per-row seek decode exactly the hit rows") {
    import spark.implicits._
    val ids = input.select($"doc_id", $"n_tok").take(3).map(r => r.getString(0) -> r.getInt(1))
    val wantTokens = ids.map(_._2.toLong).sum
    val df = spark.read
      .format("graft")
      .load(dirB)
      .where($"doc_id".isin(ids.map(_._1): _*))
      .as[graft.pipeline.TokenRow]
    val rows = df.collect()
    assert(rows.length == 3)
    val byId = input.where($"doc_id".isin(ids.map(_._1): _*)).as[graft.pipeline.TokenRow]
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    rows.foreach(r => assert(r.tokens.toSeq == byId(r.doc_id), r.doc_id))

    val scan = findScan(df.queryExecution.executedPlan)
    // pure-hybrid blocks with a row-bit index: ONLY the 3 hit rows' values decoded
    assert(metric(scan, GraftMetrics.TokenValuesDecoded) == wantTokens)
    // bin predicate reached parquet: at most the wanted bins' blocks were read
    val totalBlocks = EncodeJob.readBlocks(spark, dirB).count()
    assert(metric(scan, GraftMetrics.BlocksDecoded) < totalBlocks)
    assert(scan.toString.contains("prunedBins="))
  }

  test("source filter is honored (and residual-checked by Catalyst)") {
    import spark.implicits._
    val src = input.select($"source").head().getString(0)
    val got = spark.read.format("graft").load(dirA).where($"source" === src).count()
    assert(got == input.where($"source" === src).count())
  }

  test("SQL over a graft view: join decoded rows against a derived table") {
    import spark.implicits._
    spark.read.format("graft").load(dirA).createOrReplaceTempView("graft_corpus")
    val n = spark
      .sql("""SELECT count(*) FROM graft_corpus g
              WHERE size(g.tokens) = g.n_tok""")
      .head()
      .getLong(0)
    assert(n == input.count())
  }

  test("load of a non-encode dir fails loudly") {
    val bogus = Files.createTempDirectory("graft-bogus").toString
    val e = intercept[Exception] {
      spark.read.format("graft").load(bogus).collect()
    }
    assert(e.getMessage != null)
  }
}
