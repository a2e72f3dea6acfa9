package graft.functions

import graft.core.Hybrid
import graft.pipeline.{GraftPipeline, SparkTestBase, TokenTables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class HieTokenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("hie_token matches Hybrid.token on boundary and random values") {
    import spark.implicits._
    val values =
      (0L to 40L) ++ Seq(15L, 16L, 17L, 255L, 256L, 65535L, 1L << 20, Int.MaxValue.toLong, 17179902313L)
    val extra = (0 until 2000).map(i => math.abs(TokenTables.mix64(5L ^ i.toLong)) >>> 20)
    val df = (values ++ extra).toDF("v")
    val got = df
      .select($"v", HieToken.hie_token($"v").as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    got.foreach { case (v, t) => assert(t == Hybrid.token(v), s"v=$v") }
  }

  test("hie_token participates in whole-stage codegen") {
    import spark.implicits._
    val df = spark.range(100).select(HieToken.hie_token($"id").as("t"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage;
    // a CodegenFallback expression would force a non-starred Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // and the generated code actually runs (no CodegenFallback)
    assert(df.agg(sum($"t")).head().getLong(0) > 0)
  }

  test("scan for analyze is column-pruned to tokens only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-plan").toString
    TokenTables.synthetic(spark, 100L).write.parquet(s"$dir/t")
    val ds = spark.read.parquet(s"$dir/t").as[graft.pipeline.TokenRow]
    val scan = ds.select($"tokens").queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && scan.contains("tokens"), scan)
    assert(!scan.matches("(?s).*ReadSchema:[^\\n]*doc_id.*"), s"doc_id not pruned:\n$scan")
  }

  test("blocks lookup filter is pushed down to the parquet scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-push").toString
    val cfg = GraftPipeline.Config(numContexts = 8, numBins = 8)
    val input = TokenTables.synthetic(spark, 300L)
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfg), cfg)
    )
    GraftPipeline.encode(input, tables, cfg).write.parquet(s"$dir/blocks")
    val blocks = spark.read.parquet(s"$dir/blocks").as[graft.pipeline.EncodedBlock]
    val filtered = blocks.filter($"bin".isInCollection(Seq(1, 3)))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(bin"), plan)
  }
}
