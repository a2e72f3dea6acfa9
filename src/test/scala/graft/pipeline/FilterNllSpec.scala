package graft.pipeline

import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[Maintenance.filterNll]] — the compression-cost quality screen composed
  * with the equality-delete commit, and its SQL procedure face.
  */
class FilterNllSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 128, maxBlockValues = 32768)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Base corpus plus one LOW-tail plant (the corpus's most frequent token
    * repeated — compresses absurdly well) and one HIGH-tail plant (~2^30
    * values — raw mantissa bits blow the budget). The band is derived from
    * the BASE docs' scores computed with the verb's own cost chain, so the
    * fixture is self-validating.
    */
  private def fixture(seed: Long) = {
    import spark.implicits._
    val base = TokenTables.synthetic(spark, 150L, seed = seed).collect()
    val topToken = base
      .flatMap(_.tokens)
      .groupBy(identity)
      .view
      .mapValues(_.length)
      .maxBy { case (v, n) => (n, -v) }
      ._1
    val plants = Seq(
      TokenRow("low-plant", Array.fill(100)(topToken), 100, "web"),
      TokenRow("high-plant", Array.tabulate(100)(i => (1 << 30) + i * 7), 100, "web")
    )
    val input = spark.createDataset(base.toSeq ++ plants)

    // the verb's own scoring chain, replayed locally for the band
    val cfg1 = GraftPipeline.Config(numContexts = 1, maxBits = graft.core.Hybrid.DefaultMaxBits)
    val costs = GraftPipeline.analyze(input, cfg1).costModel(0)
    val scores = graft.ops.Scoring
      .unigramLogLoss(input.toDF, costs, $"tokens")
      .select($"doc_id", $"bpt_ppm")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val baseScores = base.map(r => scores(r.doc_id))
    val (lo, hi) = (baseScores.min, baseScores.max)
    require(scores("low-plant") < lo, s"low plant ${scores("low-plant")} not below base min $lo")
    require(scores("high-plant") > hi, s"high plant ${scores("high-plant")} not above base max $hi")
    (input, lo, hi)
  }

  test("review mode flags both tails without committing; delete removes exactly them") {
    val (input, lo, hi) = fixture(311L)
    val dir = freshDir("graft-nll")
    EncodeJob.run(input, dir, cfg)
    val total = input.count()

    val review = Maintenance.filterNll(spark, dir, lo, hi, delete = false)
    assert(review == Maintenance.FilterNllResult(None, 2L, 1L, 1L, 0L))
    assert(spark.read.format("graft").load(dir).count() == total)

    val applied = Maintenance.filterNll(spark, dir, lo, hi, delete = true)
    assert(applied.snapshotId.nonEmpty && applied.docsDeleted == 2L)
    val kept = spark.read.format("graft").load(dir)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(!kept.contains("low-plant") && !kept.contains("high-plant"))
    assert(kept.size.toLong == total - 2)

    // post-delete the cost table shifts (the plants' tokens left the
    // histogram), so re-checking the EXACT band would be asserting on
    // noise — a wide band must flag nothing and commit nothing, and a
    // backwards band is refused loudly
    val again = Maintenance.filterNll(spark, dir, 0L, Long.MaxValue / 2, delete = true)
    assert(again.docsFlagged == 0L && again.snapshotId.isEmpty)
    intercept[IllegalArgumentException](Maintenance.filterNll(spark, dir, 10L, 5L))
  }

  test("CALL graft.system.filter_nll drives the same chain from SQL") {
    val (input, lo, hi) = fixture(421L)
    val dir = freshDir("graft-nll-sql")
    EncodeJob.run(input, dir, cfg)
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    val review = spark
      .sql(s"CALL graft.system.filter_nll(path => '$dir', min_bpt_ppm => $lo, max_bpt_ppm => $hi)")
      .head()
    assert(review.isNullAt(0) && review.getLong(1) == 2L)
    val applied = spark
      .sql(s"CALL graft.system.filter_nll(path => '$dir', min_bpt_ppm => $lo, max_bpt_ppm => $hi, delete => true)")
      .head()
    assert(!applied.isNullAt(0) && applied.getLong(4) == 2L)
    assert(
      spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) == input.count() - 2
    )
  }
}
