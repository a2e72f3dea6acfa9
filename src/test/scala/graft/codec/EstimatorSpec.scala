package graft.codec

import graft.core.{Histograms, Hybrid}
import graft.pipeline.{GraftPipeline, SparkTestBase, TokenTables}
import graft.pipeline.GraftPipeline.Config
import org.scalatest.funsuite.AnyFunSuite

class EstimatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("estimator trio matches the reference cost shapes") {
    assert(FixedEstimator.bits(0, 12345L) == 1L)
    // Log2: ilog2(v + 2)
    assert(Log2Estimator.bits(0, 0L) == 1L) // ilog2(2)
    assert(Log2Estimator.bits(0, 2L) == 2L) // ilog2(4)
    assert(Log2Estimator.bits(0, 1000L) == 9L) // ilog2(1002)
    // Huffman estimator: cost-model code bits + raw mantissa bits
    val hist = new Histograms(1, 256)
    (0 until 1000).foreach(_ => hist.add(0, 3L)) // 3 dominates
    (0 until 10).foreach(_ => hist.add(0, 200L))
    val est = new HuffmanCostEstimator(hist.costModel)
    val cheap = est.bits(0, 3L)
    val dear = est.bits(0, 200L)
    assert(cheap < dear, s"frequent $cheap !< rare $dear")
    assert(dear >= Hybrid.tokenNBits(Hybrid.token(200L)), "raw bits included")
  }

  test("estimated rounds build lossless tables without writing bits") {
    import spark.implicits._
    val cfg = Config(numContexts = 64, numBins = 8)
    val input = TokenTables.synthetic(spark, 1500L, seed = 11L).cache()
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.analyzeRoundsEstimated(input, cfg, rounds = 2)
    )
    val blocks = GraftPipeline.encode(input, tables, cfg).cache()
    val decoded = GraftPipeline.decode(blocks, tables, cfg)
    assert(GraftPipeline.verify(input, decoded) == 0L)
    // estimated tables still compress well vs the raw baseline
    val bits = blocks.map(_.payload_bits).reduce(_ + _)
    val raw = blocks.map(_.n_values * 32L).reduce(_ + _)
    assert(bits < raw / 2, s"bits=$bits raw=$raw")
    // and land near the exact-round tables (within 10%)
    val exactTables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfg), cfg)
    )
    val exactBits = GraftPipeline.encode(input, exactTables, cfg)
      .map(_.payload_bits).reduce(_ + _)
    assert(bits <= exactBits * 1.10, s"estimated $bits vs exact $exactBits")
    info(s"estimated-round tables: $bits bits; full-analyze tables: $exactBits bits")
    blocks.unpersist(); input.unpersist()
  }

  test("fixed-estimator bootstrap also yields lossless tables (reference parity)") {
    import spark.implicits._
    val cfg = Config(numContexts = 32, numBins = 8)
    val input = TokenTables.synthetic(spark, 600L, seed = 23L)
    // the reference compresses with FixedEstimator too
    // (tests/test_compression.rs:170-176) — a cruder prior, same contract
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.analyzeRoundsEstimated(input, cfg, rounds = 2, bootstrap = FixedEstimator)
    )
    val blocks = GraftPipeline.encode(input, tables, cfg)
    assert(GraftPipeline.verify(input, GraftPipeline.decode(blocks, tables, cfg)) == 0L)
  }
}
