package graft.pipeline

import graft.core._
import graft.pipeline.GraftPipeline.Config
import org.scalatest.funsuite.AnyFunSuite

class ContextModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("model context assignments match the reference layouts") {
    val simple = ContextModel("simple", 32)
    assert(simple.first(100) == 0)
    assert(simple.next(0L) == 0 && simple.next(5L) == 5)
    assert(simple.next(1L << 40) == 31) // clamped

    val single = ContextModel("single", 1)
    assert(single.first(7) == 0 && single.next(999L) == 0)

    val z = ContextModel("zuckerli", 48)
    // first value: keyed by token(row length), 16 contexts
    assert(z.first(1) == 1 && z.first(15) == 15)
    assert(z.first(100000) == 15) // clamped to NUM_FIRST-1
    // rest: 16 + token(prev) clamped to 32 contexts
    assert(z.next(0L) == 16 && z.next(7L) == 23)
    assert(z.next(1L << 50) == 16 + 31)

    intercept[IllegalArgumentException](ContextModel("zuckerli", 32)) // too few
    intercept[IllegalArgumentException](ContextModel("bogus", 64))
  }

  lazy val input = TokenTables.synthetic(spark, 1200L, seed = 7L).cache()

  def roundtripBits(cfg: Config): Long = {
    import spark.implicits._
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfg), cfg)
    )
    val blocks = GraftPipeline.encode(input, tables, cfg).cache()
    val decoded = GraftPipeline.decode(blocks, tables, cfg)
    assert(GraftPipeline.verify(input, decoded) == 0L, s"model ${cfg.contextModel} not lossless")
    val bits = blocks.map(_.payload_bits).reduce(_ + _)
    blocks.unpersist()
    bits
  }

  test("all context models roundtrip losslessly; richer models do not explode size") {
    val single = roundtripBits(Config(numContexts = 1, numBins = 8, contextModel = "single"))
    val simple = roundtripBits(Config(numContexts = 64, numBins = 8, contextModel = "simple"))
    val zuck = roundtripBits(
      Config(numContexts = ZuckerliContextModel.NumContexts, numBins = 8, contextModel = "zuckerli")
    )
    info(s"payload bits: single=$single simple=$simple zuckerli=$zuck")
    // context modelling must help vs a single shared table on this corpus
    assert(simple < single, s"simple $simple !< single $single")
    assert(zuck < single, s"zuckerli $zuck !< single $single")
    // golden pins (seed-7 corpus): deliberate-update-only, like the default
    // model's pin in GraftPipelineSpec — drift means the bit format or the
    // context assignment changed
    // single dropped 1535372 -> 1495660 when delta-hybrid joined selection
    // (r4): the 1-context hybrid is weak enough that entropy-coded
    // residuals win extra blocks; zuckerli's pin is unchanged.
    assert(single == 1495660L, s"single-model bits drifted: $single")
    assert(zuck == 1408492L, s"zuckerli-model bits drifted: $zuck")
  }

  test("zuckerli-encoded blocks support per-row random access (bit-offset seek)") {
    import spark.implicits._
    val cfg = Config(
      numContexts = ZuckerliContextModel.NumContexts,
      numBins = 8,
      contextModel = "zuckerli",
      autoSelect = false // force hybrid so the row-seek path is exercised
    )
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfg), cfg)
    )
    val blocks = GraftPipeline.encode(input, tables, cfg).cache()
    assert(blocks.map(_.codec).distinct().collect().toSet == Set("hybrid"))
    assert(blocks.map(_.row_bits_codec).filter(_ == "none").count() == 0L)
    val wanted = input.map(_.doc_id).collect().sorted.zipWithIndex
      .collect { case (id, i) if i % 37 == 0 => id }.toSet
    val got = GraftPipeline.lookupDocs(blocks, wanted, tables, cfg).collect()
    assert(got.map(_.doc_id).toSet == wanted)
    val expected = input.filter(r => wanted.contains(r.doc_id)).collect()
      .map(r => r.doc_id -> r.tokens.toSeq).toMap
    got.foreach(r => assert(r.tokens.toSeq == expected(r.doc_id)))
    blocks.unpersist()
  }

  test("O23 sequential sink: numBins=1 single-partition encode matches parallel decode") {
    import spark.implicits._
    val cfg = Config(numContexts = 32, numBins = 1, maxBlockRows = 128, maxBlockValues = 32768)
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfg), cfg)
    )
    val blocks = GraftPipeline.encode(input, tables, cfg).cache()
    // one bin, contiguous block sequence — the ordered single-stream shape
    assert(blocks.map(_.bin).distinct().collect().toSeq == Seq(0))
    val seqs = blocks.map(_.block_seq).collect().sorted.toSeq
    assert(seqs == seqs.indices.toSeq, "block_seq not contiguous from 0")
    assert(GraftPipeline.verify(input, GraftPipeline.decode(blocks, tables, cfg)) == 0L)
    blocks.unpersist()
  }

  test("embedded table headers make blocks self-describing (decode with no job tables)") {
    import spark.implicits._
    val cfg = Config(numContexts = 32, numBins = 8, embedTables = true)
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfg), cfg)
    )
    val blocks = GraftPipeline.encode(input, tables, cfg).cache()
    val hybridBlocks = blocks.filter(_.codec == "hybrid")
    assert(hybridBlocks.count() > 0)
    assert(hybridBlocks.filter(!_.embedded_tables).count() == 0L)
    // standalone decode: no broadcast tables anywhere
    val decoded = GraftPipeline.decodeSelfDescribing(blocks, cfg)
    assert(GraftPipeline.verify(input, decoded) == 0L)
    // the tables-present paths also handle embedded blocks (skip the header)
    assert(GraftPipeline.verify(input, GraftPipeline.decode(blocks, tables, cfg)) == 0L)
    val wanted = input.map(_.doc_id).collect().sorted.take(5).toSet
    val got = GraftPipeline.lookupDocs(blocks, wanted, tables, cfg).collect()
    assert(got.map(_.doc_id).toSet == wanted)
    blocks.unpersist()
  }

  test("measureStats covers the whole corpus independent of block routing") {
    import spark.implicits._
    // same tables (analyze ignores autoSelect); one corpus routed by
    // auto-selection, one forced all-hybrid — the per-context accounting
    // must be identical: counts/raw bits are pure functions of the values,
    // code bits come from the shared tables either way (measured on hybrid
    // blocks, cost-model-charged on lightweight ones)
    val cfgAuto = Config(numContexts = 64, numBins = 8, maxBlockRows = 64, maxBlockValues = 16384)
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfgAuto), cfgAuto)
    )
    val auto = GraftPipeline.encode(input, tables, cfgAuto).cache()
    val hybridOnly = GraftPipeline.encode(input, tables, cfgAuto.copy(autoSelect = false)).cache()
    // the premise: auto-selection actually routed some blocks away
    assert(auto.filter(_.codec != "hybrid").count() > 0, "corpus not mixed — test is vacuous")
    val sAuto = GraftPipeline.measureStats(auto, tables, cfgAuto).collect().sortBy(_._1)
    val sHyb = GraftPipeline.measureStats(hybridOnly, tables, cfgAuto).collect().sortBy(_._1)
    assert(sAuto.toSeq == sHyb.toSeq)
    auto.unpersist(); hybridOnly.unpersist()
  }

  test("measureStats bit accounting reconciles exactly with payload bits") {
    import spark.implicits._
    val cfg = Config(numContexts = 64, numBins = 8, autoSelect = false)
    val tables = spark.sparkContext.broadcast(
      GraftPipeline.buildTables(GraftPipeline.analyze(input, cfg), cfg)
    )
    val blocks = GraftPipeline.encode(input, tables, cfg).cache()
    val stats = GraftPipeline.measureStats(blocks, tables, cfg).collect()
    val nValues = stats.map(_._2).sum
    val codeBits = stats.map(_._3).sum
    val rawBits = stats.map(_._4).sum
    assert(nValues == blocks.map(_.n_values).reduce(_ + _))
    assert(codeBits + rawBits == blocks.map(_.payload_bits).reduce(_ + _),
      s"code=$codeBits raw=$rawBits != payload")
    assert(stats.forall { case (_, n, cb, _) => cb >= n }) // >=1 code bit per value
    blocks.unpersist()
  }
}
