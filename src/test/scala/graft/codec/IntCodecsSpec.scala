package graft.codec

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class IntCodecsSpec extends AnyFunSuite {

  def hash64(seed: Long, i: Long): Long = {
    var x = seed * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^= x >>> 31
    x
  }

  def singleRow(values: Array[Int]): Array[Int] = Array(0, values.length)

  val streams: Map[String, Array[Int]] = Map(
    "uniform16bit" -> Array.tabulate(5000)(i => (hash64(1, i.toLong) & 0xffffL).toInt),
    "lowcard" -> Array.tabulate(5000)(i => ((hash64(2, i.toLong) & 0x7L) * 1000L).toInt),
    "runs" -> Array.tabulate(5000)(i => (i / 100) % 7),
    "narrowrange" -> Array.tabulate(5000)(i => (1000000L + (hash64(3, i.toLong) & 0x3fL)).toInt),
    "constant" -> Array.fill(5000)(42),
    "empty" -> Array.emptyIntArray,
    "single" -> Array(7),
    "maxint" -> Array.tabulate(100)(i => if (i % 2 == 0) Int.MaxValue else 0),
    // strictly increasing with small gaps (a posting/offset/timestamp shape):
    // zigzag residuals are ~5 bits where the values need 17 — delta territory
    "monotone" -> {
      var acc = 0
      Array.tabulate(5000) { i => acc += (hash64(4, i.toLong) & 0xfL).toInt + 1; acc }
    }
  )

  val codecs: Seq[IntBlockCodec] =
    Seq(PlainCodec, BitPackCodec, ForCodec, RleCodec, DictCodec, DeltaCodec)

  test("every lightweight codec roundtrips every stream; estimate == actual bits") {
    for ((sname, values) <- streams; codec <- codecs) {
      val stats = BlockStats.compute(values, 0, values.length)
      val est = codec.estimateBits(stats)
      if (est != Long.MaxValue) {
        val w = new BitWriter()
        codec.encode(values, singleRow(values), w)
        assert(w.bitsWritten == est, s"${codec.name} on $sname: est=$est actual=${w.bitsWritten}")
        val r = new BitReader(w.toBytes)
        val out = codec.decode(r, values.length, singleRow(values))
        assert(out.sameElements(values), s"${codec.name} on $sname roundtrip")
      }
    }
  }

  test("hybrid codec roundtrips with row-reset contexts; exactBits == actual") {
    val nRows = 50
    val rowOffsets = new Array[Int](nRows + 1)
    val all = Array.newBuilder[Int]
    var off = 0
    for (rIdx <- 0 until nRows) {
      rowOffsets(rIdx) = off
      val len = (hash64(10, rIdx.toLong) & 0x7fL).toInt + 1
      for (i <- 0 until len) all += (hash64(11, rIdx * 1000L + i) & 0xffffffL).toInt
      off += len
    }
    rowOffsets(nRows) = off
    val values = all.result()

    val numContexts = 32
    val hist = new Histograms(numContexts, 256)
    for (rIdx <- 0 until nRows) {
      var last = 0L
      for (i <- rowOffsets(rIdx) until rowOffsets(rIdx + 1)) {
        hist.add(Hybrid.chooseContext(last, numContexts), values(i).toLong)
        last = values(i).toLong
      }
    }
    val tables = Huffman.buildTables(hist, 8)
    val hybrid = new HybridCodec(tables, numContexts)
    val w = new BitWriter()
    hybrid.encode(values, rowOffsets, w)
    assert(w.bitsWritten == hybrid.exactBits(values, rowOffsets))
    val out = hybrid.decode(new BitReader(w.toBytes), values.length, rowOffsets)
    assert(out.sameElements(values))
  }

  test("selector picks the distribution-appropriate codec") {
    def pick(values: Array[Int]): String =
      CodecSelector.select(values, singleRow(values), None)._1.name
    // constant stream: FOR with width 0 (39 bits) beats RLE's run headers
    assert(pick(streams("constant")) == "for")
    assert(pick(streams("runs")) == "rle")
    assert(pick(streams("lowcard")) == "dict")
    assert(pick(streams("narrowrange")) == "for")
    assert(pick(streams("uniform16bit")) == "bitpack")
    assert(pick(streams("monotone")) == "delta")
  }

  test("delta residual width: alternating 0/MaxValue needs 32 bits and roundtrips") {
    // the widest possible zigzag residual (2*MaxValue) must fit the 6-bit
    // width header and survive the Long zigzag round; 100 values = one
    // miniblock at width 32
    val values = streams("maxint")
    val stats = BlockStats.compute(values, 0, values.length)
    assert(DeltaCodec.estimateBits(stats) == 6L + values.length.toLong * 32)
    val w = new BitWriter()
    DeltaCodec.encode(values, singleRow(values), w)
    val out = DeltaCodec.decode(new BitReader(w.toBytes), values.length, singleRow(values))
    assert(out.sameElements(values))
  }

  test("delta-hybrid: entropy-coded residuals beat fixed-width delta on skewed gaps") {
    // multi-row stream of monotone values with ZIPF-skewed gaps (tiny gaps
    // common, jumps rare): fixed-width delta pays the group max width for
    // every value; the entropy coder prices gaps by frequency
    val nRows = 40
    val rowLen = 200
    val offsets = Array.tabulate(nRows + 1)(_ * rowLen)
    val values = new Array[Int](nRows * rowLen)
    for (r <- 0 until nRows) {
      var acc = (hash64(30L + r, 0L) & 0xffffL).toInt
      for (i <- 0 until rowLen) {
        val u = ((hash64(31L + r, i.toLong) >>> 11).toDouble / (1L << 53).toDouble) max 1e-12
        acc += math.min(100000.0, 1.0 / math.pow(u, 1.5)).toInt + 1
        values(r * rowLen + i) = acc
      }
    }
    val stats = BlockStats.compute(values, 0, values.length)
    val trial = DeltaHybrid.tryBuild(values, offsets, stats.deltaBits, stats.deltaBits)
    assert(trial.isDefined, "entropy residuals should beat fixed-width on skewed gaps")
    val (enc, bits) = trial.get
    // exactness: the trial's cost is the bits encode actually writes
    val w = new BitWriter()
    val rowBits = enc.encodeWithRowBits(values, offsets, w)
    assert(w.bitsWritten == bits, s"trial=$bits wrote=${w.bitsWritten}")
    // roundtrip through the stateless self-describing decoder
    val out = CodecSelector
      .decoderFor(IntCodecs.DeltaHybridId, None)
      .decode(new BitReader(w.toBytes), values.length, offsets)
    assert(out.sameElements(values))
    // per-row random access: seek straight to a middle row via row_bits
    val rows = new DeltaHybrid.RowReader(new BitReader(w.toBytes))
    var start = rows.dataStart
    for (r <- 0 until 17) start += rowBits(r)
    val row17 = rows.decodeRow(new BitReader(w.toBytes, start), rowLen)
    assert(row17.sameElements(values.slice(17 * rowLen, 18 * rowLen)))
  }

  test("delta-hybrid trial declines small blocks and hopeless gates") {
    val tiny = streams("monotone").take(DeltaHybrid.MinBlockValues - 1)
    val tinyStats = BlockStats.compute(tiny, 0, tiny.length)
    assert(DeltaHybrid.tryBuild(tiny, singleRow(tiny), tinyStats.deltaBits, Long.MaxValue / 2).isEmpty)
    // uniform random stream: residuals are as wide as the values, so even
    // when the gate lets the trial run, the exact cost loses to bitpack
    val rand = streams("uniform16bit")
    val s = BlockStats.compute(rand, 0, rand.length)
    assert(DeltaHybrid.tryBuild(rand, singleRow(rand), s.deltaBits, BitPackCodec.estimateBits(s)).isEmpty)
    // low-cardinality stream: dict is far below the fixed-width delta
    // estimate — the GATE itself rejects, skipping the entropy passes
    val lc = streams("lowcard")
    val ls = BlockStats.compute(lc, 0, lc.length)
    val dictBest = DictCodec.estimateBits(ls)
    assert(ls.deltaBits >= DeltaHybrid.GateFactor * dictBest)
    assert(DeltaHybrid.tryBuild(lc, singleRow(lc), ls.deltaBits, dictBest).isEmpty)
  }

  test("delta miniblocks localize an outlier jump to one group") {
    // 512 tiny-gap values with one huge jump at position 300: only the
    // group holding the jump pays the wide width — total stays near the
    // narrow-gap floor instead of 512 * 32 bits
    var acc = 0
    val values = Array.tabulate(512) { i =>
      acc += (if (i == 300) 1 << 29 else (hash64(5, i.toLong) & 0x7L).toInt + 1)
      acc
    }
    val stats = BlockStats.compute(values, 0, values.length)
    val est = DeltaCodec.estimateBits(stats)
    // 4 groups: three at width <= 5 (gaps <= 8 -> zigzag <= 16), one (the
    // jump's) at width 31
    assert(est <= 3 * (6 + 128 * 5) + (6 + 128 * 31), s"est=$est")
    assert(est > 512 * 3, s"est=$est implausibly small")
    val w = new BitWriter()
    DeltaCodec.encode(values, singleRow(values), w)
    assert(w.bitsWritten == est)
    assert(
      DeltaCodec
        .decode(new BitReader(w.toBytes), values.length, singleRow(values))
        .sameElements(values)
    )
  }

  test("selector includes hybrid and prefers it on skewed streams") {
    val values = Array.tabulate(20000) { i =>
      val u = ((hash64(20, i.toLong) >>> 11).toDouble / (1L << 53).toDouble) max 1e-12
      math.min(Int.MaxValue.toLong, (1.0 / math.pow(u, 2.0)).toLong).toInt
    }
    val rowOffsets = singleRow(values)
    val numContexts = 32
    val hist = new Histograms(numContexts, 256)
    var last = 0L
    values.foreach { v => hist.add(Hybrid.chooseContext(last, numContexts), v.toLong); last = v.toLong }
    val hybrid = new HybridCodec(Huffman.buildTables(hist, 8), numContexts)
    val (codec, bits) = CodecSelector.select(values, rowOffsets, Some(hybrid))
    assert(codec.name == "hybrid", s"picked ${codec.name}")
    // skewed stream: entropy coding beats fixed-width by a wide margin
    val (bp, bpBits) = (BitPackCodec, BitPackCodec.estimateBits(BlockStats.compute(values, 0, values.length)))
    assert(bits < bpBits / 2, s"hybrid $bits vs bitpack $bpBits")
    // selection is truthful: encode then decode back
    val w = new BitWriter()
    codec.encode(values, rowOffsets, w)
    assert(w.bitsWritten == bits)
    assert(codec.decode(new BitReader(w.toBytes), values.length, rowOffsets).sameElements(values))
  }

  test("BlockStats counts runs and distincts correctly") {
    val s = BlockStats.compute(Array(5, 5, 5, 2, 2, 9), 0, 6)
    assert(s.nRuns == 3)
    assert(s.maxRunLen == 3)
    assert(s.distinct == 3)
    assert(s.distinctValues.sameElements(Array(2, 5, 9)))
    assert(s.min == 2 && s.max == 9)
    // zigzag chain from 0: +5 -> 10, 0, 0, -3 -> 5, 0, +7 -> 14; one
    // group of 6 values at width 4 => 6 + 6*4
    assert(s.deltaBits == 30L)
  }

  test("fused exactBitsAndStats equals the separate stats + exactBits passes") {
    // the selection hot path must stay equivalent to the reference
    // implementations it fuses, across every stream shape and both
    // context-model dispatch paths, with multi-row offset layouts
    val nCtx = 16
    for ((name, values) <- streams if values.nonEmpty) {
      val offsets =
        if (values.length < 10) singleRow(values)
        else Array(0, values.length / 3, values.length / 2, values.length)
      for (model <- Seq[ContextModel](new SimpleContextModel(nCtx), new ConstantContextModel)) {
        val hist = new Histograms(nCtx, 256)
        var row = 0
        while (row < offsets.length - 1) {
          var ctx = model.first(offsets(row + 1) - offsets(row))
          var i = offsets(row)
          while (i < offsets(row + 1)) {
            hist.add(ctx, values(i).toLong); ctx = model.next(values(i).toLong); i += 1
          }
          row += 1
        }
        val tables = Huffman.buildTables(hist, 8)
        val h = new HybridCodec(tables, model)
        val (fusedStats, fusedBits) = h.exactBitsAndStats(values, offsets)
        val sepStats = BlockStats.compute(values, 0, values.length)
        val sepBits = h.exactBits(values, offsets)
        assert(fusedBits == sepBits, s"$name/${model.name}: bits")
        assert(fusedStats == sepStats.copy(distinctValues = fusedStats.distinctValues),
          s"$name/${model.name}: stats scalar fields")
        assert(fusedStats.distinctValues.sameElements(sepStats.distinctValues),
          s"$name/${model.name}: distinct values")
      }
    }
  }

  test("decoderFor dispatches all ids") {
    for (c <- codecs)
      assert(CodecSelector.decoderFor(c.id, None).name == c.name)
    intercept[IllegalStateException] {
      CodecSelector.decoderFor(IntCodecs.HybridId, None)
    }
  }

  test("DictCodec.Bound writes the byte-identical payload of DictCodec") {
    for (seed <- 1 to 8) {
      val card = 1 + (hash64(seed.toLong, 0L) & 0xffL).toInt * 16 // 1..4081
      val values = Array.tabulate(5000) { i =>
        ((hash64(seed.toLong, i.toLong) % card + card) % card).toInt * 37
      }
      val stats = BlockStats.compute(values, 0, values.length)
      assert(stats.distinct <= BlockStats.DictCap)
      val offsets = singleRow(values)
      val wRef = new BitWriter(256)
      DictCodec.encode(values, offsets, wRef)
      val wBound = new BitWriter(256)
      new DictCodec.Bound(stats.distinctValues).encode(values, offsets, wBound)
      assert(wBound.toBytes.sameElements(wRef.toBytes), s"seed $seed: payload mismatch")
      assert(wBound.bitsWritten == wRef.bitsWritten)
      // and when dict wins selection, select() hands back the Bound variant
      val (picked, bits) = CodecSelector.select(values, offsets, None)
      if (picked.name == "dict") {
        assert(picked.isInstanceOf[DictCodec.Bound])
        assert(bits == DictCodec.estimateBits(stats))
      }
    }
    // a stream where dict certainly wins (low card, wide values)
    locally {
      val values = Array.tabulate(5000)(i => ((hash64(99L, i.toLong) & 0x7L) * 1000001L).toInt)
      val (picked, _) = CodecSelector.select(values, singleRow(values), None)
      assert(picked.name == "dict" && picked.isInstanceOf[DictCodec.Bound])
    }
  }
}
