package graft.tools

import graft.codec.{CodecSelector, HybridCodec}
import graft.core._

/** Pure-JVM micro-benchmark of the hybrid kernel (no Spark): isolates
  * exactBits / encode / decode throughput from scan+shuffle noise.
  */
object KernelBench {

  /** Single-thread hybrid kernel throughput on the zipf shape:
    * (encode Mtok/s, decode Mtok/s), best of `reps`. Host-noise-resistant
    * evidence of codec speed, independent of Spark scheduling.
    */
  def measure(nRows: Int = 2048, rowLen: Int = 512, reps: Int = 10): (Double, Double) =
    measureModel(new SimpleContextModel(64), nRows, rowLen, reps)

  /** Same protocol under an arbitrary context model — one bench row per
    * model quantifies the virtual-dispatch tax of the non-inlined paths
    * (zuckerli/single) against the inlined simple-model loops.
    */
  def measureModel(
      model: ContextModel,
      nRows: Int = 2048,
      rowLen: Int = 512,
      reps: Int = 10
  ): (Double, Double) = {
    val nCtx = model.minContexts
    val n = nRows * rowLen
    val values = new Array[Int](n)
    var i = 0
    while (i < n) {
      values(i) = graft.pipeline.TokenTables.zipfToken(42L, i / rowLen, i % rowLen, 1000000000L)
      i += 1
    }
    val rowOffsets = Array.tabulate(nRows + 1)(_ * rowLen)
    val hist = new Histograms(nCtx, 256)
    var row = 0
    while (row < nRows) {
      var ctx = model.first(rowLen)
      var k = rowOffsets(row)
      while (k < rowOffsets(row + 1)) {
        hist.add(ctx, values(k).toLong); ctx = model.next(values(k).toLong); k += 1
      }
      row += 1
    }
    val tables = Huffman.buildTables(hist, 8)
    val hybrid = new HybridCodec(tables, model)
    var encBest = Double.MaxValue
    var sink = 0L
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      val w = new BitWriter(n / 2)
      hybrid.encode(values, rowOffsets, w)
      sink ^= w.bitsWritten
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < encBest) encBest = dt
    }
    val w = new BitWriter(n / 2)
    hybrid.encode(values, rowOffsets, w)
    val payload = w.toBytes
    var decBest = Double.MaxValue
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      sink ^= hybrid.decode(new BitReader(payload), n, rowOffsets).length.toLong
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < decBest) decBest = dt
    }
    if (sink == Long.MinValue) println(sink) // keep the work alive
    (n / encBest / 1e6, n / decBest / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toInt else 4096
    val rowLen = if (args.length > 1) args(1).toInt else 512
    val reps = if (args.length > 2) args(2).toInt else 30
    val nCtx = 64

    // zipf-ish values (the dominant bench shape)
    val n = nRows * rowLen
    val values = new Array[Int](n)
    var i = 0
    while (i < n) {
      val x = graft.pipeline.TokenTables.zipfToken(42L, i / rowLen, i % rowLen, 1000000000L)
      values(i) = x
      i += 1
    }
    val rowOffsets = Array.tabulate(nRows + 1)(_ * rowLen)

    val model = new SimpleContextModel(nCtx)
    val hist = new Histograms(nCtx, 256)
    var row = 0
    while (row < nRows) {
      var ctx = model.first(rowLen)
      var k = rowOffsets(row)
      while (k < rowOffsets(row + 1)) {
        hist.add(ctx, values(k).toLong); ctx = model.next(values(k).toLong); k += 1
      }
      row += 1
    }
    val tables = Huffman.buildTables(hist, 8)
    val hybrid = new HybridCodec(tables, model)

    def time(name: String)(f: => Long): Unit = {
      var best = Double.MaxValue
      var sink = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        sink ^= f
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
      }
      println(f"KERNEL $name%-16s best ${best}%8.4f s  ${n / best / 1e6}%8.1f Mtok/s (sink=$sink)")
    }

    time("exactBits")(hybrid.exactBits(values, rowOffsets))
    time("select") {
      CodecSelector.select(values, rowOffsets, Some(hybrid))._2
    }
    time("encode") {
      val w = new BitWriter(n / 2)
      hybrid.encode(values, rowOffsets, w)
      w.bitsWritten
    }
    val w = new BitWriter(n / 2)
    hybrid.encode(values, rowOffsets, w)
    val payload = w.toBytes
    time("decode") {
      hybrid.decode(new BitReader(payload), n, rowOffsets).length.toLong
    }

    // per-row RANDOM ACCESS — the reference's `bench-random` ns/arc
    // protocol (main.rs:877-908: decode a random node's list from the
    // compressed structure, report ns per element) at the kernel level:
    // prefix-sum the O25 row-bits index, seek a random row's start bit,
    // decode exactly that row. This is the single-thread floor under the
    // Spark-level point_lookup row (which adds planning + task dispatch).
    locally {
      val rw = new BitWriter(n / 2)
      val rowBits = hybrid.encodeWithRowBits(values, rowOffsets, rw)
      val rPayload = rw.toBytes
      val startBits = new Array[Long](nRows + 1)
      var r = 0
      while (r < nRows) { startBits(r + 1) = startBits(r) + rowBits(r); r += 1 }
      val picks = Array.tabulate(4096)(j => (graft.ops.XHash.mix62(0xbeefL + j) % nRows).toInt)
      var best = Double.MaxValue
      var sink = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        var j = 0
        while (j < picks.length) {
          val row0 = picks(j)
          val br = new BitReader(rPayload, startBits(row0))
          sink ^= hybrid.decodeRow(br, rowLen)(rowLen - 1).toLong
          j += 1
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
      }
      println(
        f"KERNEL seek_random      best ${best}%8.4f s  ${best * 1e9 / picks.length}%8.1f ns/row  " +
          f"${best * 1e9 / (picks.length.toLong * rowLen)}%6.2f ns/token (sink=$sink)"
      )
    }

    // delta kernel on its winning shape: monotone small-gap rows (the
    // posting/offset stream the codec exists for)
    val mono = new Array[Int](n)
    i = 0
    var acc = 0
    while (i < n) {
      if (i % rowLen == 0) acc = 0
      acc += (values(i) & 0xf) + 1
      mono(i) = acc
      i += 1
    }
    time("delta_encode") {
      val dw = new BitWriter(n / 2)
      graft.codec.DeltaCodec.encode(mono, rowOffsets, dw)
      dw.bitsWritten
    }
    val dw = new BitWriter(n / 2)
    graft.codec.DeltaCodec.encode(mono, rowOffsets, dw)
    val dPayload = dw.toBytes
    time("delta_decode") {
      graft.codec.DeltaCodec.decode(new BitReader(dPayload), n, rowOffsets).length.toLong
    }

    // delta-hybrid on a SKEWED-gap monotone shape (zipf gaps — its winning
    // distribution): dhybrid_trial is the full selection-side cost (hist +
    // per-block package-merge + exact cost walk), encode/decode the kernels
    val skew = new Array[Int](n)
    i = 0
    acc = 0
    while (i < n) {
      if (i % rowLen == 0) acc = 0
      acc += math.min(100000, 1 + (Int.MaxValue / (1 + (values(i) & 0x3fff))) % 97).toInt
      skew(i) = acc
      i += 1
    }
    val skewStats = graft.codec.BlockStats.compute(skew, 0, n)
    time("dhybrid_trial") {
      graft.codec.DeltaHybrid
        .tryBuild(skew, rowOffsets, skewStats.deltaBits, skewStats.deltaBits)
        .map(_._2)
        .getOrElse(-1L)
    }
    val trial = graft.codec.DeltaHybrid
      .tryBuild(skew, rowOffsets, skewStats.deltaBits, skewStats.deltaBits)
    trial match {
      case Some((enc, _)) =>
        time("dhybrid_encode") {
          val hw = new BitWriter(n / 2)
          enc.encode(skew, rowOffsets, hw)
          hw.bitsWritten
        }
        val hw = new BitWriter(n / 2)
        enc.encode(skew, rowOffsets, hw)
        val hPayload = hw.toBytes
        time("dhybrid_decode") {
          graft.codec.DeltaHybrid.Decoder
            .decode(new BitReader(hPayload), n, rowOffsets)
            .length
            .toLong
        }
      case None => println("KERNEL dhybrid: trial declined on the skew shape (unexpected)")
    }
  }
}
