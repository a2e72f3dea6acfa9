package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Core codec tests mirroring the reference suite's expectations
  * (/root/reference/tests/test_decoding.rs): golden token splits, seeded
  * heavy-tailed roundtrips over maxBits/context combinations, and header
  * self-description.
  */
class HuffmanCoreSpec extends AnyFunSuite {

  // Deterministic heavy-tailed sample (Zipf-ish tail, s≈1.5) from a
  // splittable hash — no wall clock, no Math.random.
  def zipfish(seed: Long, i: Long, cap: Long = 1000000000L): Long = {
    var x = seed * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^= x >>> 31
    val u = ((x >>> 11).toDouble / (1L << 53).toDouble) max 1e-12
    math.min(cap, (1.0 / math.pow(u, 2.0)).toLong)
  }

  test("hybrid split golden values (reference test_decoding.rs:89-95)") {
    val packed = Hybrid.split(17179902313L)
    assert(Hybrid.splitToken(packed) == 257)
    assert(Hybrid.splitNBits(packed) == 31)
  }

  test("values below 16 are explicit tokens with no raw bits") {
    for (v <- 0L until 16L) {
      val p = Hybrid.split(v)
      assert(Hybrid.splitToken(p) == v.toInt)
      assert(Hybrid.splitNBits(p) == 0)
      assert(Hybrid.assemble(Hybrid.splitToken(p), 0L) == v)
    }
  }

  test("split/assemble roundtrip on exhaustive small + sampled large values") {
    for (v <- 0L until 5000L) {
      val p = Hybrid.split(v)
      val nb = Hybrid.splitNBits(p)
      assert(Hybrid.assemble(Hybrid.splitToken(p), Hybrid.rawBits(v, nb)) == v, s"v=$v")
      assert(Hybrid.tokenNBits(Hybrid.splitToken(p)) == nb, s"v=$v")
    }
    for (i <- 0 until 20000) {
      val v = zipfish(7L, i.toLong, Long.MaxValue >> 2)
      val p = Hybrid.split(v)
      val nb = Hybrid.splitNBits(p)
      assert(Hybrid.assemble(Hybrid.splitToken(p), Hybrid.rawBits(v, nb)) == v, s"v=$v")
    }
  }

  test("bit writer/reader roundtrip with mixed widths") {
    val w = new BitWriter()
    val widths = (0 until 3000).map(i => (zipfish(3L, i.toLong, 57).toInt % 57) + 1)
    val vals = widths.zipWithIndex.map { case (n, i) =>
      zipfish(11L, i.toLong, Long.MaxValue >> 2) & ((1L << n) - 1)
    }
    widths.zip(vals).foreach { case (n, v) => w.writeBits(v, n) }
    val bytes = w.toBytes
    assert(w.bitsWritten == widths.map(_.toLong).sum)
    val r = new BitReader(bytes)
    widths.zip(vals).foreach { case (n, v) => assert(r.readBits(n) == v) }
  }

  test("bit reader peek/skip and seek") {
    val w = new BitWriter()
    w.writeBits(0x2d, 7); w.writeBits(0x155, 9); w.writeBits(0x3, 2)
    val bytes = w.toBytes
    val r = new BitReader(bytes)
    assert(r.peekBits(7) == 0x2d)
    r.skipBits(7)
    assert(r.readBits(9) == 0x155)
    val r2 = new BitReader(bytes, 7)
    assert(r2.readBits(9) == 0x155)
    assert(r2.bitPos == 16)
  }

  test("package-merge satisfies Kraft equality and max length") {
    for (maxBits <- Seq(4, 8, 12); seed <- Seq(0L, 31415L)) {
      val n = 1 << maxBits
      val hist = new Array[Long](n)
      for (i <- 0 until 5000) hist((zipfish(seed, i.toLong, n.toLong - 1)).toInt) += 1
      val present = new Array[Boolean](n)
      val nBits = new Array[Byte](n)
      Huffman.computeSymbolNumBits(hist, maxBits, present, nBits)
      val lens = (0 until n).filter(present).map(nBits(_).toInt)
      assert(lens.forall(l => l >= 1 && l <= maxBits))
      if (lens.size >= 2) {
        val kraft = lens.map(l => 1.0 / (1 << l)).sum
        assert(math.abs(kraft - 1.0) < 1e-9, s"kraft=$kraft maxBits=$maxBits")
      }
    }
  }

  /** The pre-optimization ArrayBuffer package-merge, kept verbatim as the
    * equivalence reference for the concatenation-tree rewrite: identical
    * (freq, symbol-list lexicographic) tie-breaking, so code lengths must
    * match bit for bit on any histogram.
    */
  private def computeSymbolNumBitsRef(
      histogram: Array[Long],
      maxBits: Int,
      present: Array[Boolean],
      nBits: Array[Byte]
  ): Unit = {
    import scala.collection.mutable.ArrayBuffer
    var nonZero = 0
    var i = 0
    while (i < histogram.length) {
      if (histogram(i) != 0) { present(i) = true; nonZero += 1 }
      i += 1
    }
    if (nonZero <= 1) {
      var s = 0
      while (s < present.length) { if (present(s)) nBits(s) = 1; s += 1 }
      return
    }
    val ord = new Ordering[(Long, ArrayBuffer[Int])] {
      def compare(a: (Long, ArrayBuffer[Int]), b: (Long, ArrayBuffer[Int])): Int = {
        if (a._1 != b._1) return java.lang.Long.compare(a._1, b._1)
        val (x, y) = (a._2, b._2)
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          if (x(i) != y(i)) return Integer.compare(x(i), y(i))
          i += 1
        }
        Integer.compare(x.length, y.length)
      }
    }
    val bags = Array.fill(maxBits)(ArrayBuffer.empty[(Long, ArrayBuffer[Int])])
    var b = 0
    while (b < maxBits) {
      var s = 0
      while (s < present.length) {
        if (present(s)) bags(b) += ((histogram(s), ArrayBuffer(s)))
        s += 1
      }
      b += 1
    }
    var lvl = 0
    while (lvl < maxBits - 1) {
      val bag = bags(lvl)
      val sorted = bag.sorted(ord)
      bag.clear(); bag ++= sorted
      var j = 0
      while (j + 1 < bag.length) {
        val nf = bag(j)._1 + bag(j + 1)._1
        val merged = bag(j)._2 ++ bag(j + 1)._2
        bags(lvl + 1) += ((nf, merged))
        j += 2
      }
      lvl += 1
    }
    val last = bags(maxBits - 1).sorted(ord)
    val take = 2 * nonZero - 2
    var k = 0
    while (k < take && k < last.length) {
      val syms = last(k)._2
      var i2 = 0
      while (i2 < syms.length) { nBits(syms(i2)) = (nBits(syms(i2)) + 1).toByte; i2 += 1 }
      k += 1
    }
  }

  test("tree package-merge equals the ArrayBuffer reference on random histograms") {
    val rnd = new scala.util.Random(20260822L)
    for (trial <- 0 until 60) {
      val maxBits = Seq(2, 4, 8)(trial % 3)
      val n = 1 << maxBits
      val hist = new Array[Long](n)
      // mix shapes: uniform-sparse, zipf-ish with heavy freq ties, all-equal
      val shape = trial % 4
      val nonZero = 2 + rnd.nextInt(n - 1)
      for (_ <- 0 until nonZero) {
        val s = rnd.nextInt(n)
        hist(s) = shape match {
          case 0 => 1L + rnd.nextInt(5) // dense freq ties
          case 1 => 1L << rnd.nextInt(20)
          case 2 => 1L
          case _ => 1L + rnd.nextInt(1000)
        }
      }
      val p1 = new Array[Boolean](n); val b1 = new Array[Byte](n)
      val p2 = new Array[Boolean](n); val b2 = new Array[Byte](n)
      Huffman.computeSymbolNumBits(hist, maxBits, p1, b1)
      computeSymbolNumBitsRef(hist, maxBits, p2, b2)
      assert(p1.toSeq == p2.toSeq, s"presence drift trial=$trial")
      assert(b1.toSeq == b2.toSeq, s"code-length drift trial=$trial maxBits=$maxBits")
    }
  }

  test("canonical codes are prefix-free (LSB-first)") {
    val maxBits = 8
    val n = 1 << maxBits
    val hist = new Array[Long](n)
    for (i <- 0 until 3000) hist(zipfish(5L, i.toLong, n.toLong - 1).toInt) += 1
    val present = new Array[Boolean](n); val nBits = new Array[Byte](n); val codes = new Array[Int](n)
    Huffman.computeSymbolNumBits(hist, maxBits, present, nBits)
    Huffman.computeSymbolBits(maxBits, present, nBits, codes)
    val entries = (0 until n).filter(present).map(s => (codes(s), nBits(s).toInt))
    for ((ca, na) <- entries; (cb, nb) <- entries if (ca, na) != (cb, nb)) {
      val n0 = math.min(na, nb)
      assert((ca & ((1 << n0) - 1)) != (cb & ((1 << n0) - 1)), s"prefix clash $ca/$na vs $cb/$nb")
    }
  }

  def roundtrip(maxBits: Int, numContexts: Int, seed: Long, nSamples: Int): Unit = {
    val hist = new Histograms(numContexts, 1 << maxBits)
    val values = new Array[Long](nSamples)
    val ctxs = new Array[Int](nSamples)
    var last = 0L
    for (i <- 0 until nSamples) {
      val v = zipfish(seed, i.toLong)
      val ctx = if (numContexts == 1) 0 else Hybrid.chooseContext(last, numContexts)
      values(i) = v; ctxs(i) = ctx
      hist.add(ctx, v)
      last = v
    }
    val tables = Huffman.buildTables(hist, maxBits)
    val w = new BitWriter()
    Huffman.writeHeader(tables, w)
    for (i <- 0 until nSamples) Huffman.writeValue(tables, ctxs(i), values(i), w)
    val bytes = w.toBytes

    val r = new BitReader(bytes)
    val parsed = Huffman.readHeader(r, maxBits, numContexts)
    assert(parsed.tableHash == tables.tableHash)
    val lut = Huffman.decoderLut(parsed)
    var lastDec = 0L
    for (i <- 0 until nSamples) {
      val ctx = if (numContexts == 1) 0 else Hybrid.chooseContext(lastDec, numContexts)
      assert(ctx == ctxs(i), s"context divergence at $i")
      val v = Huffman.readValue(lut, maxBits, ctx, r)
      assert(v == values(i), s"value mismatch at $i: $v != ${values(i)}")
      lastDec = v
    }
  }

  test("encode+decode roundtrip, default params (maxBits=8, 1 ctx, seeds 0/31415)") {
    roundtrip(Hybrid.DefaultMaxBits, 1, 0L, 100000)
    roundtrip(Hybrid.DefaultMaxBits, 1, 31415L, 100000)
  }

  test("encode+decode roundtrip, maxBits=10, 1 and 4 contexts") {
    roundtrip(10, 1, 0L, 100000)
    roundtrip(10, 4, 0L, 100000)
  }

  test("encode+decode roundtrip, maxBits=12, many contexts") {
    roundtrip(12, 64, 42L, 100000)
  }

  test("large value with 12-bit tables (reference test_decoding.rs:98-132)") {
    val v = 49903891086L
    val hist = new Histograms(1, 1 << 12)
    hist.add(0, 1L); hist.add(0, v)
    val tables = Huffman.buildTables(hist, 12)
    val w = new BitWriter()
    Huffman.writeHeader(tables, w)
    Huffman.writeValue(tables, 0, v, w)
    val r = new BitReader(w.toBytes)
    val parsed = Huffman.readHeader(r, 12, 1)
    val lut = Huffman.decoderLut(parsed)
    assert(Huffman.readValue(lut, 12, 0, r) == v)
  }

  test("single-symbol context gets a 1-bit code and roundtrips") {
    val hist = new Histograms(2, 256)
    for (_ <- 0 until 100) hist.add(0, 7L)
    hist.add(1, 3L); hist.add(1, 300L)
    val tables = Huffman.buildTables(hist, 8)
    assert(tables.nBits(0)(7) == 1)
    val w = new BitWriter()
    Huffman.writeHeader(tables, w)
    for (_ <- 0 until 10) Huffman.writeValue(tables, 0, 7L, w)
    Huffman.writeValue(tables, 1, 300L, w)
    val r = new BitReader(w.toBytes)
    val lut = Huffman.decoderLut(Huffman.readHeader(r, 8, 2))
    for (_ <- 0 until 10) assert(Huffman.readValue(lut, 8, 0, r) == 7L)
    assert(Huffman.readValue(lut, 8, 1, r) == 300L)
  }

  test("histogram merge is associative and matches single-pass") {
    val a = new Histograms(4, 256); val b = new Histograms(4, 256); val all = new Histograms(4, 256)
    for (i <- 0 until 10000) {
      val v = zipfish(9L, i.toLong); val ctx = i % 4
      (if (i < 5000) a else b).add(ctx, v)
      all.add(ctx, v)
    }
    val merged = Histograms.fromFlat(Histograms.mergeFlat(a.flat, b.flat), 4, 256)
    assert(merged.flat.sameElements(all.flat))
    assert(merged.total == 10000)
  }

  test("requiredMaxBits covers int32 range with default 8 bits") {
    assert(Hybrid.requiredMaxBits(Int.MaxValue.toLong) == 8)
    assert(Hybrid.maxTokenFor(Int.MaxValue.toLong) < 256)
    assert(Hybrid.requiredMaxBits(1L << 40) > 8)
  }
}
