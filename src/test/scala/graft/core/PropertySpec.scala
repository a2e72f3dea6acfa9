package graft.core

import graft.codec._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests (SURVEY §5): randomized roundtrips and
  * algebraic laws over arbitrary non-negative int32 streams.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  val nonNegInt: Gen[Int] = Gen.chooseNum(0, Int.MaxValue)
  val smallStream: Gen[Array[Int]] =
    Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, nonNegInt).map(_.toArray))
  val skewedStream: Gen[Array[Int]] = Gen
    .chooseNum(1, 300)
    .flatMap { n =>
      Gen.listOfN(
        n,
        Gen.frequency(
          8 -> Gen.chooseNum(0, 50),
          3 -> Gen.chooseNum(0, 65535),
          1 -> nonNegInt
        )
      )
    }
    .map(_.toArray)

  test("property: hybrid split/assemble is the identity on [0, 2^31)") {
    check(Prop.forAll(nonNegInt) { v =>
      val p = Hybrid.split(v.toLong)
      Hybrid.assemble(Hybrid.splitToken(p), Hybrid.rawBits(v.toLong, Hybrid.splitNBits(p))) == v.toLong
    })
  }

  test("property: bit stream roundtrips arbitrary (width, value) sequences") {
    val pair: Gen[(Int, Long)] = for {
      w <- Gen.chooseNum(1, 57)
      v <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (w, v & ((1L << w) - 1))
    check(Prop.forAll(Gen.listOf(pair)) { pairs =>
      val w = new BitWriter()
      pairs.foreach { case (n, v) => w.writeBits(v, n) }
      val r = new BitReader(w.toBytes)
      pairs.forall { case (n, v) => r.readBits(n) == v }
    })
  }

  test("property: every lightweight codec roundtrips arbitrary streams with exact estimates") {
    val codecs = Seq(PlainCodec, BitPackCodec, ForCodec, RleCodec, DictCodec, DeltaCodec)
    check(Prop.forAll(smallStream) { values =>
      val offsets = Array(0, values.length)
      val stats = BlockStats.compute(values, 0, values.length)
      codecs.forall { c =>
        val est = c.estimateBits(stats)
        est == Long.MaxValue || {
          val w = new BitWriter()
          c.encode(values, offsets, w)
          w.bitsWritten == est &&
          c.decode(new BitReader(w.toBytes), values.length, offsets).sameElements(values)
        }
      }
    })
  }

  test("property: hybrid codec roundtrips skewed streams built from their own histogram") {
    check(Prop.forAll(skewedStream) { values =>
      val nCtx = 8
      val hist = new Histograms(nCtx, 256)
      var last = 0L
      values.foreach { v =>
        hist.add(Hybrid.chooseContext(last, nCtx), v.toLong); last = v.toLong
      }
      val hybrid = new HybridCodec(Huffman.buildTables(hist, 8), nCtx)
      val offsets = Array(0, values.length)
      val w = new BitWriter()
      hybrid.encode(values, offsets, w)
      w.bitsWritten == hybrid.exactBits(values, offsets) &&
      hybrid.decode(new BitReader(w.toBytes), values.length, offsets).sameElements(values)
    })
  }

  test("property: histogram merge is commutative and associative") {
    val histGen: Gen[Array[Long]] =
      Gen.listOfN(64, Gen.chooseNum(0L, 1000L)).map(_.toArray)
    check(Prop.forAll(histGen, histGen, histGen) { (a, b, c) =>
      Histograms.mergeFlat(a, b).sameElements(Histograms.mergeFlat(b, a)) &&
      Histograms
        .mergeFlat(Histograms.mergeFlat(a, b), c)
        .sameElements(Histograms.mergeFlat(a, Histograms.mergeFlat(b, c)))
    })
  }

  test("property: string codecs roundtrip arbitrary unicode strings") {
    val strGen = Gen.listOf(Gen.asciiPrintableStr).map(_.toArray)
    check(Prop.forAll(strGen) { strings =>
      val (name, payload) = StringCodecs.select(strings)
      StringCodecs.decode(name, payload, strings.length).sameElements(strings)
    })
  }

  test("property: varint shuffle packing roundtrips arbitrary int32 streams exactly") {
    // includes negatives (5-byte case) and the full boundary ladder — the
    // packed form carries token arrays through the encode exchange, so a
    // single mis-sized value would shift every row boundary downstream
    val anyInt: Gen[Int] = Gen.oneOf(
      Gen.chooseNum(Int.MinValue, Int.MaxValue),
      Gen.oneOf(0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
        268435455, 268435456, Int.MaxValue, Int.MinValue, -1)
    )
    check(Prop.forAll(Gen.listOf(anyInt).map(_.toArray)) { values =>
      VarInt.unpack(VarInt.pack(values), values.length).sameElements(values)
    })
  }
}
