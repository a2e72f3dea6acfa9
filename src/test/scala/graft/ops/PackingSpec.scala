package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def docsDf(rows: Seq[(String, Seq[Int])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "tokens")
  }

  /** Reference packing: concat in doc_id order, chunk, drop tail. */
  private def expected(
      rows: Seq[(String, Seq[Int])],
      l: Int,
      sep: Option[Int]
  ): Seq[(Long, Seq[Int])] = {
    val stream = rows.sortBy(_._1).flatMap { case (_, t) => t ++ sep.toSeq }
    stream.grouped(l).zipWithIndex.collect {
      case (g, i) if g.length == l => (i.toLong, g)
    }.toSeq
  }

  private def collectPacked(df: DataFrame): Seq[(Long, Seq[Int])] =
    df.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
      .toSeq
      .sortBy(_._1)

  test("packs the concatenated stream into exact seqLen examples, drops the tail") {
    val rows = Seq(
      "d1" -> Seq(1, 2, 3),
      "d2" -> Seq(4, 5),
      "d3" -> Seq(6, 7, 8, 9, 10),
      "d4" -> Seq(11)
    )
    val (out, release) = Packing.packSequencesWithHandle(docsDf(rows), seqLen = 4)
    val got = collectPacked(out)
    assert(got == expected(rows, 4, None))
    assert(got.forall(_._2.length == 4))
    // 11 tokens → 2 full examples, 3-token tail dropped
    assert(got.map(_._1) == Seq(0L, 1L))
    release()
  }

  test("separator token is appended after every document, including the last") {
    val rows = Seq("a" -> Seq(1, 2), "b" -> Seq(3), "c" -> Seq(4, 5, 6))
    val (out, release) =
      Packing.packSequencesWithHandle(docsDf(rows), seqLen = 3, sepToken = Some(0))
    val got = collectPacked(out)
    // stream: 1 2 0 | 3 0 4 | 5 6 0  (9 tokens, 3 examples, no tail)
    assert(got == expected(rows, 3, Some(0)))
    assert(got.flatMap(_._2).count(_ == 0) == 3)
    release()
  }

  test("output is invariant to partition count (fragment chains across tiny partitions)") {
    val rows = (0 until 37).map(i => (f"doc-$i%04d", Seq.tabulate(1 + i % 7)(j => i * 100 + j)))
    val base = expected(rows, 16, Some(-1))
    for (p <- Seq(1, 3, 20)) {
      val (out, release) =
        Packing.packSequencesWithHandle(docsDf(rows), seqLen = 16, sepToken = Some(-1), numPartitions = p)
      assert(collectPacked(out) == base, s"mismatch at numPartitions=$p")
      release()
    }
  }

  test("a document longer than many examples spans them contiguously") {
    val big = Seq.tabulate(53)(identity)
    val rows = Seq("a" -> Seq(900, 901), "b" -> big, "c" -> Seq(990))
    val (out, release) =
      Packing.packSequencesWithHandle(docsDf(rows), seqLen = 8, numPartitions = 4)
    val got = collectPacked(out)
    assert(got == expected(rows, 8, None))
    // token stream equality: concat of packed examples is a prefix of the
    // concatenated input stream
    val stream = rows.sortBy(_._1).flatMap(_._2)
    assert(got.flatMap(_._2) == stream.take((stream.length / 8) * 8))
    release()
  }

  test("empty documents contribute only their separator") {
    val rows = Seq("a" -> Seq.empty[Int], "b" -> Seq(1, 2, 3), "c" -> Seq.empty[Int])
    val (out, release) =
      Packing.packSequencesWithHandle(docsDf(rows), seqLen = 2, sepToken = Some(7))
    // stream: 7 | 1 2 3 7 | 7 → 7 1 | 2 3 | 7 7
    assert(collectPacked(out) == expected(rows, 2, Some(7)))
    release()
  }

  test("corpus smaller than one example emits nothing") {
    val (out, release) =
      Packing.packSequencesWithHandle(docsDf(Seq("a" -> Seq(1, 2))), seqLen = 10)
    assert(out.count() == 0)
    release()
  }

  /** Collect (example_id -> spans) with spans as (doc_id, off, len). */
  private def collectSpans(df: DataFrame): Map[Long, Seq[(String, Int, Int)]] =
    df.collect().map { r =>
      r.getLong(0) -> r
        .getSeq[org.apache.spark.sql.Row](r.fieldIndex("spans"))
        .map(s => (s.getString(0), s.getInt(1), s.getInt(2)))
    }.toMap

  test("spans tile every example exactly and mark document boundaries") {
    val rows = Seq(
      "a" -> Seq(1, 2, 3),
      "b" -> Seq(4, 5),
      "c" -> (100 to 112).toSeq, // spans two whole examples and change
      "d" -> Seq(9)
    )
    val l = 6
    val (out, release) =
      Packing.packSequencesWithHandle(docsDf(rows), seqLen = l, withSpans = true, numPartitions = 3)
    val spans = collectSpans(out)
    assert(spans.nonEmpty)
    spans.foreach { case (eid, ss) =>
      // disjoint, ordered, tiling [0, l)
      assert(ss.head._2 == 0, s"example $eid spans must start at 0: $ss")
      assert(ss.map(_._3).sum == l, s"example $eid spans must sum to $l: $ss")
      ss.sliding(2).foreach {
        case Seq((_, o1, n1), (d2, o2, _)) =>
          assert(o1 + n1 == o2, s"example $eid spans must be contiguous: $ss")
          assert(ss.count(_._1 == d2) >= 1)
        case _ => ()
      }
      // adjacent spans never share a doc (they would have been merged)
      ss.sliding(2).foreach {
        case Seq((d1, _, _), (d2, _, _)) => assert(d1 != d2, s"unmerged spans in $eid: $ss")
        case _                           => ()
      }
    }
    // doc c (13 tokens) must appear in more than one example
    val cExamples = spans.filter(_._2.exists(_._1 == "c")).keys
    assert(cExamples.size >= 2, s"doc c should span examples, saw $cExamples")
    // token content agrees with the span map: tokens under each span belong
    // to that doc's stream slice
    val byId = out.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val docTok = rows.toMap
    val seen = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    spans.toSeq.sortBy(_._1).foreach { case (eid, ss) =>
      ss.foreach { case (d, off, len) =>
        val got = byId(eid).slice(off, off + len)
        val want = docTok(d).slice(seen(d), seen(d) + len)
        assert(got == want, s"example $eid span ($d,$off,$len): $got != $want")
        seen(d) += len
      }
    }
    release()
  }

  test("spans include the separator in its document and survive tiny partitions") {
    val rows = (0 until 23).map(i => (f"doc-$i%04d", Seq.tabulate(2 + i % 3)(j => i * 10 + j)))
    val l = 7
    val base = {
      val (out, rel) = Packing.packSequencesWithHandle(
        docsDf(rows), seqLen = l, sepToken = Some(-1), withSpans = true, numPartitions = 1)
      val m = collectSpans(out); rel(); m
    }
    // separator accounting: every doc's total span length across examples =
    // n_tok + 1
    val totalByDoc = base.values.flatten
      .groupBy(_._1).map { case (d, ss) => d -> ss.map(_._3).sum }
    rows.foreach { case (d, t) =>
      totalByDoc.get(d).foreach(n => assert(n == t.length + 1, s"$d: $n != ${t.length} + 1"))
    }
    // fragment chains across 20 tiny partitions assemble the same spans
    val (out20, rel20) = Packing.packSequencesWithHandle(
      docsDf(rows), seqLen = l, sepToken = Some(-1), withSpans = true, numPartitions = 20)
    assert(collectSpans(out20) == base, "spans must be invariant to partitioning")
    rel20()
  }

  test("duplicate doc_ids are refused loudly (pack order would be ill-defined)") {
    val rows = Seq("a" -> Seq(1, 2), "a" -> Seq(3, 4), "b" -> Seq(5))
    val e = intercept[Exception] {
      val (out, release) = Packing.packSequencesWithHandle(docsDf(rows), seqLen = 2)
      try out.collect()
      finally release()
    }
    assert(e.getMessage.contains("unique doc_ids"), e.getMessage)
  }

  test("the pretraining loop closes: packed examples encode as a graft corpus and decode back") {
    import spark.implicits._
    val docs = graft.pipeline.TokenTables.synthetic(spark, 120L, seed = 23L).toDF()
    val (packed, release) =
      Packing.packSequencesWithHandle(docs, seqLen = 256, sepToken = Some(0))
    // packed examples ARE corpus rows: example_id -> doc_id, fixed n_tok
    val asCorpus = packed
      .select(
        format_string("ex-%08d", $"example_id").as("doc_id"),
        $"tokens",
        lit(256).as("n_tok"),
        lit("packed").as("source")
      )
      .as[graft.pipeline.TokenRow]
    val dir = java.nio.file.Files.createTempDirectory("graft-packed").toString
    graft.pipeline.EncodeJob.run(
      asCorpus, dir, graft.pipeline.GraftPipeline.Config(numContexts = 16, numBins = 4))
    val decoded = spark.read.format("graft").load(dir)
      .select($"doc_id", $"tokens").collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val want = packed.collect()
      .map(r => f"ex-${r.getLong(0)}%08d" -> r.getSeq[Int](1)).toMap
    assert(decoded == want, "decoded packed corpus must be bit-identical to the pack output")
    release()
  }

  /** Reference epoch order: the packer's seeded permutation, recomputed. */
  private def epochOrder(rows: Seq[(String, Seq[Int])], seed: Long): Seq[(String, Seq[Int])] = {
    val ms = XHash.mix62(seed)
    rows.sortBy { case (id, _) => (XHash.mix62(XHash.hashChars(id) ^ ms), id) }
  }

  test("orderSeed packs in the seeded permutation, invariant to partitioning") {
    val rows = (0 until 41).map(i => (f"doc-$i%04d", Seq.tabulate(1 + i % 5)(j => i * 100 + j)))
    val seed = 3L
    // reference: concat in hash order, chunk, drop tail
    val stream = epochOrder(rows, seed).flatMap { case (_, t) => t :+ -1 }
    val base = stream.grouped(8).zipWithIndex.collect {
      case (g, i) if g.length == 8 => (i.toLong, g)
    }.toSeq
    assert(base != expected(rows, 8, Some(-1)), "fixture too small: permutation = identity")
    for (p <- Seq(1, 4, 17)) {
      val (out, release) = Packing.packSequencesWithHandle(
        docsDf(rows), seqLen = 8, sepToken = Some(-1), numPartitions = p, orderSeed = Some(seed))
      assert(collectPacked(out) == base, s"mismatch at numPartitions=$p")
      release()
    }
    // a different seed is a different permutation, exactly its own reference
    // (the dropped tail differs too — it is a different stream suffix)
    val stream2 = epochOrder(rows, seed + 1).flatMap { case (_, t) => t :+ -1 }
    val base2 = stream2.grouped(8).zipWithIndex.collect {
      case (g, i) if g.length == 8 => (i.toLong, g)
    }.toSeq
    assert(base2 != base, "fixture too small: two seeds gave one order")
    val (out2, release2) = Packing.packSequencesWithHandle(
      docsDf(rows), seqLen = 8, sepToken = Some(-1), orderSeed = Some(seed + 1))
    assert(collectPacked(out2) == base2)
    release2()
  }

  test("orderSeed composes with spans (boundaries follow the epoch order)") {
    val rows = Seq("a" -> Seq(1, 2, 3), "b" -> Seq(4, 5), "c" -> Seq(6, 7, 8, 9), "d" -> Seq(10))
    val seed = 9L
    val (out, release) = Packing.packSequencesWithHandle(
      docsDf(rows), seqLen = 5, withSpans = true, orderSeed = Some(seed), numPartitions = 3)
    val ordered = epochOrder(rows, seed)
    val stream = ordered.flatMap { case (id, t) => t.map(v => (id, v)) }
    val spans = collectSpans(out)
    // every span's (doc, off, len) matches the permuted stream's tiling
    spans.foreach { case (eid, ss) =>
      assert(ss.map(_._3).sum == 5, s"example $eid spans must tile seqLen")
      ss.foreach { case (doc, off, len) =>
        val slice = stream.slice(eid.toInt * 5 + off, eid.toInt * 5 + off + len)
        assert(slice.forall(_._1 == doc), s"span ($doc,$off,$len) of example $eid mislabeled")
      }
    }
    release()
  }

  test("release handle unpersists the sorted intermediate") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) =
      Packing.packSequencesWithHandle(docsDf(Seq("a" -> Seq(1, 2, 3, 4))), seqLen = 2)
    assert(out.count() == 2)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "expected the sorted intermediate to be persisted")
    release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"intermediate RDDs leaked past release(): $after")
  }
}
