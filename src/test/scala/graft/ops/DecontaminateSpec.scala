package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def df(rows: Seq[(Long, Seq[Int])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "tokens")
  }

  test("planted eval n-gram flags exactly the containing docs") {
    val evalSeqs = df(Seq(1000L -> Seq(7, 8, 9, 10)))
    val corpus = df(Seq(
      1L -> Seq(1, 2, 7, 8, 9, 10, 3), // contains, first window at pos 3
      2L -> Seq(7, 8, 9, 11, 10),      // broken gram — no hit
      3L -> Seq(10, 9, 8, 7),          // reversed — order matters, no hit
      4L -> Seq(7, 8, 9, 10),          // exactly the gram, pos 1
      5L -> Seq(7, 8, 9)               // shorter than n — never flagged
    ))
    val out = Decontaminate
      .screen(corpus, evalSeqs, n = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet === Set(1L, 4L))
    assert(out(1L) === ((1L, 1L, 3L)))
    assert(out(4L) === ((1L, 1L, 1L)))
  }

  test("repeated eval gram counts every window but one distinct gram") {
    val evalSeqs = df(Seq(1000L -> Seq(5, 5)))
    val corpus = df(Seq(1L -> Seq(5, 5, 5, 5))) // windows at 1, 2, 3
    val Array(row) = Decontaminate.screen(corpus, evalSeqs, n = 2).collect()
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) === ((3L, 1L, 1L)))
  }

  test("n=1 degenerates to token membership") {
    val evalSeqs = df(Seq(1000L -> Seq(42)))
    val corpus = df(Seq(1L -> Seq(1, 42, 3, 42), 2L -> Seq(1, 2, 3)))
    val Array(row) = Decontaminate.screen(corpus, evalSeqs, n = 1).collect()
    assert(row.getLong(0) === 1L)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) === ((2L, 1L, 2L)))
  }

  test("matches a brute-force window-sharing recompute on a seeded corpus") {
    // small vocab forces real cross-doc gram collisions; the op's hash-set
    // path must agree with literal window comparison on every doc
    def toks(id: Int): Seq[Int] =
      Seq.tabulate(6 + id % 13)(j => (graft.pipeline.TokenTables.mix64(id.toLong * 31 + j) & 7L).toInt)
    val n = 3
    val all = (0 until 200).map(id => id.toLong -> toks(id))
    val evalIds = all.collect { case (id, t) if id % 17 == 4 && t.length >= n => id }.toSet
    val evalGrams: Set[Seq[Int]] = all
      .filter(r => evalIds(r._1))
      .flatMap(_._2.sliding(n).filter(_.length == n))
      .toSet
    val expected: Map[Long, (Long, Long, Long)] = all.flatMap { case (id, t) =>
      val wins = t.sliding(n).filter(_.length == n).zipWithIndex.filter(w => evalGrams(w._1)).toSeq
      if (wins.isEmpty) None
      else Some(id -> ((wins.size.toLong, wins.map(_._1).distinct.size.toLong, wins.head._2 + 1L)))
    }.toMap
    val out = Decontaminate
      .screen(df(all), df(all.filter(r => evalIds(r._1))), n = n)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === expected)
    assert(out.nonEmpty && out.size > evalIds.size, "test corpus must produce cross-doc hits")
  }

  test("string doc ids pass through the screen untouched") {
    import spark.implicits._
    val corpus = Seq(("doc-a", Seq(1, 2, 3, 4)), ("doc-b", Seq(9, 9, 9, 9)))
      .toDF("doc_id", "tokens")
    val evalSeqs = Seq(("e", Seq(2, 3))).toDF("doc_id", "tokens")
    val Array(row) = Decontaminate.screen(corpus, evalSeqs, n = 2).collect()
    assert(row.getString(0) === "doc-a")
  }

  test("corpus-sized eval input is refused loudly before any collect") {
    // 3 rows x 9 windows = 27 > the (test-sized) cap of 10 — the gate names
    // the misuse instead of materializing the hashes on the driver
    val big = df(Seq(
      1L -> (0 until 12),
      2L -> (100 until 112),
      3L -> (200 until 212)
    ))
    val e = intercept[IllegalArgumentException](
      Decontaminate.evalGramHashes(big, n = 4, maxGrams = 10L)
    )
    assert(e.getMessage.contains("looks like a corpus"), e.getMessage)
    // at the default production cap the same input sails through
    assert(Decontaminate.evalGramHashes(big, n = 4).length == 27)
  }
}
