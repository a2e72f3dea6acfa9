package graft.sources

import graft.pipeline.GraftPipeline.Config
import graft.pipeline.{EncodeJob, SparkTestBase, TokenRow, TokenTables}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The token data-skipping index ([[TokenIndex]]): no-false-negative Bloom
  * kernel, distributed build + publish, the `containsToken` scan option's
  * exact semantics with and without an index, block skipping observed via
  * the DSv2 metric, and the maintenance interplay (appends, compaction,
  * deletes) that must degrade to "less pruning", never to lost rows.
  */
class TokenIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** The unique needle planted in exactly one document. */
  val Needle = 777000777
  val NeedleDoc = "doc-needle-0000000001"

  lazy val input = {
    import spark.implicits._
    val extra = Seq(
      TokenRow(NeedleDoc, Array(3, 1, Needle, 4, 1), 5, "web")
    ).toDS()
    TokenTables.synthetic(spark, 600L, seed = 23L).union(extra).cache()
  }

  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-tokidx").toString
    EncodeJob.run(input, d, Config(numContexts = 16, numBins = 8, maxBlockRows = 64))
    d
  }

  private def findScan(plan: SparkPlan): BatchScanExec = {
    def rec(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec                                  => rec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => rec(q.plan)
      case b: BatchScanExec                                          => Seq(b)
      case other                                                     => other.children.flatMap(rec)
    }
    rec(plan).headOption.getOrElse(fail(s"no BatchScanExec in:\n$plan"))
  }

  private def metric(scan: BatchScanExec, name: String): Long =
    scan.metrics.collectFirst { case (k, m) if k == name => m.value }
      .getOrElse(fail(s"metric $name absent; have ${scan.metrics.keys.mkString(",")}"))

  private def searchDocs(d: String, token: Int): Set[String] = {
    import spark.implicits._
    spark.read
      .format("graft")
      .option("containsToken", token)
      .load(d)
      .select("doc_id")
      .as[String]
      .collect()
      .toSet
  }

  private def oracleDocs(token: Int): Set[String] = {
    import spark.implicits._
    input.filter(r => r.tokens.contains(token)).map(_.doc_id).collect().toSet
  }

  test("bloom kernel: zero false negatives, bounded false positives") {
    val rnd = new scala.util.Random(7)
    val present = Array.fill(5000)(rnd.nextInt(Int.MaxValue))
    val (mn, mx, nd, bloom) = TokenIndex.entryFor(present)
    assert(mn == present.min && mx == present.max)
    assert(nd == present.distinct.length)
    present.foreach(t => assert(TokenIndex.bloomMayContain(bloom, t), s"false negative for $t"))
    // FPR at ~10 bits/key, 7 probes is ~1%; assert a loose 5% bound
    val absent = Iterator.continually(rnd.nextInt(Int.MaxValue)).filterNot(present.contains).take(2000).toArray
    val fp = absent.count(TokenIndex.bloomMayContain(bloom, _))
    assert(fp < 100, s"FPR too high: $fp/2000")
  }

  test("entryFor handles single-value and run-heavy blocks") {
    val (mn, mx, nd, bloom) = TokenIndex.entryFor(Array.fill(10000)(42))
    assert(mn == 42 && mx == 42 && nd == 1)
    assert(TokenIndex.bloomMayContain(bloom, 42))
    assert(bloom.length == TokenIndex.MinBloomBits / 8) // tiny filter for 1 key
  }

  test("containsToken without any index is an exact filter") {
    val got = searchDocs(dir, Needle)
    assert(got == Set(NeedleDoc))
    // a token the corpus provably lacks (negative values never generated)
    assert(searchDocs(dir, -5) == Set.empty)
  }

  test("build indexes every live file once; incremental rebuild is a no-op") {
    val r1 = TokenIndex.build(spark, dir)
    assert(r1.filesIndexed > 0 && r1.blocksIndexed > 0)
    val r2 = TokenIndex.build(spark, dir)
    assert(r2.filesIndexed == 0, "second build must skip covered files")
    assert(r2.filesSkipped == r1.filesIndexed)
  }

  test("indexed needle search: same rows, most blocks skipped, fewer values decoded") {
    TokenIndex.build(spark, dir) // idempotent with the test above
    import spark.implicits._
    // collect and inspect the SAME QueryExecution — a derived select would
    // plan (and meter) its own scan
    val df = spark.read
      .format("graft")
      .option("containsToken", Needle)
      .load(dir)
      .select($"doc_id", $"n_tok")
      .as[(String, Int)]
    val rows = df.collect()
    assert(rows.toSeq == Seq((NeedleDoc, 5)))
    val scan = findScan(df.queryExecution.executedPlan)
    val skipped = metric(scan, GraftMetrics.BlocksIndexSkipped)
    val decoded = metric(scan, GraftMetrics.BlocksDecoded)
    assert(skipped > 0, "index produced no block skipping")
    assert(decoded <= skipped / 4, s"expected most blocks skipped: decoded=$decoded skipped=$skipped")
    // and the decoded token volume is a fraction of the corpus
    val totalTokens = input.agg(sum("n_tok")).as[Long].head()
    val decodedTokens = metric(scan, GraftMetrics.TokenValuesDecoded)
    assert(decodedTokens < totalTokens / 4)
  }

  test("indexed search equals the unindexed oracle on common and boundary tokens") {
    TokenIndex.build(spark, dir)
    // 1 is the most common Zipf token; 1000000..1000049 covers wiki FOR
    // blocks; 12345*7 covers code dict blocks
    for (t <- Seq(1, 3, 1000007, 12345 * 7, Needle, 999999998)) {
      assert(searchDocs(dir, t) == oracleDocs(t), s"mismatch for token $t")
    }
  }

  test("containsToken composes with pushed filters and limit") {
    import spark.implicits._
    TokenIndex.build(spark, dir)
    val got = spark.read
      .format("graft")
      .option("containsToken", 1)
      .load(dir)
      .filter($"source" === "web" && $"n_tok" > 10)
      .select("doc_id")
      .as[String]
      .collect()
      .toSet
    val want = input
      .filter(r => r.source == "web" && r.n_tok > 10 && r.tokens.contains(1))
      .map(_.doc_id)
      .collect()
      .toSet
    assert(got == want)
    assert(
      spark.read.format("graft").option("containsToken", 1).load(dir).limit(3).count() == 3
    )
  }

  test("aggregate pushdown is disabled under containsToken") {
    val df = spark.read
      .format("graft")
      .option("containsToken", Needle)
      .load(dir)
      .agg(count(lit(1)))
    assert(df.collect().head.getLong(0) == 1L, "count must see only matching rows")
  }

  test("appended rows are found before the index covers them, and after") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-tokidx-app").toString
    EncodeJob.run(
      TokenTables.synthetic(spark, 200L, seed = 5L),
      d,
      Config(numContexts = 16, numBins = 4, maxBlockRows = 64)
    )
    TokenIndex.build(spark, d)
    val newNeedle = 777000778
    Seq(TokenRow("doc-appended", Array(newNeedle, 2, 2), 3, "web"))
      .toDF()
      .write
      .format("graft")
      .mode("append")
      .save(d)
    // the appended file has no index entries → decoded normally → found
    assert(searchDocs(d, newNeedle) == Set("doc-appended"))
    val r = TokenIndex.build(spark, d)
    assert(r.filesIndexed >= 1, "incremental build must cover the appended file")
    assert(searchDocs(d, newNeedle) == Set("doc-appended"))
  }

  test("compaction invalidates by file identity; full rebuild restores pruning") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-tokidx-cmp").toString
    val in = TokenTables
      .synthetic(spark, 300L, seed = 9L)
      .union(Seq(TokenRow("doc-cmp-needle", Array(Needle), 1, "web")).toDS())
      .cache()
    EncodeJob.run(in, d, Config(numContexts = 16, numBins = 4, maxBlockRows = 64))
    TokenIndex.build(spark, d)
    val before = searchDocs(d, Needle)
    assert(before == Set("doc-cmp-needle"))
    val compacted = graft.pipeline.Maintenance
      .compact(spark, d, smallFileBytes = Long.MaxValue, targetFileBytes = 256L << 20, minInputFiles = 2)
    assert(compacted.isDefined, "compaction should rewrite this many-file dir")
    TokenIndex.invalidateCaches(d)
    // rewritten files have new names → no entries → exact fallback
    assert(searchDocs(d, Needle) == Set("doc-cmp-needle"))
    val r = TokenIndex.build(spark, d, full = true)
    assert(r.filesIndexed > 0)
    assert(searchDocs(d, Needle) == Set("doc-cmp-needle"))
  }

  test("containsAnyToken / containsAllTokens: exact multi-needle semantics") {
    import spark.implicits._
    TokenIndex.build(spark, dir)
    def docs(optName: String, v: String): Set[String] =
      spark.read.format("graft").option(optName, v).load(dir)
        .select("doc_id").as[String].collect().toSet
    def oracleAny(ts: Seq[Int]): Set[String] =
      input.filter(r => ts.exists(r.tokens.contains)).map(_.doc_id).collect().toSet
    def oracleAll(ts: Seq[Int]): Set[String] =
      input.filter(r => ts.forall(r.tokens.contains)).map(_.doc_id).collect().toSet

    // ANY: union of per-needle matches; an absent needle contributes nothing
    assert(docs("containsAnyToken", s"$Needle,-7") == Set(NeedleDoc))
    assert(docs("containsAnyToken", s"1,$Needle") == oracleAny(Seq(1, Needle)))
    // ALL: the planted doc holds (3, 1, Needle); Needle is unique, so ALL
    // of (3, Needle) is exactly that doc, and adding an absent needle
    // empties the result
    assert(docs("containsAllTokens", s"3,$Needle") == oracleAll(Seq(3, Needle)))
    assert(oracleAll(Seq(3, Needle)) == Set(NeedleDoc))
    assert(docs("containsAllTokens", s"$Needle,-7") == Set.empty)
    // ALL with a common pair recomputed against the raw corpus
    assert(docs("containsAllTokens", "1,2") == oracleAll(Seq(1, 2)))

    // the options are mutually exclusive (walk causes — Spark may wrap
    // planning-time exceptions)
    val err = intercept[Exception] {
      spark.read.format("graft")
        .option("containsToken", 1).option("containsAnyToken", "1,2")
        .load(dir).count()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    assert(msgs.contains("mutually exclusive"), msgs)
  }

  test("containsSeq: consecutive in-order match only") {
    import spark.implicits._
    TokenIndex.build(spark, dir)
    def docs(v: String): Set[String] =
      spark.read.format("graft").option("containsSeq", v).load(dir)
        .select("doc_id").as[String].collect().toSet
    // the planted doc is (3, 1, Needle, 4, 1): consecutive pairs match…
    assert(docs(s"1,$Needle") == Set(NeedleDoc))
    assert(docs(s"3,1,$Needle,4,1") == Set(NeedleDoc))
    // …present-but-not-adjacent (3 then Needle) and wrong order do not
    assert(docs(s"3,$Needle") == Set.empty)
    assert(docs(s"$Needle,1,3") == Set.empty)
    // a whole-corpus oracle for a common bigram
    val want = input
      .filter(r => r.tokens.sliding(2).exists(w => w.length == 2 && w(0) == 1 && w(1) == 1))
      .map(_.doc_id).collect().toSet
    assert(docs("1,1") == want)
  }

  test("ALL-needle with a unique token skips blocks as hard as a single needle") {
    TokenIndex.build(spark, dir)
    import spark.implicits._
    val df = spark.read
      .format("graft")
      .option("containsAllTokens", s"1,$Needle")
      .load(dir)
      .select($"doc_id")
      .as[String]
    assert(df.collect().toSeq == Seq(NeedleDoc))
    val scan = findScan(df.queryExecution.executedPlan)
    assert(metric(scan, GraftMetrics.BlocksIndexSkipped) > 0)
  }

  test("equality deletes compose with containsToken") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-tokidx-del").toString
    val in = TokenTables
      .synthetic(spark, 200L, seed = 13L)
      .union(
        Seq(
          TokenRow("doc-del-a", Array(Needle, 1), 2, "web"),
          TokenRow("doc-del-b", Array(Needle, 2), 2, "web")
        ).toDS()
      )
    EncodeJob.run(in, d, Config(numContexts = 16, numBins = 4, maxBlockRows = 64))
    TokenIndex.build(spark, d)
    assert(searchDocs(d, Needle) == Set("doc-del-a", "doc-del-b"))
    graft.pipeline.Deletes.deleteDocs(spark, d, Seq("doc-del-a").toDS())
    assert(searchDocs(d, Needle) == Set("doc-del-b"))
  }
}
