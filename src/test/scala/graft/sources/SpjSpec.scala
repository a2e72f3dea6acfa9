package graft.sources

import graft.pipeline.GraftPipeline.Config
import graft.pipeline.{EncodeJob, SparkTestBase, TokenTables}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Storage-partitioned joins: with `spark.graft.binPartitionedScan=true`
  * the scan plans one keyed task per bin and reports
  * `graft_bin(doc_id, numBins, salt)` as its partitioning, so two
  * same-layout graft tables loaded through the catalog equi-join on
  * doc_id with ZERO exchange — the Iceberg bucket-SPJ pattern over the
  * engine's salted-bin layout.
  */
class SpjSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 64)

  lazy val lhs = TokenTables.synthetic(spark, 500L, seed = 61L).cache()
  // right side: same layout (numBins, salt), overlapping doc_ids, different content
  lazy val rhs = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    lhs
      .where(expr("cast(substring(doc_id, -10, 10) as long)") % 2 === 0)
      .withColumn("tokens", expr("transform(tokens, t -> cast(t + 3 as int))"))
      .withColumn("source", lit("rhs"))
      .as[graft.pipeline.TokenRow]
      .cache()
  }

  lazy val dirL: String = {
    val d = Files.createTempDirectory("graft-spj-l").toString
    EncodeJob.run(lhs, d, cfg); d
  }
  lazy val dirR: String = {
    val d = Files.createTempDirectory("graft-spj-r").toString
    EncodeJob.run(rhs, d, cfg); d
  }

  private def collectShuffles(p: SparkPlan): Seq[SparkPlan] = {
    def rec(x: SparkPlan): Seq[SparkPlan] = x match {
      case a: AdaptiveSparkPlanExec                                  => rec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => rec(q.plan)
      case s: ShuffleExchangeLike                                    => s +: s.children.flatMap(rec)
      case other                                                     => other.children.flatMap(rec)
    }
    rec(p)
  }

  private def withSpjConfs[A](body: => A): A = {
    val confs = Seq(
      "spark.graft.binPartitionedScan" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("same-layout graft tables equi-join on doc_id with zero exchange") {
    val joined = withSpjConfs {
      val df = spark.sql(
        s"""SELECT a.doc_id, a.n_tok AS ln, b.n_tok AS rn
           |FROM graft.`$dirL` a JOIN graft.`$dirR` b ON a.doc_id = b.doc_id""".stripMargin
      )
      val rows = df.collect()
      // correctness: exactly the overlapping ids, token counts preserved
      assert(rows.length == rhs.count())
      val wantN = lhs.collect().map(r => r.doc_id -> r.n_tok).toMap
      rows.foreach { r =>
        assert(r.getInt(1) == wantN(r.getString(0)) && r.getInt(2) == wantN(r.getString(0)))
      }
      df
    }
    val plan = joined.queryExecution.executedPlan
    val shuffles = collectShuffles(plan)
    assert(shuffles.isEmpty, s"expected a storage-partitioned join with zero exchanges, got:\n$plan")
    assert(plan.toString.contains("SortMergeJoin") || plan.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"expected a sort-merge join over co-located bins:\n$plan")
  }

  test("different-layout tables fall back to a shuffled join, still correct") {
    // a 4-bin right side: canonical function names differ (numBins is part
    // of the identity), so SPJ must NOT fire — and results must not change
    val dir4 = Files.createTempDirectory("graft-spj-r4").toString
    EncodeJob.run(rhs, dir4, cfg.copy(numBins = 4))
    val joined = withSpjConfs {
      val df = spark.sql(
        s"""SELECT a.doc_id, a.n_tok AS ln, b.n_tok AS rn
           |FROM graft.`$dirL` a JOIN graft.`$dir4` b ON a.doc_id = b.doc_id""".stripMargin
      )
      assert(df.collect().length == rhs.count())
      df
    }
    val shuffles = collectShuffles(joined.queryExecution.executedPlan)
    assert(shuffles.nonEmpty, "layout-incompatible tables must be re-shuffled, not storage-partition-joined")
  }

  test("missing bins on one side co-join via pushed-down partition values") {
    // a right side so small that some of the 8 bins are empty: partition
    // values differ between the sides, which SPJ handles by pushing the
    // merged value set into both scans (empty splits for the holes)
    import spark.implicits._
    val tiny = lhs.limit(5).as[graft.pipeline.TokenRow].cache()
    val dirT = Files.createTempDirectory("graft-spj-tiny").toString
    EncodeJob.run(tiny, dirT, cfg)
    val joined = withSpjConfs {
      val df = spark.sql(
        s"""SELECT a.doc_id, a.n_tok AS ln, b.n_tok AS rn
           |FROM graft.`$dirL` a JOIN graft.`$dirT` b ON a.doc_id = b.doc_id""".stripMargin
      )
      assert(df.collect().length == tiny.count())
      df
    }
    val shuffles = collectShuffles(joined.queryExecution.executedPlan)
    assert(shuffles.isEmpty,
      s"expected partition-value pushdown to keep the join exchange-free:\n${joined.queryExecution.executedPlan}")
  }

  test("plain-side shuffle: graft join a plain table moves only the plain side") {
    // with spark.sql.sources.v2.bucketing.shuffle.enabled, Spark evaluates
    // the catalog-bound graft_bin_<numBins>_<salt> per row to repartition
    // the NON-graft side into the graft table's bins — the corpus itself
    // never shuffles. At 100 TB this is the "join the corpus with a fresh
    // allowlist/labels table" shape: shuffle gigabytes, not the 100 TB.
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val dim = lhs.select($"doc_id").where(expr("cast(substring(doc_id, -10, 10) as long)") % 3 === 0)
    dim.createOrReplaceTempView("spj_dim")
    val joined = withSpjConfs {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        val df = spark.sql(
          s"""SELECT a.doc_id, a.n_tok
             |FROM graft.`$dirL` a JOIN spj_dim b ON a.doc_id = b.doc_id""".stripMargin
        )
        assert(df.collect().length == dim.count())
        df
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
    val shuffles = collectShuffles(joined.queryExecution.executedPlan)
    assert(shuffles.length == 1, s"expected exactly the plain side to shuffle:\n${joined.queryExecution.executedPlan}")
    assert(
      shuffles.head.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.KeyGroupedPartitioning],
      s"the plain side must be repartitioned into the graft table's bins, got ${shuffles.head.outputPartitioning}"
    )
  }

  test("keyed scan applies live equality deletes (factory fallback path)") {
    import spark.implicits._
    // own dir: this test mutates it
    val dirD = Files.createTempDirectory("graft-spj-del").toString
    EncodeJob.run(lhs, dirD, cfg)
    val victim = lhs.head().doc_id
    graft.pipeline.Deletes.deleteDocs(spark, dirD, Seq(victim).toDS())
    val (ids, joinedRows) = withSpjConfs {
      val ids = spark.sql(s"SELECT doc_id FROM graft.`$dirD`").collect().map(_.getString(0))
      // SPJ self-join: the deleted doc must be gone on BOTH sides
      val j = spark.sql(
        s"""SELECT a.doc_id FROM graft.`$dirD` a JOIN graft.`$dirD` b ON a.doc_id = b.doc_id"""
      )
      assert(collectShuffles(j.queryExecution.executedPlan).isEmpty)
      (ids, j.collect().map(_.getString(0)))
    }
    assert(ids.length == lhs.count() - 1 && !ids.contains(victim))
    assert(joinedRows.length == lhs.count() - 1 && !joinedRows.contains(victim))
  }

  test("keyed scan stays correct standalone and off by default") {
    import spark.implicits._
    // keyed planning alone (no join) must return the exact corpus
    val keyed = withSpjConfs {
      spark.sql(s"SELECT doc_id, n_tok FROM graft.`$dirL`").collect()
    }
    assert(keyed.length == lhs.count())
    // default path unchanged: conf off -> per-file planning, same rows
    val normal = spark.read.format("graft").load(dirL).select($"doc_id", $"n_tok").collect()
    assert(normal.length == lhs.count())
    assert(keyed.map(_.toString).sorted.toSeq == normal.map(_.toString).sorted.toSeq)
  }
}
