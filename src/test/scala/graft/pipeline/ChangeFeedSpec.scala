package graft.pipeline

import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Row-level change log between snapshots ([[ChangeFeed.changesBetween]]):
  * insert deltas, delete pre-images, the replace (upsert) encoding, log
  * application semantics, and the loud-failure edges.
  */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 64)

  lazy val all = TokenTables.synthetic(spark, 640L, seed = 47L).cache()
  private def idx = expr("cast(substring(doc_id, -10, 10) as long)")
  lazy val base = all.where(idx < 500)
  lazy val extra = all.where(idx >= 500)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Seq[Int])] = {
    import spark.implicits._
    df.select($"doc_id", $"tokens").as[(String, Array[Int])]
      .collect().map { case (d, t) => d -> t.toSeq }.toSet
  }

  test("append feed: inserts only, exactly the appended docs, commit id attached") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cf-append").toString
    EncodeJob.run(base, dir, cfg) // snapshot 0
    extra.toDF().write.format("graft").mode("append").save(dir) // snapshot 1

    val feed = ChangeFeed.changesBetween(spark, dir, 0).cache()
    assert(feed.where(col(ChangeFeed.ChangeTypeCol) =!= "insert").count() == 0L)
    assert(feed.select(col(ChangeFeed.CommitSnapshotCol)).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(rows(feed) == rows(extra.toDF))

    // full-history replay: bootstrap inserts at snapshot 0, append at 1
    val full = ChangeFeed.changesBetween(spark, dir, -1)
    assert(rows(full.where(col(ChangeFeed.CommitSnapshotCol) === 0)) == rows(base.toDF))
    assert(rows(full.where(col(ChangeFeed.CommitSnapshotCol) === 1)) == rows(extra.toDF))

    // empty range: from == to, a well-typed empty log
    val empty = ChangeFeed.changesBetween(spark, dir, 1)
    assert(empty.count() == 0L)
    assert(empty.columns.contains(ChangeFeed.ChangeTypeCol))
    feed.unpersist()
  }

  test("delete feed: pre-images of exactly the deleted docs at their prior content") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cf-del").toString
    EncodeJob.run(all, dir, cfg) // snapshot 0
    val doomed = all.where(idx % 5 === 2)
    Deletes.deleteDocs(spark, dir, doomed.select($"doc_id").as[String]): Unit // snapshot 1

    val feed = ChangeFeed.changesBetween(spark, dir, 0).cache()
    assert(feed.where(col(ChangeFeed.ChangeTypeCol) =!= "delete").count() == 0L)
    assert(rows(feed) == rows(doomed.toDF))

    // applying the log to the pre-state yields the post-state
    val pre = spark.read.format("graft").option("snapshot", 0).load(dir)
    val applied = rows(pre) -- rows(feed.where(col(ChangeFeed.ChangeTypeCol) === "delete"))
    assert(applied == rows(spark.read.format("graft").load(dir)))

    // deleting an id with no visible content is not a change
    Deletes.deleteDocs(spark, dir, Seq("no-such-doc").toDS()): Unit // snapshot 2
    assert(ChangeFeed.changesBetween(spark, dir, 1).count() == 0L)
    feed.unpersist()
  }

  test("replace feed: delete(old) + insert(new), the changelog upsert encoding") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cf-repl").toString
    EncodeJob.run(all, dir, cfg) // snapshot 0
    val victims = all.where(idx % 50 === 7).as[TokenRow]
    val replaced = victims.collect().map(r => r.copy(tokens = r.tokens.map(_ + 7)))
    assert(replaced.nonEmpty)
    Deletes.replaceDocs(spark, dir, spark.createDataset(replaced.toIndexedSeq)): Unit // snapshot 1

    val feed = ChangeFeed.changesBetween(spark, dir, 0).cache()
    val del = feed.where(col(ChangeFeed.ChangeTypeCol) === "delete")
    val ins = feed.where(col(ChangeFeed.ChangeTypeCol) === "insert")
    assert(rows(del) == rows(victims.toDF), "pre-images must carry the OLD content")
    assert(
      rows(ins) == replaced.map(r => r.doc_id -> r.tokens.toSeq).toSet,
      "inserts must carry the NEW content"
    )
    // applying delete-then-insert to the pre-state yields the post-state
    val pre = spark.read.format("graft").option("snapshot", 0).load(dir)
    val applied = (rows(pre) -- rows(del)) ++ rows(ins)
    assert(applied == rows(spark.read.format("graft").load(dir)))
    feed.unpersist()
  }

  test("bounds are validated loudly; purged pre-images fail, not lie") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cf-bounds").toString
    EncodeJob.run(all, dir, cfg) // snapshot 0
    val doomed = all.where(idx % 5 === 2)
    Deletes.deleteDocs(spark, dir, doomed.select($"doc_id").as[String]): Unit // snapshot 1

    val e1 = intercept[IllegalArgumentException](ChangeFeed.changesBetween(spark, dir, 9))
    assert(e1.getMessage.contains("fromSnapshot 9 not found"))
    val e2 = intercept[IllegalArgumentException](
      ChangeFeed.changesBetween(spark, dir, 1, toSnapshot = Some(0)))
    assert(e2.getMessage.contains("must go forward"))
    val e3 = intercept[IllegalArgumentException](
      ChangeFeed.changesBetween(spark, dir, 0, toSnapshot = Some(9)))
    assert(e3.getMessage.contains("toSnapshot 9 not found"))

    // purge + vacuum retires the delete file: the range's pre-images are
    // gone — the feed must refuse, not emit an id-less or empty delta
    Maintenance.purgeDeletes(spark, dir): Unit
    Maintenance.vacuum(spark, dir, olderThanMs = 0L): Unit
    val e4 = intercept[Exception](
      ChangeFeed.changesBetween(spark, dir, 0, toSnapshot = Some(1)).count())
    assert(e4.getMessage.contains("coarsened"), e4.getMessage)
  }
}
