package graft.pipeline

import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Snapshot tags ([[Refs]]): named pins over the lineage with expiry
  * immunity — create/resolve/drop semantics, both read faces (SQL
  * `VERSION AS OF 'name'` and `option("tag", …)`), the expire_snapshots
  * retention anchor, and the rebin refusal.
  */
class RefsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s
  }
  private def conf = spark.sparkContext.hadoopConfiguration

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 64)
  lazy val input = TokenTables.synthetic(spark, 500L, seed = 57L).cache()

  private def encodedDir(): String = {
    val d = Files.createTempDirectory("graft-refs").toString
    EncodeJob.run(input, d, cfg, onlyBins = Some(Set(0, 1, 2, 3)))
    EncodeJob.run(input, d, cfg, onlyBins = Some(Set(4, 5)))
    EncodeJob.run(input, d, cfg)
    d
  }

  test("create / resolve / list / drop; loud duplicates and bad names") {
    val d = encodedDir()
    Refs.createTag(d, conf, "run-1", 0L)
    Refs.createTag(d, conf, "release_v2", 2L)
    assert(Refs.listTags(d, conf) == Seq(("release_v2", 2L), ("run-1", 0L)))
    assert(Refs.resolve(d, conf, "run-1").contains(0L))
    assert(Refs.resolve(d, conf, "nope").isEmpty)

    val dup = intercept[IllegalStateException](Refs.createTag(d, conf, "run-1", 1L))
    assert(dup.getMessage.contains("already exists"))
    val missing = intercept[IllegalArgumentException](Refs.createTag(d, conf, "x-9", 99L))
    assert(missing.getMessage.contains("not found"))
    intercept[IllegalArgumentException](Refs.createTag(d, conf, "has space", 0L))
    intercept[IllegalArgumentException](Refs.createTag(d, conf, "12345", 0L))
    intercept[IllegalArgumentException](Refs.createTag(d, conf, "../escape", 0L))

    assert(Refs.dropTag(d, conf, "run-1"))
    assert(!Refs.dropTag(d, conf, "run-1"))
    assert(Refs.listTags(d, conf).map(_._1) == Seq("release_v2"))
  }

  test("tag reads equal the pinned snapshot on both faces (option + SQL)") {
    import spark.implicits._
    val d = encodedDir()
    Refs.createTag(d, conf, "mid", 1L)

    val bySnap = spark.read.format("graft").option("snapshot", 1L).load(d).count()
    val byTag = spark.read.format("graft").option("tag", "mid").load(d).count()
    assert(byTag == bySnap && byTag > 0 && byTag < input.count())

    spark.sql("SELECT 1").collect()
    val bySql = spark
      .sql(s"SELECT count(*) FROM graft.`$d` VERSION AS OF 'mid'")
      .head()
      .getLong(0)
    assert(bySql == bySnap)

    // unknown tag names the available ones; double pin refuses
    val e = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM graft.`$d` VERSION AS OF 'ghost'").collect()
    }
    assert(e.getMessage.contains("ghost") && e.getMessage.contains("mid"))
    val both = intercept[Exception] {
      spark.read.format("graft").option("tag", "mid").option("snapshot", 1L).load(d).count()
    }
    assert(both.getMessage.contains("mutually exclusive"))
  }

  test("expire_snapshots never folds a tagged snapshot away") {
    val d = encodedDir() // snapshots 0, 1, 2
    Refs.createTag(d, conf, "keep-me", 1L)

    // requested cut would expire 0 and 1; the tag caps it at snapshot 1
    val res = Maintenance.expireSnapshots(spark, d, keepLast = 1)
    assert(res.snapshotsExpired == Seq(0L))
    assert(EncodeJob.listSnapshotIds(d, conf) == Seq(1L, 2L))

    // the tagged view is intact (snapshot 0's bins folded INTO it)
    val atTag = spark.read.format("graft").option("tag", "keep-me").load(d).count()
    assert(atTag > 0)

    // a further expiry with the tag still present is a no-op…
    assert(Maintenance.expireSnapshots(spark, d, keepLast = 1).snapshotsExpired.isEmpty)
    // …and dropping the tag re-enables it
    Refs.dropTag(d, conf, "keep-me")
    assert(Maintenance.expireSnapshots(spark, d, keepLast = 1).snapshotsExpired == Seq(1L))
  }

  test("a dangling tag neither blocks expiry nor unprotects live tags behind it") {
    val d = encodedDir() // snapshots 0, 1, 2
    val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(conf)
    Refs.createTag(d, conf, "dangling-a", 0L)
    Refs.createTag(d, conf, "live-b", 1L)
    // snapshot 0 disappears out-of-band → tag A dangles; the old min-raw-id
    // cap would have fallen back to the FULL cut and expired live-b's pin
    require(fs.delete(new org.apache.hadoop.fs.Path(s"$d/_snapshots/snap-0.json"), false))

    val res = Maintenance.expireSnapshots(spark, d, keepLast = 1)
    assert(res.snapshotsExpired.isEmpty) // live-b pins snapshot 1, the cut floor
    assert(EncodeJob.listSnapshotIds(d, conf) == Seq(1L, 2L))
  }

  test("destructive paths refuse on an unreadable tag file (strict listing)") {
    val d = encodedDir()
    val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(conf)
    Refs.createTag(d, conf, "ok-tag", 1L)
    val bad = new org.apache.hadoop.fs.Path(s"$d/_refs/bad.json")
    val out = fs.create(bad, true)
    out.write("{not json".getBytes); out.close()

    val e1 = intercept[IllegalStateException](Maintenance.rebin(spark, d, newNumBins = 16))
    assert(e1.getMessage.contains("unreadable"))
    val e2 = intercept[IllegalStateException](Maintenance.expireSnapshots(spark, d, keepLast = 1))
    assert(e2.getMessage.contains("unreadable"))
    // the tolerant read surface still works (bad file skipped)
    assert(Refs.listTags(d, conf).map(_._1) == Seq("ok-tag"))
    fs.delete(bad, false)
    assert(Maintenance.expireSnapshots(spark, d, keepLast = 1).snapshotsExpired == Seq(0L))
  }

  test("rebin refuses while tags exist; SQL procedures drive the lifecycle") {
    val d = encodedDir()
    spark.sql("SELECT 1").collect()
    val created = spark
      .sql(s"CALL graft.system.create_tag(path => '$d', name => 'pre-rebin', snapshot => 2)")
      .head()
    assert(created.getString(0) == "pre-rebin" && created.getLong(1) == 2L)
    assert(
      spark.sql(s"CALL graft.system.tags(path => '$d')").collect().map(_.getString(0)).toSeq ==
        Seq("pre-rebin")
    )

    val e = intercept[IllegalArgumentException](Maintenance.rebin(spark, d, newNumBins = 16))
    assert(e.getMessage.contains("pre-rebin") && e.getMessage.contains("drop the tags"))

    assert(
      spark
        .sql(s"CALL graft.system.drop_tag(path => '$d', name => 'pre-rebin')")
        .head()
        .getBoolean(0)
    )
    assert(Maintenance.rebin(spark, d, newNumBins = 16).isDefined)
    import spark.implicits._
    val decoded = spark.read.format("graft").load(d).as[TokenRow]
    assert(GraftPipeline.verify(input, decoded) == 0L)
  }
}
