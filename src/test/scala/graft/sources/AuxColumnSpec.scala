package graft.sources

import graft.codec.LongCodecs
import graft.pipeline.{EncodeJob, Maintenance, SparkTestBase, TokenTables}
import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[AuxColumn]] — attachable per-document int64 array columns (the
  * "second array column" surface): lossless per-doc codec roundtrip,
  * doc-keyed liveness, latest-attach-wins override, loud mis-key refusal,
  * and the SQL faces.
  */
class AuxColumnSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 64, maxBlockValues = 32768)

  private def freshDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    EncodeJob.run(TokenTables.synthetic(spark, 120L, seed = 77L), d, cfg)
    d
  }

  test("LongCodecs: auto-selection roundtrips the full int64 domain") {
    val cases = Seq(
      Array.emptyLongArray,
      Array(0L),
      Array(Long.MaxValue, Long.MinValue, -1L, 0L, 1L),
      Array.fill(100)(42L),                         // const
      Array.tabulate(100)(i => i * 1000L - 50000L), // monotone -> dvz
      Array.tabulate(100)(i => graft.ops.TextOps.mix64(i.toLong)) // random -> vz
    )
    cases.foreach { vals =>
      val (codec, payload) = LongCodecs.encodeAuto(vals)
      assert(LongCodecs.decode(codec, payload, vals.length).toSeq == vals.toSeq, s"codec=$codec")
    }
    // selection picks the named shapes
    assert(LongCodecs.encodeAuto(Array.fill(50)(7L))._1 == "const")
    assert(LongCodecs.encodeAuto(Array.tabulate(200)(i => 1000000L + i))._1 == "dvz")
  }

  test("attach + read roundtrip; mis-keyed attach refused; liveness is doc-keyed") {
    import spark.implicits._
    val dir = freshDir("graft-aux")
    val docs = spark.read.format("graft").load(dir)
      .select($"doc_id", $"n_tok").as[(String, Int)].collect()

    // deterministic per-token logprob-ish values incl. negatives
    def valsOf(docId: String, n: Int): Array[Long] =
      Array.tabulate(n)(j => -(graft.ops.TextOps.mix64(docId.hashCode.toLong * 31 + j) & 0xffffL))
    val in = docs.toSeq.toDF("doc_id", "n_tok")
      .select($"doc_id", $"n_tok")
      .as[(String, Int)]
      .map { case (d, n) => (d, valsOf(d, n)) }
      .toDF("doc_id", "values")

    val r = AuxColumn.attach(spark, dir, "logprobs", in)
    assert(r.docsAttached == docs.length.toLong)
    assert(r.bytes > 0L)

    val back = AuxColumn.readValues(spark, dir, "logprobs")
      .as[(String, Array[Long])].collect().toMap
    assert(back.size == docs.length)
    docs.foreach { case (d, n) =>
      assert(back(d).toSeq == valsOf(d, n).toSeq, s"doc $d")
    }

    // unknown doc_id refused loudly
    val bad = Seq(("no-such-doc", Array(1L, 2L))).toDF("doc_id", "values")
    val e = intercept[Exception](AuxColumn.attach(spark, dir, "logprobs", bad))
    assert(e.getMessage.contains("not live"), e.getMessage)

    // doc-keyed liveness: delete one doc -> its values disappear, rest stay
    val victim = docs.head._1
    graft.pipeline.Deletes.deleteDocs(spark, dir, Seq(victim).toDS()): Unit
    val after = AuxColumn.readValues(spark, dir, "logprobs")
      .as[(String, Array[Long])].collect().toMap
    assert(!after.contains(victim) && after.size == docs.length - 1)

    // ...and compaction (file names change, docs stay) must NOT drop values
    Maintenance.purgeDeletes(spark, dir): Unit // compact refuses over live deletes
    Maintenance.compact(spark, dir, smallFileBytes = Long.MaxValue / 2,
      targetFileBytes = Long.MaxValue / 2): Unit
    val afterCompact = AuxColumn.readValues(spark, dir, "logprobs")
      .as[(String, Array[Long])].collect().toMap
    assert(afterCompact.keySet == after.keySet, "compaction must not lose aux values")
  }

  test("re-attach overrides per doc, latest attach wins, others untouched") {
    import spark.implicits._
    val dir = freshDir("graft-aux-override")
    val ids = spark.read.format("graft").load(dir)
      .select($"doc_id").as[String].collect().sorted
    val first = ids.toSeq.toDF("doc_id").select($"doc_id",
      expr("array(CAST(1 AS LONG))").as("values"))
    AuxColumn.attach(spark, dir, "score", first): Unit
    // override the first two docs only
    val patch = ids.take(2).toSeq.toDF("doc_id").select($"doc_id",
      expr("array(CAST(2 AS LONG), CAST(3 AS LONG))").as("values"))
    AuxColumn.attach(spark, dir, "score", patch): Unit
    val back = AuxColumn.readValues(spark, dir, "score")
      .as[(String, Array[Long])].collect().toMap
    assert(back(ids(0)).toSeq == Seq(2L, 3L) && back(ids(1)).toSeq == Seq(2L, 3L))
    ids.drop(2).foreach(d => assert(back(d).toSeq == Seq(1L)))
    // two independent columns coexist
    assert(AuxColumn.list(dir, spark.sparkContext.hadoopConfiguration) == Seq("score"))
  }

  test("single-build never-deleted read is a pure sidecar scan: zero exchanges") {
    import spark.implicits._
    val dir = freshDir("graft-aux-plan")
    val in = spark.read.format("graft").load(dir)
      .select($"doc_id", expr("transform(tokens, t -> CAST(t AS LONG))").as("values"))
    AuxColumn.attach(spark, dir, "copy", in): Unit
    val plan = AuxColumn.readValues(spark, dir, "copy").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fast-path read must not shuffle:\n$plan")
    // the corpus mounts as a DSv2 BatchScan; the sidecar is a plain parquet
    // FileScan — a BatchScan in this plan means the corpus was touched
    assert(!plan.contains("BatchScan"), s"fast-path read must not touch the corpus:\n$plan")
  }

  test("SQL faces: attach_column + columns; vacuum sweeps _column_ staging") {
    import spark.implicits._
    val dir = freshDir("graft-aux-sql")
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.read.format("graft").load(dir)
      .select($"doc_id", expr("transform(tokens, t -> CAST(-(t % 97) - 1 AS LONG))").as("values"))
      .createOrReplaceTempView("aux_src")
    val row = spark
      .sql(s"CALL graft.system.attach_column(path => '$dir', name => 'logprobs', source_view => 'aux_src')")
      .head()
    assert(row.getLong(0) > 0L && row.getLong(1) > 0L)
    val cols = spark.sql(s"CALL graft.system.columns(path => '$dir')").collect()
    assert(cols.length == 1 && cols(0).getString(0) == "logprobs")
    assert(cols(0).getLong(1) == row.getLong(0))

    // staging debris under _column_<name> is vacuum's to sweep
    val conf = spark.sparkContext.hadoopConfiguration
    val cdir = new org.apache.hadoop.fs.Path(dir, AuxColumn.dirName("logprobs"))
    val fs = cdir.getFileSystem(conf)
    val debris = new org.apache.hadoop.fs.Path(cdir, ".tmp-crashed")
    fs.mkdirs(debris)
    Maintenance.vacuum(spark, dir, olderThanMs = 0L)
    assert(!fs.exists(debris), "vacuum must sweep .tmp- under _column_ dirs")
    assert(fs.listStatus(cdir).exists(_.getPath.getName.startsWith("col-")), "committed builds stay")
  }
}
