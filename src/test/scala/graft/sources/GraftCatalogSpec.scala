package graft.sources

import graft.pipeline.GraftPipeline.Config
import graft.pipeline.{EncodeJob, GraftPipeline, Maintenance, SparkTestBase, TokenRow, TokenTables}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The SQL procedure surface: `CALL graft.system.<proc>(...)` must run the
  * same maintenance the programmatic API runs, return its result as a row,
  * and leave decoded content bit-identical.
  */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 128, maxBlockValues = 32768)
  lazy val input = TokenTables.synthetic(spark, 600L, seed = 31L).cache()

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-catalog").toString
    // three incremental runs -> several small block files to maintain
    EncodeJob.run(input, d, cfg, onlyBins = Some(Set(0, 1, 2)))
    EncodeJob.run(input, d, cfg, onlyBins = Some(Set(3, 4, 5)))
    EncodeJob.run(input, d, cfg)
    d
  }

  private def lossless(dir: String): Unit = {
    import spark.implicits._
    val decoded = spark.read.format("graft").load(dir).as[TokenRow]
    assert(GraftPipeline.verify(input, decoded) == 0L)
  }

  test("CALL compact + vacuum: one rewritten file, dead inputs reclaimed, content intact") {
    val dir = freshDir()
    val conf = spark.sparkContext.hadoopConfiguration
    val before = Maintenance.liveBlockFiles(dir, conf).length
    assert(before >= 3)

    val row = spark
      .sql(s"CALL graft.system.compact(path => '$dir', small_file_bytes => ${Long.MaxValue / 2}, " +
        s"target_file_bytes => ${Long.MaxValue / 2})")
      .head()
    assert(row.getAs[Int]("files_removed") == before)
    assert(row.getAs[Int]("files_added") == 1)
    assert(row.getAs[Int]("bins_remapped") == cfg.numBins)
    lossless(dir)

    val vac = spark.sql(s"CALL graft.system.vacuum(path => '$dir')").head()
    assert(vac.getAs[Int]("data_files_deleted") == before)
    assert(Maintenance.liveBlockFiles(dir, conf).length == 1)
    lossless(dir)

    // second compact is a no-op below min_input_files: null id, zero counts
    val noop = spark.sql(s"CALL graft.system.compact(path => '$dir')").head()
    assert(noop.isNullAt(noop.fieldIndex("compaction_id")) && noop.getAs[Int]("files_removed") == 0)
  }

  test("CALL expire_snapshots + rewrite_manifests report the fold and consolidation") {
    val dir = freshDir()
    val conf = spark.sparkContext.hadoopConfiguration
    assert(EncodeJob.listSnapshotIds(dir, conf) == Seq(0L, 1L, 2L))

    val exp = spark.sql(s"CALL graft.system.expire_snapshots(path => '$dir', keep_last => 1)").head()
    assert(exp.getAs[Int]("snapshots_expired") == 2)
    assert(exp.getAs[Long]("oldest_expired") == 0L)
    assert(exp.getAs[Long]("rebased_into") == 2L)
    assert(EncodeJob.listSnapshotIds(dir, conf) == Seq(2L))
    lossless(dir)

    val rw = spark.sql(s"CALL graft.system.rewrite_manifests(path => '$dir')").head()
    assert(rw.getAs[Int]("files_before") >= 3 && rw.getAs[Int]("files_after") == 1)
    assert(rw.getAs[Long]("bins") == cfg.numBins.toLong)
    lossless(dir)
  }

  test("CALL delete_docs + purge_deletes: SQL-only delete lifecycle, content filtered") {
    import spark.implicits._
    val dir = freshDir()
    val victims = input.limit(7).select($"doc_id").as[String].collect()
    val idsSql = victims.map(v => s"'$v'").mkString("array(", ", ", ")")

    val del = spark
      .sql(s"CALL graft.system.delete_docs(path => '$dir', doc_ids => $idsSql)")
      .head()
    assert(del.getAs[Long]("ids_recorded") == victims.length.toLong)
    val want = input.where(!$"doc_id".isin(victims.toSeq: _*))
    assert(GraftPipeline.verify(want, spark.read.format("graft").load(dir).as[TokenRow]) == 0L)

    val purge = spark.sql(s"CALL graft.system.purge_deletes(path => '$dir')").head()
    assert(purge.getAs[Long]("ids_applied") == victims.length.toLong)
    assert(purge.getAs[Int]("delete_files_applied") == 1)
    assert(GraftPipeline.verify(want, spark.read.format("graft").load(dir).as[TokenRow]) == 0L)

    // nothing left to purge: null compaction id
    val noop = spark.sql(s"CALL graft.system.purge_deletes(path => '$dir')").head()
    assert(noop.isNullAt(noop.fieldIndex("compaction_id")))
  }

  test("listProcedures enumerates the system namespace (no SHOW PROCEDURES in this Spark)") {
    spark.sql("SELECT 1").collect() // force catalog registration path
    val cat = spark.sessionState.catalogManager
      .catalog("graft")
      .asInstanceOf[GraftCatalog]
    assert(cat.listProcedures(Array("system")).map(_.name()).sorted.toSeq ==
      Seq("compact", "delete_docs", "expire_snapshots", "purge_deletes", "rewrite_manifests", "vacuum"))
    assert(cat.listProcedures(Array("nope")).isEmpty)
  }

  test("unknown procedure and bad namespace fail with a named error") {
    val e = intercept[Exception](spark.sql("CALL graft.system.frobnicate(path => '/x')").collect())
    assert(e.getMessage.contains("frobnicate"))
    // Spark wraps the catalog's IllegalArgumentException into its generic
    // FAILED_TO_LOAD_ROUTINE error naming the full routine path
    val ns = intercept[Exception](spark.sql("CALL graft.other.compact(path => '/x')").collect())
    assert(ns.getMessage.contains("`graft`.`other`.`compact`"))
  }
}
