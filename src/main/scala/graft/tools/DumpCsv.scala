package graft.tools

import graft.pipeline.{EncodeJob, GraftPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CSV dump of an encoded corpus (the reference's `graph read` edge dump,
  * /root/reference/src/main.rs:686-718): decodes the blocks written by
  * EncodeJob and writes (doc_id, pos, token) CSV.
  *
  * Usage: runMain graft.tools.DumpCsv <encodedDir> <csvOutDir> [numContexts] [maxBits]
  */
object DumpCsv {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpCsv <encodedDir> <csvOutDir> [numContexts] [maxBits]")
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tables = EncodeJob
      .loadTables(spark, args(0))
      .getOrElse(sys.error(s"no symbol tables under ${args(0)}/_tables"))
    val cfg = GraftPipeline.Config(numContexts = tables.numContexts, maxBits = tables.maxBits)
    val blocks = EncodeJob.readBlocks(spark, args(0))
    GraftPipeline
      .decode(blocks, spark.sparkContext.broadcast(tables), cfg)
      .select($"doc_id", posexplode($"tokens").as(Seq("pos", "token")))
      .write
      .mode("overwrite")
      .csv(args(1))
    spark.stop()
  }
}
