package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the declared queries this optimization
  * round touched (the plans/r06 deliverable). Usage:
  *   sbt "runMain graft.tools.PlanDump <sfDir> <outDir> [query,query,...]"
  * One `<query>.txt` per query; plan text only, no execution beyond what a
  * query's builder itself runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/plans"
    val wanted: Set[String] =
      if (args.length > 2) args(2).split(",").toSet
      else Set(
        "q_pack_sequences", "q_pack_spans", "q_aux_column", "q_content_index",
        "q_delete_scan", "q_sql_delete_scan", "q_roundtrip_verify", "q_corpus_dedup",
        "q_graft_scan", "q_token_search"
      )
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(
        "spark.sql.extensions",
        "graft.GraftExtensions"
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      graft.SparkEntry.queries.filter(q => wanted(q._1)).foreach { case (name, mk) =>
        try {
          val df = mk(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode
          )
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.txt"),
            plan.getBytes("UTF-8")
          )
          println(s"[plandump] wrote $name")
        } catch {
          case e: Exception =>
            println(s"[plandump] FAILED $name: ${e.getMessage}")
        }
      }
    } finally {
      graft.SparkEntry.releaseCorpora(spark)
      spark.stop()
    }
  }
}
