package graft.tools

import graft.pipeline.{GraftPipeline, TokenRow, TokenTables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiling of the encode path (dev tool). */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val path = if (args.length > 1) args(1) else "/tmp/graft_bench_synth_60000"
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.props.getOrElse("graft.localdir", "/dev/shm/graft-spark-local"))
      .config("spark.io.compression.codec", sys.props.getOrElse("graft.codec", "lz4"))
      .config("spark.shuffle.file.buffer", sys.props.getOrElse("graft.shufbuf", "32k"))
      .config("spark.sql.files.openCostInBytes", (256L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = GraftPipeline.Config(numContexts = 64, numBins = 128)

    val input = spark.read.parquet(path).as[TokenRow]
    // warmup JIT + codegen
    t("warmup_count")(input.count())
    t("scan_only")(spark.read.parquet(path).select(sum(size($"tokens"))).collect())
    t("deser_tokenrow")(input.map(r => r.tokens.length.toLong).reduce(_ + _))
    t("analyze_1")(GraftPipeline.analyze(input, cfg))
    val hist = t("analyze_2")(GraftPipeline.analyze(input, cfg))
    val tables = spark.sparkContext.broadcast(t("build")(GraftPipeline.buildTables(hist, cfg)))
    t("shuffle_sort_only") {
      input
        .withColumn("bin", GraftPipeline.binCol(cfg.numBins, cfg.salt))
        .repartition(cfg.numBins, $"bin")
        .sortWithinPartitions($"bin", $"source", $"doc_id")
        .select(count(lit(1)))
        .collect()
    }
    for (i <- 1 to 3)
      t(s"encode_full_$i")(
        GraftPipeline.encode(input, tables, cfg).agg(sum($"n_values")).collect()
      )
    // encode without auto-selection (hybrid only)
    t("encode_hybrid_only")(
      GraftPipeline
        .encode(input, tables, cfg.copy(autoSelect = false))
        .agg(sum($"n_values"))
        .collect()
    )
    // staged (shuffle-free) path at two bin granularities: separates the
    // straggler tail (shrinks with finer bins) from true per-job overhead
    for (bins <- Seq(128, 512)) {
      val c = cfg.copy(numBins = bins)
      val p = s"/dev/shm/graft_profile_staged_$bins"
      if (!new java.io.File(p + "/_SUCCESS").exists())
        t(s"stage_$bins")(GraftPipeline.stageBinned(input, c, p))
      for (i <- 1 to 2)
        t(s"encode_staged_${bins}_$i")(
          GraftPipeline.encodeStaged(spark, p, tables, c).agg(sum($"n_values")).collect()
        )
    }
    spark.stop()
  }
}
