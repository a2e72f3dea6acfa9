package graft.tools

import graft.pipeline.Maintenance
import org.apache.spark.sql.SparkSession

/** Operational table maintenance over an EncodeJob outDir — the
  * spark-submit-able face of [[graft.pipeline.Maintenance]] (Iceberg's
  * `rewrite_data_files` / `remove_orphan_files` / `expire_snapshots`
  * procedures for this engine's layout).
  *
  * Usage:
  *   runMain graft.tools.MaintainCli compact     <outDir> [smallFileMB] [targetFileMB]
  *   runMain graft.tools.MaintainCli vacuum      <outDir> [graceMinutes]
  *   runMain graft.tools.MaintainCli expire      <outDir> <keepLast>
  *   runMain graft.tools.MaintainCli manifests   <outDir>
  *   runMain graft.tools.MaintainCli build-content-index <outDir>
  *   runMain graft.tools.MaintainCli build-sig-index <outDir> [shingleN] [k]
  *   runMain graft.tools.MaintainCli dedup-exact <outDir> [incremental]
  *   runMain graft.tools.MaintainCli dedup-near  <outDir> [threshold] [incremental]
  *   runMain graft.tools.MaintainCli decontaminate <outDir> <evalParquet> [n] [delete]
  *   runMain graft.tools.MaintainCli filter-nll  <outDir> <minBptPpm> <maxBptPpm> [delete]
  *
  * `compact` defaults: rewrite files under 32 MB into ~128 MB ones.
  * `vacuum` defaults to a zero grace window (pass minutes in production so
  * in-flight readers planned against the old listing can finish).
  * The curation verbs commit merge-on-read equality deletes (see
  * [[Maintenance.dedupExact]] / [[Maintenance.dedupNear]] /
  * [[Maintenance.decontaminate]]); `decontaminate` without the literal
  * `delete` argument only reports.
  * Exit 0 with a one-line summary; "compact: nothing to do" is success.
  */
object MaintainCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MaintainCli compact|vacuum|expire <outDir> [args]")
    val cmd = args(0)
    val outDir = args(1)
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-maintain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      cmd match {
        case "compact" =>
          val small = (if (args.length > 2) args(2).toLong else 32L) << 20
          val target = (if (args.length > 3) args(3).toLong else 128L) << 20
          Maintenance.compact(spark, outDir, small, target) match {
            case Some(r) =>
              println(
                s"compact: cid=${r.cid} files_removed=${r.filesRemoved} files_added=${r.filesAdded} " +
                  s"bytes_removed=${r.bytesRemoved} bytes_added=${r.bytesAdded} bins_remapped=${r.binsRemapped}"
              )
            case None => println("compact: nothing to do")
          }
        case "vacuum" =>
          val grace = (if (args.length > 2) args(2).toLong else 0L) * 60L * 1000L
          val r = Maintenance.vacuum(spark, outDir, grace)
          println(s"vacuum: data_files_deleted=${r.dataFilesDeleted} dirs_deleted=${r.dirsDeleted}")
        case "manifests" =>
          val r = Maintenance.rewriteManifests(spark, outDir)
          println(
            s"manifests: files_before=${r.filesBefore} files_after=${r.filesAfter} bins=${r.bins}"
          )
        case "expire" =>
          require(args.length > 2, "expire needs <keepLast>")
          val r = Maintenance.expireSnapshots(spark, outDir, args(2).toInt)
          println(
            s"expire: snapshots_expired=[${r.snapshotsExpired.mkString(",")}] " +
              s"rebased_into=${r.rebasedInto.map(_.toString).getOrElse("none")}"
          )
        case "build-content-index" =>
          val live = Maintenance
            .liveBlockFiles(outDir, spark.sparkContext.hadoopConfiguration)
            .map(_._1)
          val e = graft.sources.ContentIndex.ensureStats(spark, outDir, live)
          println(
            s"build-content-index: files_hashed=${e.filesBuilt} " +
              s"files_covered=${e.filesCovered} entries=${e.liveDocs}"
          )
        case "build-sig-index" =>
          val shingleN = if (args.length > 2) args(2).toInt else 4
          val k = if (args.length > 3) args(3).toInt else 64
          val live = Maintenance
            .liveBlockFiles(outDir, spark.sparkContext.hadoopConfiguration)
            .map(_._1)
          val (_, built) =
            graft.sources.SignatureIndex.ensure(spark, outDir, live, shingleN, k)
          println(
            s"build-sig-index: files_signed=$built files_covered=${live.length} " +
              s"dir=${graft.sources.SignatureIndex.dirName(shingleN, k)}"
          )
        case "dedup-exact" =>
          val incremental = args.length > 2 && args(2) == "incremental"
          val r = Maintenance.dedupExact(spark, outDir, incremental = incremental)
          val hashed = if (r.filesHashed < 0L) "" else s" files_hashed=${r.filesHashed}"
          val sameId = if (r.sameIdGroups == 0L) "" else s" same_id_groups=${r.sameIdGroups}"
          println(
            s"dedup-exact: snapshot=${r.snapshotId.map(_.toString).getOrElse("none")} " +
              s"dup_groups=${r.dupGroups} docs_deleted=${r.docsDeleted}$hashed$sameId"
          )
        case "dedup-near" =>
          val rest = args.drop(2)
          val incremental = rest.contains("incremental")
          val fixpoint = rest.contains("fixpoint")
          val threshold = rest
            .filterNot(a => a == "incremental" || a == "fixpoint")
            .headOption.map(_.toDouble).getOrElse(0.7)
          val fix = Maintenance.dedupNearFixpoint(
            spark, outDir, threshold = threshold, incremental = incremental,
            maxPasses = if (fixpoint) 8 else 1)
          val r = fix.passes.last
          val signed = {
            val s = fix.passes.map(_.filesSigned).filter(_ >= 0L)
            if (s.isEmpty) "" else s" files_signed=${s.sum}"
          }
          val trail =
            if (!fixpoint) ""
            else s" passes=${fix.passes.length} pass_deletes=${fix.passes.map(_.docsDeleted).mkString(",")} converged=${fix.converged}"
          println(
            s"dedup-near: snapshot=${r.snapshotId.map(_.toString).getOrElse("none")} " +
              s"n_pairs=${fix.nPairs} n_clusters=${fix.nClusters} docs_deleted=${fix.docsDeleted}$signed$trail"
          )
        case "decontaminate" =>
          require(args.length > 2, "decontaminate needs <evalParquet>")
          val eval = spark.read.parquet(args(2))
          val n = if (args.length > 3) args(3).toInt else 4
          val delete = args.length > 4 && args(4) == "delete"
          val r = Maintenance.decontaminate(spark, outDir, eval, n, delete)
          println(
            s"decontaminate: snapshot=${r.snapshotId.map(_.toString).getOrElse("none")} " +
              s"docs_flagged=${r.docsFlagged} docs_deleted=${r.docsDeleted}"
          )
        case "filter-nll" =>
          require(args.length > 3, "filter-nll needs <minBptPpm> <maxBptPpm>")
          val delete = args.length > 4 && args(4) == "delete"
          val r = Maintenance.filterNll(spark, outDir, args(2).toLong, args(3).toLong, delete)
          println(
            s"filter-nll: snapshot=${r.snapshotId.map(_.toString).getOrElse("none")} " +
              s"docs_flagged=${r.docsFlagged} flagged_low=${r.flaggedLow} " +
              s"flagged_high=${r.flaggedHigh} docs_deleted=${r.docsDeleted}"
          )
        case other => throw new IllegalArgumentException(s"unknown command $other")
      }
    } finally spark.stop()
  }
}
