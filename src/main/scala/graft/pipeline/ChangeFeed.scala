package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level change log between two snapshots — the CDC companion to the
  * incremental read (`option("fromSnapshot", s)` returns only the ADDED
  * rows; a consumer that also mirrors deletions needs the delete half).
  * The Iceberg changelog-scan / Delta CDF shape, derived entirely from the
  * existing lineage:
  *
  *   - every snapshot in (from, to] that added bins/files contributes its
  *     rows as `_change_type = 'insert'` (planned by the same shared delta
  *     planner the streaming source and `fromSnapshot` use);
  *   - every snapshot that committed equality deletes contributes the
  *     deleted rows' PRE-IMAGES as `_change_type = 'delete'` — the content
  *     visible at the snapshot's parent, read through ordinary bin-pruned
  *     time travel + a doc_id join (an id with no prior visible content
  *     emits nothing: deleting an absent doc is not a change);
  *   - a replace (delete + append in ONE snapshot,
  *     [[Deletes.replaceDocs]]) therefore emits delete(old) + insert(new),
  *     the standard changelog encoding of an upsert.
  *
  * `_commit_snapshot` carries the committing snapshot id so consumers can
  * apply the log in order (within one snapshot, apply deletes before
  * inserts — `'delete' < 'insert'` lexicographically, so sorting by
  * (_commit_snapshot, _change_type) is sufficient).
  *
  * Everything stays a distributed DataFrame — one graft scan per changed
  * snapshot in the range, each bin-pruned/file-delta-planned to the
  * snapshot's own rows, so cost scales with the CHANGED data, not the
  * corpus (ranges are poll-sized in practice; a from = -1 full-history
  * replay plans one scan per snapshot). Maintenance interplay follows the
  * engine's coarsens-history stance: a pre-image whose deletes were purged,
  * or a range whose appended files were compacted away, fails loudly
  * rather than emitting a wrong or partial log. There is deliberately no
  * collecting SQL procedure for this (a changelog can be corpus-sized;
  * the DataFrame face keeps it distributed) — SQL users compose the same
  * result from `VERSION AS OF` + the fromSnapshot read option.
  */
object ChangeFeed {

  val ChangeTypeCol = "_change_type"
  val CommitSnapshotCol = "_commit_snapshot"

  /** Changes committed by snapshots in (fromSnapshot, toSnapshot]; `-1`
    * replays from before history, `toSnapshot = None` reads to the latest
    * snapshot. Bounds must exist in the lineage and go forward — a
    * mis-typed range errors instead of returning an empty log.
    */
  def changesBetween(
      spark: SparkSession,
      outDir: String,
      fromSnapshot: Long,
      toSnapshot: Option[Long] = None
  ): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val recs = EncodeJob.loadSnapshotRecords(outDir, conf)
    require(recs.nonEmpty, s"$outDir has no committed snapshots")
    val ids = recs.map(_.id)
    val end = toSnapshot.getOrElse(ids.max)
    require(
      fromSnapshot == -1L || ids.contains(fromSnapshot),
      s"fromSnapshot $fromSnapshot not found under $outDir/_snapshots (have ${ids.mkString(",")})"
    )
    require(
      ids.contains(end),
      s"toSnapshot $end not found under $outDir/_snapshots (have ${ids.mkString(",")})"
    )
    require(
      end >= fromSnapshot,
      s"fromSnapshot $fromSnapshot is newer than toSnapshot $end — a change range must go forward"
    )

    val fs = new Path(outDir).getFileSystem(conf)
    val inRange = recs.filter(r => r.id > fromSnapshot && r.id <= end)
    val parts: Seq[DataFrame] = inRange.flatMap { r =>
      // parent = the previous committed snapshot (time-travel target for
      // pre-images); None only for the very first snapshot in history
      val parent = recs.takeWhile(_.id < r.id).lastOption.map(_.id)
      val deletes: Option[DataFrame] =
        if (r.deletesAdded.isEmpty || parent.isEmpty) None
        else {
          val files = r.deletesAdded.map { case (name, _) =>
            val p = new Path(s"$outDir/_deletes/$name")
            require(
              fs.exists(p),
              s"delete file $name of snapshot ${r.id} no longer exists — a purge + vacuum " +
                "retired it, so this range's pre-images are unreachable (maintenance " +
                "coarsened the readable history); replay from a later fromSnapshot"
            )
            p.toString
          }
          val delIds = spark.read.parquet(files: _*).select(col("doc_id")).distinct()
          val preImage = spark.read
            .format("graft")
            .option("snapshot", parent.get)
            .load(outDir)
            .join(delIds, Seq("doc_id"))
          Some(
            preImage
              .withColumn(ChangeTypeCol, lit("delete"))
              .withColumn(CommitSnapshotCol, lit(r.id))
          )
        }
      val inserts: Option[DataFrame] =
        if (r.binsAdded.isEmpty && r.filesAdded.isEmpty) None
        else
          Some(
            spark.read
              .format("graft")
              .option("fromSnapshot", parent.getOrElse(-1L))
              .option("snapshot", r.id)
              .load(outDir)
              .withColumn(ChangeTypeCol, lit("insert"))
              .withColumn(CommitSnapshotCol, lit(r.id))
          )
      deletes.toSeq ++ inserts.toSeq
    }

    parts.reduceOption(_ unionByName _).getOrElse {
      import spark.implicits._
      spark
        .emptyDataset[TokenRow]
        .toDF()
        .withColumn(ChangeTypeCol, lit(""))
        .withColumn(CommitSnapshotCol, lit(0L))
        .where(lit(false))
    }
  }
}
