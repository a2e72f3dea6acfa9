package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.UUID

/** The publication/coverage protocol shared by the per-file sidecar indexes
  * ([[ContentIndex]], [[SignatureIndex]]) — one implementation so a protocol
  * fix can never apply to one index and miss the other:
  *
  *   - builds stage under `.tmp-<uuid>/` and publish as ONE atomically
  *     renamed `<prefix><uuid>/` directory of parquet parts (a crash can
  *     never publish half a build; vacuum reclaims dead staging);
  *   - coverage, race detection, and per-file doc counts come from one
  *     aggregate over ONE shared read of the committed builds — the build
  *     id is extracted from `input_file_name()` with a pattern anchored to
  *     the part file's PARENT directory (`…/<indexDir>/<prefix>uuid/part$`),
  *     so no ancestor path segment — even a nested `<indexDir>/<prefix>…`
  *     pair — can alias rows to a phantom build;
  *   - entries of live files dedup ONLY when two builds actually raced
  *     (identical rows; the dedup shuffle is the dominant cost of a covered
  *     re-run, so it must not run unconditionally).
  *
  * Rows must carry `file` (block file name) and `doc_id` (null marks the
  * zero-doc coverage sentinel); any further columns are the index's own.
  */
private[graft] object SidecarProtocol {

  /** Distributed build-coverage report: the (small) uncovered-path list plus
    * live-coverage scalars — everything an `ensure` needs, with the covered
    * NAME SET never materialized on the driver.
    */
  final case class LiveCoverage(
      todoPaths: Array[String],
      filesCovered: Long,
      liveDocs: Long,
      raced: Boolean
  )
}

private[graft] final class SidecarProtocol(val dir: Path, val prefix: String) {

  def fsOf(conf: Configuration): FileSystem = dir.getFileSystem(conf)

  /** Committed build directories (`<prefix><uuid>/`). */
  def builds(conf: Configuration): Array[String] = {
    val fs = fsOf(conf)
    if (!fs.exists(dir)) Array.empty
    else
      fs.listStatus(dir)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .map(_.getPath.toString)
  }

  /** ONE DataFrame over every committed build — share it between
    * [[coverage]] and [[liveEntries]] so an index read lists and
    * schema-reads the build parts once, not per consumer (an object-store
    * listing of ~12k parts is thousands of LIST calls).
    */
  def entriesDf(spark: SparkSession, buildDirs: Array[String]): DataFrame =
    spark.read.parquet(buildDirs.toIndexedSeq: _*)

  /** Per-file coverage from one aggregate over the shared build frame:
    * (file, n_builds covering it, entry rows across all builds — sentinels
    * excluded because count(doc_id) skips nulls). Reads only the
    * file/doc_id/path columns (parquet pruning). The build id anchors at
    * the part file's parent (`<indexDir>/<prefix>uuid/<leaf>$`), immune to
    * ancestor segments that merely look like index dirs.
    */
  def coverage(all: DataFrame): Array[(String, Long, Long)] = {
    val pat = java.util.regex.Pattern.quote(dir.getName) + "/(" +
      java.util.regex.Pattern.quote(prefix) + "[^/]+)/[^/]*$"
    all
      // input_file_name() is non-deterministic: project BEFORE aggregating
      .select(
        col("file"),
        col("doc_id"),
        regexp_extract(input_file_name(), pat, 1).as("_build")
      )
      .groupBy(col("file"))
      .agg(countDistinct(col("_build")).as("n_builds"), count(col("doc_id")).as("n_docs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  /** The BUILD path's coverage view, fully distributed: anti-joins the live
    * (path, name) list against the committed entries' file names and
    * aggregates the live-coverage scalars, returning only the (small)
    * uncovered todo list plus three numbers — never the covered-file set
    * (at an 800k-file corpus that set is ~50–100 MB of driver strings, the
    * exact pattern the manifest file index exists to kill). Per-file docs
    * divide by the builds covering the file (raced builds wrote identical
    * full copies, so integer division is exact); `raced` is live-restricted
    * max(n_builds) > 1 — a race on a dead file cannot force the dedup
    * shuffle on live entries.
    */
  /** @param withDocStats when false, the per-file doc counts (the
    *   `liveDocs` report scalar) are skipped and the aggregate never reads
    *   the doc_id column — at millions of entries that column is the bulk
    *   of the coverage read, and `ensure`-style callers only need the todo
    *   list + raced flag. `liveDocs` is then 0.
    */
  def liveCoverage(
      spark: SparkSession,
      all: DataFrame,
      livePathNames: Seq[(String, String)],
      withDocStats: Boolean = true
  ): SidecarProtocol.LiveCoverage = {
    import spark.implicits._
    val pat = java.util.regex.Pattern.quote(dir.getName) + "/(" +
      java.util.regex.Pattern.quote(prefix) + "[^/]+)/[^/]*$"
    val liveDf = livePathNames.toDF("path", "file")
    val perFile = (if (withDocStats)
                     all
                       // input_file_name() is non-deterministic: project BEFORE aggregating
                       .select(
                         col("file"),
                         col("doc_id"),
                         regexp_extract(input_file_name(), pat, 1).as("_build")
                       )
                   else
                     all.select(
                       col("file"),
                       lit(null).cast("string").as("doc_id"),
                       regexp_extract(input_file_name(), pat, 1).as("_build")
                     ))
      .groupBy(col("file"))
      .agg(countDistinct(col("_build")).as("n_builds"), count(col("doc_id")).as("n_docs"))
    // no broadcast hint: left-outer/anti cannot build on the preserved
    // side, and both inputs are already O(files) rows (entries collapsed
    // by the aggregate above) — a plain shuffled join is the scale-safe plan
    val joined = liveDf
      .join(perFile, Seq("file"), "left_outer")
      .select(col("path"), col("n_builds"), col("n_docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val todo = joined.where(col("n_builds").isNull).select("path").as[String].collect()
      val r = joined
        .where(col("n_builds").isNotNull)
        .agg(
          count(lit(1)),
          coalesce(sum(expr("n_docs div n_builds")), lit(0L)),
          coalesce(max(col("n_builds")), lit(0L))
        )
        .head()
      SidecarProtocol.LiveCoverage(todo, r.getLong(0), r.getLong(1), r.getLong(2) > 1L)
    } finally joined.unpersist(): Unit
  }

  /** Entry rows restricted to `liveNames` (broadcast-joined, never an
    * 800k-term In-list), projected to `outCols`, deduped on (file, doc_id)
    * only when `raced`.
    */
  def liveEntries(
      spark: SparkSession,
      all: DataFrame,
      liveNames: Set[String],
      raced: Boolean,
      outCols: Seq[String]
  ): DataFrame = {
    import spark.implicits._
    // explicit broadcast: the name set is bounded by the file count (the
    // scale the driver already holds), and past the 10 MB auto threshold a
    // silent fallback would shuffle the ENTIRE entry frame for this join
    val namesDf = broadcast(liveNames.toSeq.toDF("file"))
    val joined = all
      .where(col("doc_id").isNotNull)
      .join(namesDf, "file")
    (if (raced) joined.dropDuplicates("file", "doc_id") else joined)
      .select(outCols.map(col): _*)
  }

  /** Write `entries` as one staged build and publish it with a single
    * atomic directory rename.
    */
  def publish(conf: Configuration, entries: DataFrame): Unit = {
    val fs = fsOf(conf)
    fs.mkdirs(dir): Unit
    val uuid = UUID.randomUUID().toString
    val stage = new Path(dir, s".tmp-$uuid")
    entries.write.parquet(stage.toString)
    require(
      fs.rename(stage, new Path(dir, s"$prefix$uuid")),
      s"failed to publish sidecar build $stage"
    )
  }

  /** Bound the part count of a build: decode keeps one task per input file;
    * only the computed entry rows shuffle down (~64 input files per part, so
    * an 800k-file corpus indexes into ~12k parts).
    */
  def partsFor(todoFiles: Int): Int = math.max(1, math.min(4096, todoFiles / 64))

  /** Vacuum hook: reclaim `.tmp-` staging older than `cutoff` plus legacy
    * flat `<prefix>*.parquet` files from the pre-build-dir layout (the
    * current reader lists build DIRECTORIES only, so flat files are dead
    * weight — deleting them forces at worst a re-hash of their files).
    * Returns (dirs deleted, files deleted).
    */
  def sweep(conf: Configuration, cutoff: Long): (Int, Int) = {
    val fs = fsOf(conf)
    if (!fs.exists(dir)) return (0, 0)
    var dirs = 0
    var files = 0
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(".tmp-") && st.getModificationTime <= cutoff) {
        if (fs.delete(st.getPath, true)) dirs += 1
      } else if (st.isFile && n.startsWith(prefix) && n.endsWith(".parquet") &&
        st.getModificationTime <= cutoff) {
        if (fs.delete(st.getPath, false)) files += 1
      }
    }
    (dirs, files)
  }
}
