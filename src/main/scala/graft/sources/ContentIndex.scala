package graft.sources

import graft.ops.XHash
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.UUID

/** One per-document row of the content index (`_content_index/cix-*.parquet`).
  * Top-level for the Dataset encoder. A `doc_id = null` row is the coverage
  * sentinel for a zero-doc file (excluded from hashing, counted as covered).
  */
final case class ContentIndexRow(
    file: String,
    doc_id: String,
    n_tok: Int,
    h1: Long,
    h2: Long
)

/** The CONTENT INDEX — per-document 124-bit content keys
  * ((graft_token_fold seed 0, seed 1), n_tok) persisted as an incremental
  * sidecar, so exact dedup over an append-mostly corpus decodes only the
  * files added since the last run instead of re-reading 100 TB.
  *
  * Shape mirrors [[TokenIndex]]: file names are immutable identities, so
  * coverage is per FILE — a build hashes exactly the live files no
  * committed cix entry covers (one task per file, whole-file decode through
  * the scan's codec dispatch, doc_ids from the lightweight string stream),
  * publishes by staged rename, and never rewrites. Consumers filter entries
  * to the CURRENT live file set (entries of compacted-away files are
  * ignored; the rewritten files index on the next run) and to the CURRENT
  * live doc set (deleted docs' entries persist harmlessly — liveness comes
  * from the metadata-only doc_id scan at use time). Staleness therefore
  * costs extra hashing, never wrong answers; the hash values themselves are
  * pinned equal to the codegen'd `graft_token_fold` expression by spec.
  *
  * At 100 TB: index bytes ≈ 50 B/doc (~50 GB for 10^12 docs — itself a
  * modest parquet table read distributed, never driver-side; only the
  * covered-file NAME set is collected, the same O(files) scale the manifest
  * index already carries).
  */
object ContentIndex {

  val DirName = "_content_index"

  /** The per-row fold — EXACTLY `graft_token_fold(tokens, seed)` over the
    * stored (non-null) token values; pinned equal to the expression by
    * ContentIndexSpec.
    */
  def foldRow(values: Array[Int], from: Int, until: Int, seed: Long): Long = {
    var h = XHash.mix62((XHash.FnvInit ^ seed) & XHash.Mask62)
    var i = from
    while (i < until) {
      h = XHash.fnvStep(h, values(i).toLong & 0xffffffffL)
      i += 1
    }
    XHash.mix62(h)
  }

  private def ixDirOf(outDir: String) = new Path(outDir, DirName)
  private def nameOf(file: String): String = new Path(file).getName

  /** Drop the whole index (coverage resets; the next ensure re-hashes every
    * live file). Returns whether an index existed.
    */
  def dropIndex(outDir: String, conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val dir = ixDirOf(outDir)
    val fs = dir.getFileSystem(conf)
    fs.exists(dir) && fs.delete(dir, true)
  }

  /** Committed index entries restricted to `liveNames`, plus the covered
    * file-name set (over ALL committed entries — a dead file's coverage is
    * irrelevant, so the caller intersects with its own live list).
    * Returns (None, empty) when no index exists.
    */
  def rows(
      spark: SparkSession,
      outDir: String,
      liveNames: Set[String]
  ): (Option[DataFrame], Set[String]) = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = ixDirOf(outDir).getFileSystem(conf)
    val dir = ixDirOf(outDir)
    if (!fs.exists(dir)) return (None, Set.empty)
    // each committed BUILD is one atomically-renamed cix-<uuid>/ directory
    // of parquet parts (so a crash can never publish half a build)
    val buildDirs = fs
      .listStatus(dir)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cix-"))
      .map(_.getPath.toString)
    if (buildDirs.isEmpty) return (None, Set.empty)
    val all = spark.read.parquet(buildDirs.toIndexedSeq: _*)
    // one aggregate pass yields coverage AND race detection: a file covered
    // by >1 build dir (two concurrent first-builds) has duplicate entries
    // input_file_name() is non-deterministic: project it BEFORE aggregating
    val cov = all
      .select(col("file"), regexp_extract(input_file_name(), "/(cix-[^/]+)/", 1).as("_build"))
      .groupBy(col("file"))
      .agg(countDistinct(col("_build")).as("n_builds"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val covered = cov.map(_._1).toSet
    val raced = cov.exists(_._2 > 1L)
    // the live-name restriction joins (never an 800k-term In-list).
    // `file` stays in the output: consumers needing exact liveness under
    // sequence-scoped deletes join on (file, doc_id) against the scan's
    // `_file` metadata column — per-file liveness is what the scan itself
    // evaluates, so a doc deleted from an old file but re-appended in a new
    // one keeps exactly its new entry.
    val namesDf = liveNames.toSeq.toDF("file")
    val joined = all
      .where(col("doc_id").isNotNull)
      .join(namesDf, "file")
    // racing builds wrote identical rows — dedup ONLY when one actually
    // happened (the shuffle is the dominant cost of a covered re-run)
    val live = (if (raced) joined.dropDuplicates("file", "doc_id") else joined)
      .select(col("file"), col("doc_id"), col("n_tok"), col("h1"), col("h2"))
    (Some(live), covered)
  }

  /** Hash `todo` block files (full paths) and publish their cix entries.
    * One DECODE task per file, coalesced to ~64-file parquet parts (an
    * 800k-file corpus indexes into ~12k parts, not 800k), then ONE atomic
    * directory rename publishes the whole build — a crash leaves `.tmp-*`
    * staging that vacuum reclaims, never a half-visible build.
    */
  def buildFor(spark: SparkSession, outDir: String, todo: Array[String]): Long = {
    if (todo.isEmpty) return 0L
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = ixDirOf(outDir).getFileSystem(conf)
    fs.mkdirs(ixDirOf(outDir)): Unit
    val meta = GraftMeta.load(outDir, conf)
    val bMeta = spark.sparkContext.broadcast(
      (meta.headerBytes, meta.maxBits, meta.numContexts, meta.contextModel)
    )
    val sConf = new SerializableHadoopConf(conf)
    val entries = spark.sparkContext
      .parallelize(todo.toIndexedSeq, todo.length)
      .flatMap { file =>
        val (headerBytes, maxBits, numContexts, modelName) = bMeta.value
        hashOneFile(file, sConf, headerBytes, maxBits, numContexts, modelName)
      }
      .toDS()
      // repartition, not coalesce: the decode keeps one task per file (full
      // parallelism); only the computed ~50 B/doc entry rows shuffle down
      // to a bounded part count
      .repartition(math.max(1, math.min(4096, todo.length / 64)))

    val uuid = UUID.randomUUID().toString
    val stage = new Path(ixDirOf(outDir), s".tmp-$uuid")
    entries.write.parquet(stage.toString)
    // drop the _SUCCESS marker etc.? parquet readers ignore non-parquet
    // files; rename the STAGE DIR as the committed build (atomic)
    require(
      fs.rename(stage, new Path(ixDirOf(outDir), s"cix-$uuid")),
      s"failed to publish content-index build $stage"
    )
    todo.length.toLong
  }

  /** Ensure every name in `live` is covered, hashing only the uncovered
    * files; returns (live entry rows, filesHashed).
    */
  def ensure(
      spark: SparkSession,
      outDir: String,
      live: Array[String]
  ): (DataFrame, Long) = {
    import spark.implicits._
    val liveNames = live.map(nameOf).toSet
    val (rows0, covered0) = rows(spark, outDir, liveNames)
    val todo = live.filter(f => !covered0.contains(nameOf(f)))
    if (todo.isEmpty) {
      // fully covered — the common re-run: no build, no second index read
      val entries = rows0.getOrElse(
        spark
          .emptyDataset[ContentIndexRow]
          .select(col("file"), col("doc_id"), col("n_tok"), col("h1"), col("h2"))
      )
      return (entries, 0L)
    }
    val built = buildFor(spark, outDir, todo)
    val (liveRows, covered) = rows(spark, outDir, liveNames)
    val missing = liveNames -- covered
    require(missing.isEmpty, s"content index build left ${missing.size} live files uncovered")
    (liveRows.get, built)
  }

  private def hashOneFile(
      file: String,
      sConf: SerializableHadoopConf,
      headerBytes: Array[Byte],
      maxBits: Int,
      numContexts: Int,
      modelName: String
  ): Seq[ContentIndexRow] = {
    val name = nameOf(file)
    val out = Seq.newBuilder[ContentIndexRow]
    val any = BlockFileScan.foreachRow(file, sConf, headerBytes, maxBits, numContexts, modelName) {
      (docId, nTok, values, from, until) =>
        out += ContentIndexRow(
          name,
          docId,
          nTok,
          foldRow(values, from, until, 0L),
          foldRow(values, from, until, 1L)
        )
    }
    if (!any) Seq(ContentIndexRow(name, null, -1, 0L, 0L)) // coverage sentinel
    else out.result()
  }
}
