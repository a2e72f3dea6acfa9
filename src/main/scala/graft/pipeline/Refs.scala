package graft.pipeline

import graft.core.MiniJson
import graft.core.MiniJson.ObjOps
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Named snapshot references — Iceberg-style TAGS over the snapshot lineage
  * (the reference's single-output world has no analog; this is pure
  * engine-side reproducibility surface). A tag pins a snapshot id under a
  * human name: "the corpus as of training run X" survives as
  * `VERSION AS OF 'run-x'` / `option("tag", "run-x")` instead of a numeric
  * id someone has to log out-of-band, and snapshot expiry REFUSES to fold a
  * tagged snapshot away — the retention contract that makes a tag safe to
  * rely on a year later.
  *
  * Layout: one tiny JSON per tag under `outDir/_refs/<name>.json`
  * ({"name":…,"snapshot_id":…}), committed by atomic EXCLUSIVE create (the
  * same kernel-arbitrated claim the snapshot commit uses —
  * [[EncodeJob.casWriteSnapshot]] documents why rename is wrong on both
  * local and HDFS filesystems). Re-pointing a tag is drop + create, two
  * visible steps by design: silently moving a retention anchor is how
  * "reproducible" runs stop being reproducible. A zero-length file from a
  * crashed create is logically uncommitted: resolution skips it and a
  * re-create may claim the name again.
  *
  * Branches (writable refs) are deliberately NOT offered: the engine's
  * write model is one linear lineage per dir; a branch is a separate dir.
  */
object Refs {

  /** File-name-safe tag names; also keeps `VERSION AS OF` parsing
    * unambiguous (a purely numeric name could shadow a snapshot id, so
    * names must contain at least one non-digit).
    */
  private val NameRe = raw"[A-Za-z0-9._-]{1,128}".r

  private def validate(name: String): Unit = {
    require(
      NameRe.matches(name),
      s"invalid tag name '$name' — use [A-Za-z0-9._-], max 128 chars"
    )
    require(
      name.exists(c => !c.isDigit),
      s"invalid tag name '$name' — purely numeric names would be ambiguous with snapshot ids"
    )
  }

  private def fsOf(outDir: String, conf: Configuration): FileSystem =
    new Path(outDir).getFileSystem(conf)

  private def refPath(outDir: String, name: String) = new Path(s"$outDir/_refs/$name.json")

  /** Tag `name` → snapshot `snapshotId`. The snapshot must exist in the
    * lineage NOW (a tag to a not-yet-committed or already-expired id is an
    * operator mistake surfaced here, not at first read a year later), and
    * the name must be unclaimed — loud failure over silent re-point.
    */
  def createTag(outDir: String, conf: Configuration, name: String, snapshotId: Long): Unit = {
    validate(name)
    val ids = EncodeJob.listSnapshotIds(outDir, conf)
    require(
      ids.contains(snapshotId),
      s"snapshot $snapshotId not found under $outDir/_snapshots (have ${ids.mkString(",")})"
    )
    val fs = fsOf(outDir, conf)
    fs.mkdirs(new Path(s"$outDir/_refs"))
    val dest = refPath(outDir, name)
    // reclaim a zero-length claim from a crashed create (uncommitted)
    if (fs.exists(dest) && fs.getFileStatus(dest).getLen == 0) fs.delete(dest, false): Unit
    // same kernel-arbitrated exclusive-create primitive the snapshot CAS
    // uses (one implementation of the scheme dispatch, not two to drift)
    val out: java.io.OutputStream = EncodeJob
      .exclusiveCreate(fs, dest)
      .getOrElse(
        throw new IllegalStateException(
          s"tag '$name' already exists under $outDir (at snapshot ${resolve(outDir, conf, name).getOrElse(-1L)}) — drop it first"
        )
      )
    try out.write(
      s"""{"name":${MiniJson.render(MiniJson.JStr(name))},"snapshot_id":$snapshotId}"""
        .getBytes(StandardCharsets.UTF_8)
    )
    finally out.close()
  }

  /** Remove a tag; returns false when it did not exist. */
  def dropTag(outDir: String, conf: Configuration, name: String): Boolean = {
    validate(name)
    val fs = fsOf(outDir, conf)
    val p = refPath(outDir, name)
    fs.exists(p) && fs.delete(p, false)
  }

  /** All committed tags, (name, snapshot id), sorted by name. Zero-length
    * files are uncommitted claims and always skipped. With
    * `strict = false`, corrupt non-empty files are skipped too (the
    * read-tolerance the lineage loader applies); DESTRUCTIVE callers —
    * anything about to fold or delete history a tag may pin — must pass
    * `strict = true`, which fails loudly on an unparseable tag instead:
    * proceeding off a partial tag read is exactly how a retention anchor
    * gets silently destroyed (the lineage side guards its own destructive
    * paths the same way, with the records-vs-ids gate).
    */
  def listTags(
      outDir: String,
      conf: Configuration,
      strict: Boolean = false
  ): Seq[(String, Long)] = {
    val fs = fsOf(outDir, conf)
    val dir = new Path(s"$outDir/_refs")
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir)
      .toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json") && st.getLen > 0)
      .flatMap { st =>
        val in = fs.open(st.getPath)
        val txt =
          try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        val parsed = scala.util.Try {
          val o = MiniJson.parseObject(txt, where = st.getPath.toString)
          val n = o
            .strOpt("name")
            .getOrElse(throw new IllegalArgumentException("name absent"))
          require(s"$n.json" == st.getPath.getName, "tag name/file mismatch")
          (n, o.long("snapshot_id"))
        }
        if (strict && parsed.isFailure)
          throw new IllegalStateException(
            s"tag file ${st.getPath} is unreadable (${parsed.failed.get.getMessage}) — " +
              "refusing a destructive operation off a partial tag read; repair or delete the file"
          )
        parsed.toOption
      }
      .sortBy(_._1)
  }

  /** The snapshot a tag points at, if the tag exists. */
  def resolve(outDir: String, conf: Configuration, name: String): Option[Long] =
    listTags(outDir, conf).collectFirst { case (n, id) if n == name => id }

  /** [[resolve]] that fails loudly, naming the available tags. */
  def resolveOrFail(outDir: String, conf: Configuration, name: String): Long =
    resolve(outDir, conf, name).getOrElse {
      val have = listTags(outDir, conf).map(_._1)
      throw new IllegalArgumentException(
        s"tag '$name' not found under $outDir/_refs" +
          (if (have.isEmpty) " (no tags exist)" else s" (have ${have.mkString(", ")})")
      )
    }
}
