package graft.tools

import graft.GraftExtensions
import org.apache.spark.sql.SparkSession

/** One-shot SQL runner over the engine's full SQL surface — the analog of
  * the reference's read/inspect CLIs (/root/reference/src/main.rs:686-718)
  * lifted to SQL:
  *
  *   runMain graft.tools.SqlCli <sfDir> [graft:<encodeOutDir>[@snap|@a..b][?opt=v&…]] -e "<SQL>" [-e "<SQL>"]...
  *
  * `-e` may repeat: statements run in order in ONE session (spark.sql is
  * single-statement), so a temp view created by one feeds the next —
  * e.g. CREATE TEMP VIEW ups AS ... then
  * CALL graft.system.replace_docs(path => ..., source_view => 'ups').
  *
  * Builds the session THROUGH [[GraftExtensions]] (the spark-submit
  * `spark.sql.extensions` path), registers every parquet table under
  * `sfDir` as a view, and — when a `graft:` dir is given — exposes the
  * compressed corpus as view `graft_corpus` via the DSv2 source, so SQL
  * can join raw tables against decoded rows and call `hie_token` /
  * `graft_pack_varint` directly. The `graft` catalog is registered too, so
  * maintenance runs from SQL: `CALL graft.system.compact(path => '<dir>')`
  * (also vacuum / expire_snapshots / rewrite_manifests). Prints the result
  * as TSV; exits non-zero on failure.
  */
object SqlCli {
  def main(args: Array[String]): Unit = {
    val eIdx = args.indexOf("-e")
    require(
      eIdx >= 1 && eIdx < args.length - 1,
      "usage: SqlCli <sfDir> [graft:<encodeOutDir>] -e \"<SQL>\" [-e \"<SQL>\"]..."
    )
    val sfDir = args(0)
    val graftDir = args.slice(1, eIdx).collectFirst {
      case a if a.startsWith("graft:") => a.stripPrefix("graft:")
    }
    // every "-e <SQL>" pair from the first -e on, in order
    val sqls = args
      .drop(eIdx)
      .grouped(2)
      .map { g =>
        require(g.length == 2 && g(0) == "-e", s"expected -e \"<SQL>\" pairs, got ${g.mkString(" ")}")
        g(1)
      }
      .toSeq

    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-sql")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      // maintenance procedures: CALL graft.system.compact/vacuum/
      // expire_snapshots/rewrite_manifests(path => '<encodeOutDir>')
      .config("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val fs = new org.apache.hadoop.fs.Path(sfDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(sfDir))
        .map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .foreach { p =>
          spark.read.parquet(p.toString).createOrReplaceTempView(p.getName.stripSuffix(".parquet"))
        }
      graftDir.foreach { d0 =>
        // graft:<dir>?opt=v&opt2=v2 passes arbitrary DSv2 scan options to
        // the mounted view (sampleDocs / sampleBySource / sampleSeed /
        // containsToken / tag / timestampAsOf, …) — the SQL face of the
        // reader options, e.g. graft:<dir>?sampleBySource=web:0.01,code:1
        // mounts the deterministic training-mix sample. Only a suffix
        // after the LAST '?' whose every '&'-segment is key=value counts,
        // so paths that legitimately contain '?' pass through.
        val kvRe = raw"[A-Za-z][A-Za-z0-9]*=[^&]*".r
        val (d, mountOpts) = d0.lastIndexOf('?') match {
          case i if i > 0 =>
            val segs = d0.substring(i + 1).split("&").toSeq
            if (segs.nonEmpty && segs.forall(s => kvRe.pattern.matcher(s).matches()))
              (d0.substring(0, i), segs.map { s =>
                val j = s.indexOf('='); s.take(j) -> s.drop(j + 1)
              })
            else (d0, Seq.empty[(String, String)])
          case _ => (d0, Seq.empty[(String, String)])
        }
        // graft:<dir>@<snapshot> time-travels to that snapshot's bin set;
        // graft:<dir>@<from>..<to> (and @<from>.. = to latest) mounts the
        // INCREMENTAL read — only the rows snapshots in (from, to] added.
        // Only an all-digit(/range) suffix after the LAST '@' counts, so
        // URIs that legitimately contain '@'
        // (abfss://container@account/...) pass through
        val RangeRe = raw"(\d+)\.\.(\d*)".r
        val (dir, snap, range) = d.lastIndexOf('@') match {
          case i if i > 0 =>
            d.substring(i + 1) match {
              case RangeRe(from, to) =>
                (d.substring(0, i), None, Some((from, if (to.isEmpty) None else Some(to))))
              case s if s.nonEmpty && s.forall(_.isDigit) => (d.substring(0, i), Some(s), None)
              case _                                      => (d, None, None)
            }
          case _ => (d, None, None)
        }
        val reader = spark.read.format("graft")
        mountOpts.foreach { case (k, v) => reader.option(k, v) }
        snap.foreach(reader.option("snapshot", _))
        range.foreach { case (from, to) =>
          reader.option("fromSnapshot", from)
          to.foreach(reader.option("snapshot", _))
        }
        reader.load(dir).createOrReplaceTempView("graft_corpus")
      }
      sqls.foreach { sql =>
        val df = spark.sql(sql)
        println(df.schema.fieldNames.mkString("\t"))
        df.collect().foreach(r => println(r.toSeq.map(String.valueOf).mkString("\t")))
      }
    } finally spark.stop()
  }
}
