package graft.sources

import graft.pipeline.{EncodeJob, Maintenance, SparkTestBase, TokenRow, TokenTables}
import graft.pipeline.GraftPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[ContentIndex]] — the persistent per-document content-hash sidecar that
  * makes exact dedup incremental: entries must pin the codegen'd
  * `graft_token_fold` values exactly (the full-scan and incremental dedup
  * paths must be indistinguishable), coverage must be per-file incremental
  * (a re-run hashes nothing; an append hashes only the new files), and the
  * verb surface ([[Maintenance.dedupExact]] incremental, the SQL procedure,
  * vacuum debris reclaim) must compose with deletes and compaction.
  */
class ContentIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val cfg = Config(numContexts = 16, numBins = 8, maxBlockRows = 64, maxBlockValues = 32768)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def foldsOf(rows: Seq[TokenRow]): Set[(String, Int, Long, Long)] = {
    import spark.implicits._
    // the EXPRESSION is the pinned truth: compare index entries against the
    // codegen'd graft_token_fold, not a spec-local reimplementation
    spark
      .createDataset(rows)
      .select(
        col("doc_id"),
        col("n_tok"),
        graft.functions.TokenFold.token_fold(col("tokens"), 0L).as("h1"),
        graft.functions.TokenFold.token_fold(col("tokens"), 1L).as("h2")
      )
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def entriesOf(df: org.apache.spark.sql.DataFrame): Set[(String, Int, Long, Long)] =
    df.select("doc_id", "n_tok", "h1", "h2")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("entries pin graft_token_fold per doc; rebuild covers nothing; append hashes only new files") {
    import spark.implicits._
    val input = TokenTables.synthetic(spark, 150L, seed = 91L)
    val rows = input.collect().toSeq
    val dir = freshDir("graft-cix")
    EncodeJob.run(input, dir, cfg)
    val conf = spark.sparkContext.hadoopConfiguration
    val live0 = Maintenance.liveBlockFiles(dir, conf).map(_._1)

    val (e1, built1) = ContentIndex.ensure(spark, dir, live0)
    assert(built1 == live0.length.toLong, "first build must hash every live file")
    assert(entriesOf(e1) == foldsOf(rows))

    // coverage is persistent: a second ensure decodes NOTHING
    val (e2, built2) = ContentIndex.ensure(spark, dir, live0)
    assert(built2 == 0L)
    assert(entriesOf(e2) == foldsOf(rows))

    // DSv2 append commits new block files; ensure hashes exactly those
    val extra = rows.take(5).map(r => r.copy(doc_id = s"zz-app-${r.doc_id}"))
    spark.createDataset(extra).write.format("graft").mode("append").save(dir)
    val live1 = Maintenance.liveBlockFiles(dir, conf).map(_._1)
    assert(live1.length > live0.length)
    val (e3, built3) = ContentIndex.ensure(spark, dir, live1)
    assert(built3 == (live1.length - live0.length).toLong, "append must hash only the new files")
    assert(entriesOf(e3) == foldsOf(rows ++ extra))

    // the `_file` metadata column names exactly the live block files, and
    // entry (file, doc) pairs agree with the scan's own attribution
    val scanPairs = spark.read
      .format("graft")
      .load(dir)
      .select(col("_file"), col("doc_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    // subset, not equality: a zero-doc block file is live but emits no rows
    // (the index covers it with its doc_id-null sentinel)
    assert(scanPairs.map(_._1).subsetOf(live1.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet))
    assert(scanPairs.map(_._1).size >= live1.length - 1)
    val entryPairs = e3
      .select("file", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(entryPairs == scanPairs)
  }

  test("incremental dedupExact: index-driven hashes, same survivors, idempotent, compaction-safe") {
    import spark.implicits._
    val base = TokenTables.synthetic(spark, 200L, seed = 77L).collect().toSeq
    val dir = freshDir("graft-cix-dedup")
    EncodeJob.run(spark.createDataset(base), dir, cfg)
    val conf = spark.sparkContext.hadoopConfiguration

    // prime the index on the pre-append corpus
    val (_, built0) =
      ContentIndex.ensure(spark, dir, Maintenance.liveBlockFiles(dir, conf).map(_._1))
    assert(built0 > 0L)

    // append planted duplicates (keeper must be a copy for one group)
    val dup = Seq(
      base(3).copy(doc_id = s"aa-copy-${base(3).doc_id}"),
      base(9).copy(doc_id = s"zz-copy-${base(9).doc_id}")
    )
    spark.createDataset(dup).write.format("graft").mode("append").save(dir)
    val liveAll = Maintenance.liveBlockFiles(dir, conf).map(_._1)

    val all = base ++ dup
    val survivors = all
      .groupBy(r => (r.tokens.toSeq, r.n_tok))
      .values
      .map(_.map(_.doc_id).min)
      .toSet
    assert(all.size - survivors.size >= 2, "fixture must plant losers")

    val r = Maintenance.dedupExact(spark, dir, incremental = true)
    assert(r.snapshotId.nonEmpty)
    assert(r.filesHashed > 0L && r.filesHashed < liveAll.length.toLong,
      s"must hash only the appended files, got ${r.filesHashed} of ${liveAll.length}")
    assert(r.docsDeleted == (all.size - survivors.size).toLong)
    val after = spark.read.format("graft").load(dir)
    assert(after.select("doc_id").collect().map(_.getString(0)).toSet == survivors)
    assert(survivors.exists(_.startsWith("aa-copy-")))
    assert(!survivors.exists(_.startsWith("zz-copy-")))

    // idempotent: deleted docs' persisted entries are filtered by doc
    // liveness, so a second incremental run hashes nothing and finds nothing
    val r2 = Maintenance.dedupExact(spark, dir, incremental = true)
    assert(r2.snapshotId.isEmpty && r2.dupGroups == 0L && r2.filesHashed == 0L)

    // compaction rewrites files under new names: stale entries are ignored,
    // the rewritten files re-hash, and the survivor set is unchanged
    // (purge first — compact refuses to run across live equality deletes)
    assert(Maintenance.purgeDeletes(spark, dir).nonEmpty)
    val c = Maintenance.compact(
      spark, dir,
      smallFileBytes = Long.MaxValue / 2, targetFileBytes = Long.MaxValue / 2
    )
    assert(c.exists(_.filesRemoved > 0), "compaction under test must engage")
    val r3 = Maintenance.dedupExact(spark, dir, incremental = true)
    assert(r3.snapshotId.isEmpty && r3.dupGroups == 0L && r3.filesHashed > 0L)
    assert(
      spark.read.format("graft").load(dir)
        .select("doc_id").collect().map(_.getString(0)).toSet == survivors
    )
  }

  test("differential: incremental and full-scan dedupExact agree across seeds") {
    import spark.implicits._
    for (seed <- Seq(101L, 202L, 303L)) {
      val base = TokenTables.synthetic(spark, 70L, seed = seed).collect().toSeq
      val planted = Seq(
        base(2).copy(doc_id = s"aa-$seed-${base(2).doc_id}"),
        base(5).copy(doc_id = s"zz-$seed-${base(5).doc_id}")
      )
      val all = base ++ planted
      val dirFull = freshDir(s"cix-diff-full-$seed")
      val dirIncr = freshDir(s"cix-diff-incr-$seed")
      EncodeJob.run(spark.createDataset(all), dirFull, cfg)
      EncodeJob.run(spark.createDataset(all), dirIncr, cfg)
      val rFull = Maintenance.dedupExact(spark, dirFull)
      val rIncr = Maintenance.dedupExact(spark, dirIncr, incremental = true)
      assert(rIncr.dupGroups == rFull.dupGroups && rIncr.docsDeleted == rFull.docsDeleted,
        s"seed $seed: $rIncr != $rFull")
      def kept(d: String) = spark.read.format("graft").load(d)
        .select("doc_id").collect().map(_.getString(0)).toSet
      assert(kept(dirIncr) == kept(dirFull), s"seed $seed: survivor sets differ")
    }
  }

  test("racing builds: double coverage is detected and entries dedupe") {
    import spark.implicits._
    val input = TokenTables.synthetic(spark, 50L, seed = 71L)
    val rows = input.collect().toSeq
    // the corpus lives under an ancestor `.../_content_index/cix-prod/...`
    // PAIR: a build-id extraction not anchored at the part file's parent
    // would alias every row to that ancestor and never see the race — the
    // strongest aliasing case, stronger than a lone cix- segment
    val dir = {
      val p = Files.createTempDirectory("cixroot")
        .resolve("_content_index").resolve("cix-prod").resolve("corpus")
      Files.createDirectories(p)
      p.toString
    }
    EncodeJob.run(input, dir, cfg)
    val conf = spark.sparkContext.hadoopConfiguration
    val live = Maintenance.liveBlockFiles(dir, conf).map(_._1)
    // two concurrent first-builds both publish the full file set
    assert(ContentIndex.buildFor(spark, dir, live) == live.length.toLong)
    assert(ContentIndex.buildFor(spark, dir, live) == live.length.toLong)
    val liveNames = live.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val (entries, covered) = ContentIndex.rows(spark, dir, liveNames)
    assert(covered == liveNames)
    val got = entries.get.select("doc_id").collect().map(_.getString(0))
    assert(got.length == rows.size, "raced duplicate rows must dedupe")
    assert(got.toSet == rows.map(_.doc_id).toSet)
    // and the fully-covered ensure still hashes nothing
    assert(ContentIndex.ensure(spark, dir, live)._2 == 0L)
  }

  test("sequence-scoped liveness: a doc replaced after indexing cannot ghost-delete its twin") {
    import spark.implicits._
    // X and Y share content; X is then REPLACED (delete+append) with new
    // content AFTER the index covered the old block. Live corpus has no
    // duplicates, so incremental dedup must delete nothing — a liveness
    // filter on doc_id alone would keep X's STALE entry (still Y's twin,
    // X's doc_id is live in its new file) and ghost-delete Y.
    val base = TokenTables
      .synthetic(spark, 60L, seed = 13L)
      .collect()
      .toSeq
      .groupBy(r => (r.tokens.toSeq, r.n_tok)) // drop natural dups: the
      .values.map(_.minBy(_.doc_id)).toSeq     // planted pair must be the only group
    val x = base(4).copy(doc_id = "aa-x") // min id => keeper under the bug
    val y = base(4).copy(doc_id = "bb-y") // the would-be ghost victim
    val dir = freshDir("graft-cix-replace")
    // base(4) itself stays OUT — x and y must be the only twins
    EncodeJob.run(
      spark.createDataset(base.filterNot(_.doc_id == base(4).doc_id) ++ Seq(x, y)),
      dir,
      cfg
    )
    val conf = spark.sparkContext.hadoopConfiguration
    ContentIndex.ensure(spark, dir, Maintenance.liveBlockFiles(dir, conf).map(_._1)): Unit

    val x2 = x.copy(tokens = x.tokens.map(_ + 1), n_tok = x.n_tok)
    assert(graft.pipeline.Deletes.replaceDocs(spark, dir, spark.createDataset(Seq(x2))).nonEmpty)

    val r = Maintenance.dedupExact(spark, dir, incremental = true)
    assert(r.snapshotId.isEmpty && r.dupGroups == 0L && r.docsDeleted == 0L,
      s"replaced doc's stale entry must not form a group: $r")
    val ids = spark.read.format("graft").load(dir)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(ids.contains("bb-y") && ids.contains("aa-x"))
  }

  test("SQL procedure face reports files_hashed; vacuum reclaims build staging debris") {
    import spark.implicits._
    val base = TokenTables.synthetic(spark, 80L, seed = 55L).collect().toSeq
    val dup = Seq(base(2).copy(doc_id = s"zz-dup-${base(2).doc_id}"))
    val dir = freshDir("graft-cix-sql")
    EncodeJob.run(spark.createDataset(base ++ dup), dir, cfg)

    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    // pre-build through the SQL face: the off-peak indexing verb
    val bld = spark.sql(s"CALL graft.system.build_content_index(path => '$dir')").head()
    assert(bld.getLong(0) > 0L, "first build hashes files")
    assert(bld.getLong(2) == (base.size + dup.size).toLong, "one entry per doc")
    val bld2 = spark.sql(s"CALL graft.system.build_content_index(path => '$dir')").head()
    assert(bld2.getLong(0) == 0L, "second build is covered")
    val row = spark
      .sql(s"CALL graft.system.dedup_exact(path => '$dir', incremental => true)")
      .head()
    assert(!row.isNullAt(0), "snapshot committed")
    assert(row.getLong(2) >= 1L) // docs_deleted
    assert(!row.isNullAt(3) && row.getLong(3) == 0L,
      "dedup after pre-build must be a pure sidecar read")
    // the full-scan face keeps files_hashed null
    val full = spark.sql(s"CALL graft.system.dedup_exact(path => '$dir')").head()
    assert(full.isNullAt(0) && full.isNullAt(3))

    // crashed-build staging debris is vacuum's to reclaim, committed cix-
    // files are not
    val conf = spark.sparkContext.hadoopConfiguration
    val cix = new org.apache.hadoop.fs.Path(dir, ContentIndex.DirName)
    val fs = cix.getFileSystem(conf)
    val debris = new org.apache.hadoop.fs.Path(cix, ".tmp-crashed")
    fs.mkdirs(debris)
    // a legacy flat entry file (pre-build-dir layout): unreadable by the
    // current reader, so vacuum reclaims it; committed build DIRS stay
    val legacy = new org.apache.hadoop.fs.Path(cix, "cix-legacy-0.parquet")
    fs.create(legacy).close()
    val committed = fs.listStatus(cix).count(st => st.isDirectory && st.getPath.getName.startsWith("cix-"))
    assert(committed > 0)
    Maintenance.vacuum(spark, dir, olderThanMs = 0L)
    assert(!fs.exists(debris), "vacuum must sweep .tmp- staging under _content_index")
    assert(!fs.exists(legacy), "vacuum must reclaim legacy flat entry files")
    assert(fs.listStatus(cix).count(st => st.isDirectory && st.getPath.getName.startsWith("cix-")) == committed)
  }

  test("foldRowPair equals the two separate foldRow chains (the fused index hash)") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(200)
      val from = if (n == 0) 0 else rnd.nextInt(n)
      val values = Array.fill(math.max(n, 1))(rnd.nextInt(Int.MaxValue))
      val (h1, h2) = ContentIndex.foldRowPair(values, from, values.length)
      assert(h1 == ContentIndex.foldRow(values, from, values.length, 0L))
      assert(h2 == ContentIndex.foldRow(values, from, values.length, 1L))
    }
  }
}
