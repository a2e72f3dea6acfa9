package graft.sources

import graft.core.{BitReader, ContextModel, Huffman}
import graft.codec.{CodecSelector, HybridCodec}
import graft.pipeline.{GraftPipeline, Maintenance}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Corpus integrity audit (`CALL graft.system.audit(path)`) — the fsck an
  * operator runs before trusting a 100 TB table that has lived through
  * months of appends, deletes, compactions and adopts: decode EVERY live
  * block through the scan's own codec dispatch (embedded-table parse and
  * hash check included) and cross-check the decoded value count against
  * the block's recorded `n_values`, reporting one row per file. Shaped like
  * [[TokenIndex.build]]: one task per live file (a corrupt byte is
  * attributed to its file, and the job parallelizes to the file count), a
  * per-file sequential projected read (doc_id/source metadata never
  * touched), and O(files) driver rows — the `files` procedure's scale.
  *
  * A clean audit proves the entropy payloads decode and the per-block
  * accounting agrees; it does NOT prove the content matches the original
  * source (that is the encode-time verify / q_roundtrip_verify contract —
  * after ingest the dir IS the source of truth). Failures never throw out
  * of the job: a corrupt file yields its row with `ok = false` and the
  * error message, and every other file still reports.
  */
object Audit {

  final case class FileAudit(
      file: String,
      bytes: Long,
      nBlocks: Long,
      nRows: Long,
      nValues: Long,
      ok: Boolean,
      error: Option[String]
  )

  def audit(spark: SparkSession, outDir: String): Seq[FileAudit] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = Maintenance.liveBlockFiles(outDir, conf)
    if (live.isEmpty) return Seq.empty
    val meta = GraftMeta.load(outDir, conf)
    val bMeta = spark.sparkContext.broadcast(
      (meta.headerBytes, meta.maxBits, meta.numContexts, meta.contextModel)
    )
    val sConf = new SerializableHadoopConf(conf)
    spark.sparkContext
      .parallelize(live.toIndexedSeq, live.length)
      .map { case (file, bytes) =>
        val (headerBytes, maxBits, numContexts, modelName) = bMeta.value
        auditOneFile(file, bytes, sConf, headerBytes, maxBits, numContexts, modelName)
      }
      .collect()
      .sortBy(_.file)
      .toSeq
  }

  private def auditOneFile(
      file: String,
      bytes: Long,
      sConf: SerializableHadoopConf,
      headerBytes: Array[Byte],
      maxBits: Int,
      numContexts: Int,
      modelName: String
  ): FileAudit = {
    val name = new Path(file).getName
    var blocks = 0L
    var rows = 0L
    var values = 0L
    try {
      val tables = Huffman.readHeader(new BitReader(headerBytes), maxBits, numContexts)
      val model = ContextModel(modelName, numContexts)
      val hybrid = new HybridCodec(tables, model)
      val wanted = Set(
        "bin", "block_seq", "codec", "n_rows", "n_values", "n_toks_codec",
        "n_toks_payload", "payload", "embedded_tables", "table_hash",
        "doc_ids_codec", "doc_ids_payload", "sources_codec", "sources_payload"
      )
      val reader = GraftPartitionReader.openProjected(file, sConf, wanted, None)
      try {
        var g = reader.read()
        while (g != null) {
          val nRows = g.getInteger("n_rows", 0)
          val recorded = g.getLong("n_values", 0)
          val nToks = CodecSelector.decodeIntColumn(
            g.getString("n_toks_codec", 0),
            g.getBinary("n_toks_payload", 0).getBytes,
            nRows
          )
          val rowOffsets = new Array[Int](nRows + 1)
          var off = 0
          var i = 0
          while (i < nRows) { rowOffsets(i) = off; off += nToks(i); i += 1 }
          rowOffsets(nRows) = off
          if (off.toLong != recorded)
            throw new IllegalStateException(
              s"block (bin=${g.getInteger("bin", 0)}, seq=${g.getInteger("block_seq", 0)}): " +
                s"n_toks sum $off != recorded n_values $recorded"
            )
          // All four per-block payloads are covered: decode the doc_id and
          // source string streams too (cheap next to the entropy payload) so
          // a corrupt metadata stream reports ok=false here instead of
          // crashing the first scan that projects doc_id.
          val docIds = graft.codec.StringCodecs.decode(
            g.getString("doc_ids_codec", 0),
            g.getBinary("doc_ids_payload", 0).getBytes,
            nRows
          )
          if (docIds.length != nRows)
            throw new IllegalStateException(
              s"block (bin=${g.getInteger("bin", 0)}, seq=${g.getInteger("block_seq", 0)}): " +
                s"doc_ids stream decoded ${docIds.length} entries, expected $nRows"
            )
          val srcs = graft.codec.StringCodecs.decode(
            g.getString("sources_codec", 0),
            g.getBinary("sources_payload", 0).getBytes,
            nRows
          )
          if (srcs.length != nRows)
            throw new IllegalStateException(
              s"block (bin=${g.getInteger("bin", 0)}, seq=${g.getInteger("block_seq", 0)}): " +
                s"sources stream decoded ${srcs.length} entries, expected $nRows"
            )
          if (off > 0) {
            val decoded = GraftPipeline.decodeBlockPayload(
              g.getBinary("payload", 0).getBytes,
              g.getString("codec", 0),
              g.getBoolean("embedded_tables", 0),
              g.getLong("table_hash", 0),
              tables,
              model,
              hybrid,
              off,
              rowOffsets
            )
            if (decoded.length != off)
              throw new IllegalStateException(
                s"block (bin=${g.getInteger("bin", 0)}, seq=${g.getInteger("block_seq", 0)}): " +
                  s"decoded ${decoded.length} values, expected $off"
              )
          }
          blocks += 1L
          rows += nRows
          values += off
          g = reader.read()
        }
      } finally reader.close()
      FileAudit(name, bytes, blocks, rows, values, ok = true, None)
    } catch {
      case e: Throwable =>
        FileAudit(
          name, bytes, blocks, rows, values, ok = false,
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(500))
        )
    }
  }
}
