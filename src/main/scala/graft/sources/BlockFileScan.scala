package graft.sources

import graft.codec.{CodecSelector, HybridCodec, StringCodecs}
import graft.core.{BitReader, ContextModel, Huffman}
import graft.pipeline.GraftPipeline

/** Shared executor-side kernel for the per-file sidecar builders
  * ([[ContentIndex]], [[SignatureIndex]]): decode ONE block parquet file
  * fully — doc_id string stream, n_tok column, token payload through the
  * scan's own codec dispatch (embedded tables included) — and fold every
  * row through a callback. One task per file is the callers' contract
  * (a sidecar entry is attributed to its file), so this stays a plain
  * sequential loop.
  */
private[sources] object BlockFileScan {

  /** Decode `file` and call `f(docId, nTok, values, from, until)` per row
    * (token values are the slice `values(from until until)`). Returns true
    * if the file held at least one row.
    */
  def foreachRow(
      file: String,
      sConf: SerializableHadoopConf,
      headerBytes: Array[Byte],
      maxBits: Int,
      numContexts: Int,
      modelName: String
  )(f: (String, Int, Array[Int], Int, Int) => Unit): Boolean = {
    val tables = Huffman.readHeader(new BitReader(headerBytes), maxBits, numContexts)
    val model = ContextModel(modelName, numContexts)
    val hybrid = new HybridCodec(tables, model)
    val wanted = Set(
      "codec", "n_rows", "doc_ids_codec", "doc_ids_payload", "n_toks_codec",
      "n_toks_payload", "payload", "embedded_tables", "table_hash"
    )
    val reader = GraftPartitionReader.openProjected(file, sConf, wanted, None)
    var any = false
    try {
      var g = reader.read()
      while (g != null) {
        val nRows = g.getInteger("n_rows", 0)
        if (nRows > 0) {
          any = true
          val docIds = StringCodecs.decode(
            g.getString("doc_ids_codec", 0),
            g.getBinary("doc_ids_payload", 0).getBytes,
            nRows
          )
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
          val values =
            if (off == 0) Array.emptyIntArray
            else
              GraftPipeline.decodeBlockPayload(
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
          i = 0
          while (i < nRows) {
            f(docIds(i), nToks(i), values, rowOffsets(i), rowOffsets(i + 1))
            i += 1
          }
        }
        g = reader.read()
      }
    } finally reader.close()
    any
  }
}
