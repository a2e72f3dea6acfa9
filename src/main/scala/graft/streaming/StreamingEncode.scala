package graft.streaming

import graft.core.SymbolTables
import graft.pipeline.{GraftPipeline, TokenRow}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming surface: encode an unbounded stream of token rows
  * into the same block layout as the batch job.
  *
  * Each micro-batch runs the deterministic bin/block encode and commits to
  * its own `batch=<id>` directory with overwrite semantics, so replayed
  * batches (at-least-once foreachBatch) are idempotent — the streaming
  * analog of the batch job's bin-level checkpointing. Symbol tables are
  * built once (from a bootstrap corpus) and broadcast; recorded table_hash
  * guards mixing.
  */
object StreamingEncode {

  def start(
      stream: Dataset[TokenRow],
      outDir: String,
      tables: Broadcast[SymbolTables],
      cfg: GraftPipeline.Config
  ): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", s"$outDir/_stream_checkpoint")
      .foreachBatch { (batch: Dataset[TokenRow], batchId: Long) =>
        GraftPipeline
          .encode(batch, tables, cfg)
          .write
          .mode(SaveMode.Overwrite) // idempotent per-batch commit
          .parquet(s"$outDir/blocks/batch=$batchId")
      }
      .start()
  }

  /** Read everything committed so far (all batches) as one blocks dataset. */
  def readBlocks(spark: org.apache.spark.sql.SparkSession, outDir: String) = {
    import spark.implicits._
    spark.read
      .option("basePath", s"$outDir/blocks")
      .parquet(s"$outDir/blocks/batch=*")
      .drop("batch")
      .as[graft.pipeline.EncodedBlock]
  }

  /** Streaming exact dedup over an event-timestamped document stream
    * (ts, doc_id, text, ...): keep the first arrival of each content hash,
    * with state bounded by the watermark (duplicates separated by more
    * than `lateness` pass through — the standard bounded-state trade of
    * streaming dedup at ingest; the batch Dedup.exact pass sweeps the
    * long-range tail).
    */
  def streamingDedup(stream: DataFrame, lateness: String = "10 minutes"): DataFrame = {
    stream
      .withColumn("content_hash", xxhash64(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** Watermarked per-source ingest metrics over an event-timestamped token
    * stream (ts, source, n_tok): tumbling-window token counts that tolerate
    * `lateness` of out-of-order data.
    */
  def windowedTokenCounts(
      stream: DataFrame,
      windowLength: String = "1 minute",
      lateness: String = "2 minutes"
  ): DataFrame = {
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens")
      )
  }
}
