package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing — the pretraining chunker: concatenate every document's
  * tokens in global `doc_id` order (optionally inserting a separator token
  * after each document) and cut the resulting stream into fixed-length
  * training examples of exactly `seqLen` tokens, dropping the final partial
  * example. This is the standard "concat-and-chunk" batch layout a language
  * model trainer consumes, and the one whole-corpus operation the engine's
  * per-document surfaces could not express: its output row `e` depends on the
  * total token count of every document before it.
  *
  * Shaped for 100 TB, where the naive formulations die:
  *
  *   - per-token `posexplode` + `groupBy(example_id)` shuffles one row PER
  *     TOKEN (the whole corpus exploded ~28 bytes/token onto the wire);
  *   - a global `Window.orderBy(doc_id)` prefix sum plans ONE partition.
  *
  * Instead the packer moves the payload once and keeps every per-token loop
  * partition-local:
  *
  *   1. range-repartition by `doc_id` + sort within partitions (the one
  *      payload shuffle), persisted so both passes see identical partitions;
  *   2. a metadata-only aggregate collects per-partition token counts
  *      (`O(partitions)` driver rows) → prefix sums give each partition its
  *      exact global start offset;
  *   3. `mapPartitions` packs tokens into a rolling `seqLen` buffer: every
  *      example fully contained in the partition is emitted COMPLETE in
  *      place; only the partition-boundary leftovers (at most a leading and
  *      a trailing fragment per partition, however many documents they span)
  *      become fragments;
  *   4. the `O(partitions)` fragments — not the corpus — shuffle once more
  *      and are assembled by `example_id` (a fragment chain spanning k tiny
  *      partitions assembles from k pieces; the global tail drops out of the
  *      exactly-`seqLen` check).
  *
  * The output is a pure function of the global document order: partition
  * count and boundaries only decide which examples travel as fragments,
  * never their content (pinned by a partitioning-invariance test).
  *
  * Failure-model caveat (documented, not hidden): pass 2/3 rely on the
  * persisted layout of step 1. `MEMORY_AND_DISK` survives eviction, but an
  * executor LOSS would recompute the stage, and `repartitionByRange`
  * re-samples boundaries — for production runs over unreliable fleets,
  * checkpoint the sorted input (the same contract as
  * [[Dedup.resolveClusters]]'s localCheckpoint rounds).
  *
  * Reference tie-in: the reference packs variable-length adjacency lists
  * into one continuous bitstream with per-node offsets
  * (/root/reference/src/graphs/offsets.rs:19-58); this is the row-level
  * analog over token arrays, with the offsets replaced by the fixed example
  * grid.
  */
object Packing {

  /** One packed piece: a complete example (`complete = true`, `off = 0`,
    * `frag.length == seqLen`) or a partition-boundary fragment to be
    * assembled by `example_id`.
    */
  final case class Piece(
      example_id: Long,
      off: Int,
      frag: Array[Int],
      complete: Boolean,
      spans: Array[Span]
  )

  /** One document's contiguous run inside an example: `off`/`len` in example
    * coordinates ([0, seqLen)). A document's separator token (when
    * configured) counts into ITS span, so spans tile every example exactly.
    * These are the attention/loss-mask boundaries a trainer consumes —
    * "don't attend across documents" needs exactly (off, len) per doc.
    */
  final case class Span(doc_id: String, off: Int, len: Int)

  /** Pack `docs` (`doc_id` orderable, `tokens array<int>`-castable) into
    * examples of exactly `seqLen` tokens. Returns `(example_id bigint,
    * tokens array<int>)`, one row per full example, `example_id` dense from
    * 0 in stream order; the trailing partial example is dropped.
    *
    * @param sepToken if set, appended after EVERY document (the EOS/document
    *                 separator convention), including the last.
    * @param numPartitions width of the range shuffle; defaults to
    *                      `spark.sql.shuffle.partitions`.
    * @param withSpans additionally emit `spans array<struct<doc_id string,
    *                  off int, len int>>` — each document's contiguous run
    *                  inside the example (separator counted into its doc),
    *                  tiling [0, seqLen) exactly: the attention/loss-mask
    *                  boundaries a trainer needs to not attend across
    *                  documents. doc_id is cast to string in the span.
    * @param orderSeed EPOCH SHUFFLING: when set, documents concatenate in
    *                  ascending `(mix62(hashChars(doc_id) ^ mix62(seed)),
    *                  doc_id)` order — a deterministic seeded permutation —
    *                  instead of plain doc_id order. A trainer packs each
    *                  epoch with a different seed and gets a different
    *                  (reproducible) document order without materializing a
    *                  shuffled copy of the corpus; the hash chain is the
    *                  SAME 62-bit cross-engine rule the sampling surfaces
    *                  use, so an oracle (or a second engine) can recompute
    *                  the permutation exactly.
    * @return the packed examples plus a release handle that unpersists the
    *         sorted intermediate — call it once the result is consumed.
    */
  def packSequencesWithHandle(
      docs: DataFrame,
      seqLen: Int,
      sepToken: Option[Int] = None,
      numPartitions: Int = 0,
      withSpans: Boolean = false,
      orderSeed: Option[Long] = None
  ): (DataFrame, () => Unit) = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val base = docs.select(col("doc_id"), col("tokens").cast("array<int>").as("tokens"))
    // the global concat order: doc_id, or the seeded epoch permutation
    // (doc_id stays the tiebreak so equal hashes — and duplicate ids, for
    // the uniqueness guard below — are still adjacent after the sort)
    val prepared = (orderSeed match {
      case None => base.repartitionByRange(p, col("doc_id")).sortWithinPartitions("doc_id")
      case Some(seed) =>
        val mixedSeed = XHash.mix62(seed)
        val ord = udf((id: String) => XHash.mix62(XHash.hashChars(id) ^ mixedSeed))
        base
          .withColumn("__ord", ord(col("doc_id").cast("string")))
          .repartitionByRange(p, col("__ord"), col("doc_id"))
          .sortWithinPartitions("__ord", "doc_id")
    }).persist(StorageLevel.MEMORY_AND_DISK)

    val sepAdd = if (sepToken.isDefined) 1 else 0

    // Pass 2: per-partition token totals. spark_partition_id() is evaluated
    // while scanning the persisted layout (before the aggregate's exchange),
    // so the ids match pass 3's mapPartitionsWithIndex over the same RDD.
    val counts: Map[Int, Long] = prepared
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum(size(col("tokens")) + lit(sepAdd)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap

    val tokensOnly = prepared
      .select(col("doc_id").cast("string").as("doc_id"), col("tokens"))
      .queryExecution
      .toRdd
    val nParts = tokensOnly.getNumPartitions
    val starts = new Array[Long](nParts)
    var acc = 0L
    var i = 0
    while (i < nParts) {
      starts(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }

    val bStarts = spark.sparkContext.broadcast(starts)
    val l = seqLen
    val sep = sepToken
    // span bookkeeping is per-doc-run work serialized into every piece; a
    // spans-free pack (the common trainer layout) skips it entirely — the
    // column is dropped at the end anyway
    val trackSpans = withSpans

    // Pass 3: partition-local rolling-buffer packing (streaming — never
    // buffers more than one example).
    val piecesRdd = tokensOnly.mapPartitionsWithIndex { (pid, rows) =>
      new Iterator[Piece] {
        private var pos = bStarts.value(pid)
        private val buf = new Array[Int](l)
        // offset within the current example at which THIS partition began
        // contributing (non-zero only for the partition's first example)
        private var exStart = (pos % l).toInt
        private var fill = exStart
        private var exampleId = pos / l
        private val queue = new scala.collection.mutable.Queue[Piece]
        private val spanBuf = scala.collection.mutable.ArrayBuffer.empty[Span]
        private var drained = false

        private def flush(): Unit = {
          queue.enqueue(
            Piece(
              exampleId, exStart, java.util.Arrays.copyOfRange(buf, exStart, l),
              exStart == 0, spanBuf.toArray
            )
          )
          exampleId += 1
          exStart = 0
          fill = 0
          spanBuf.clear()
        }

        /** Record `take` tokens of `docId` landing at offset `fill`; a run
          * adjacent to the doc's previous chunk (its separator, or a doc
          * wider than one feed) extends that span in place.
          */
        private def noteSpan(docId: String, take: Int): Unit =
          if (!trackSpans) ()
          else if (spanBuf.nonEmpty && spanBuf.last.doc_id == docId &&
            spanBuf.last.off + spanBuf.last.len == fill) {
            val last = spanBuf.last
            spanBuf(spanBuf.length - 1) = Span(last.doc_id, last.off, last.len + take)
          } else spanBuf += Span(docId, fill, take)

        private def feed(docId: String, arr: Array[Int]): Unit = {
          var i = 0
          while (i < arr.length) {
            val take = math.min(arr.length - i, l - fill)
            System.arraycopy(arr, i, buf, fill, take)
            noteSpan(docId, take)
            fill += take
            i += take
            if (fill == l) flush()
          }
        }

        private var prevDocId: String = null
        private var prevDocU: org.apache.spark.unsafe.types.UTF8String = null

        private def refill(): Unit = {
          while (queue.isEmpty && rows.hasNext) {
            val row = rows.next()
            // duplicate doc_ids would make the pack order (and span merging)
            // ill-defined — range partitioning routes equal keys to ONE
            // partition and the sort makes them adjacent, so this local
            // check is an exact global uniqueness guard at zero extra cost.
            // Spans-free packs compare the raw UTF8 bytes (cloned — the row
            // buffer is reused) instead of materializing a java String per
            // row; spans need the String anyway for the Span rows.
            val docId =
              if (trackSpans) {
                val s = row.getUTF8String(0).toString
                require(
                  s != prevDocId,
                  s"packSequences requires unique doc_ids; '$s' appears more than once"
                )
                prevDocId = s
                s
              } else {
                val u = row.getUTF8String(0)
                require(
                  prevDocU == null || u.compareTo(prevDocU) != 0,
                  s"packSequences requires unique doc_ids; '$u' appears more than once"
                )
                prevDocU = u.clone()
                null
              }
            feed(docId, row.getArray(1).toIntArray())
            sep.foreach { s =>
              buf(fill) = s
              noteSpan(docId, 1) // the separator counts into ITS doc's span
              fill += 1
              if (fill == l) flush()
            }
          }
          if (queue.isEmpty && !rows.hasNext && !drained) {
            drained = true
            if (fill > exStart) {
              queue.enqueue(
                Piece(
                  exampleId, exStart, java.util.Arrays.copyOfRange(buf, exStart, fill),
                  complete = false, spanBuf.toArray
                )
              )
            }
          }
        }

        override def hasNext: Boolean = {
          refill()
          queue.nonEmpty
        }

        override def next(): Piece = {
          refill()
          queue.dequeue()
        }
      }
    }

    // The completes/assembled branches below each drive the packing pass.
    // Persisting the pieces trades ONE pack + a full cache write of the
    // packed payload for two cheap cached scans — the right trade for the
    // spans pack, which the oracle queries consume many times. For a
    // spans-free pack (the one-pass trainer layout) the cache write of the
    // whole payload costs more than repacking from the persisted sorted
    // input: each branch then re-runs the pack iterator over `prepared`
    // (deterministic — the range boundaries are fixed in the shuffle
    // dependency), and Spark's serializer pruning drops the frag bytes from
    // any branch that doesn't read them (e.g. a bare count).
    val pieces0 = spark.createDataset(piecesRdd)(Encoders.product[Piece])
    val pieces =
      if (withSpans) pieces0.persist(StorageLevel.MEMORY_AND_DISK) else pieces0

    val completes = pieces
      .toDF()
      .where(col("complete"))
      .select(col("example_id"), col("frag").as("tokens"), col("spans"))

    // Fragment assembly: O(partitions) rows, one tiny shuffle. Pieces sort
    // by their unique offsets; a document cut by a partition boundary left a
    // span tail in one piece and a head in the next, merged back here. The
    // exactly-seqLen check drops the global tail (the only example that can
    // come up short).
    import spark.implicits._
    val assembled = pieces
      .filter(!_.complete)
      .groupByKey(_.example_id)
      .mapGroups { (eid, it) =>
        val ps = it.toArray.sortBy(_.off)
        val tokens = new Array[Int](ps.map(_.frag.length).sum)
        var at = 0
        val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
        ps.foreach { p =>
          System.arraycopy(p.frag, 0, tokens, at, p.frag.length)
          at += p.frag.length
          p.spans.foreach { s =>
            if (spans.nonEmpty && spans.last.doc_id == s.doc_id &&
              spans.last.off + spans.last.len == s.off) {
              val last = spans.last
              spans(spans.length - 1) = Span(last.doc_id, last.off, last.len + s.len)
            } else spans += s
          }
        }
        (eid, tokens, spans.toArray)
      }
      .toDF("example_id", "tokens", "spans")
      .where(size(col("tokens")) === l)

    val withAll = completes.unionByName(assembled)
    val out = if (withSpans) withAll else withAll.drop("spans")
    (out, () => { prepared.unpersist(); pieces.unpersist(); bStarts.destroy() })
  }

  /** [[packSequencesWithHandle]] without the lifecycle handle: the sorted
    * intermediate stays persisted for the session (matching the shared
    * encoded-corpus cache pattern in SparkEntry); prefer the handle variant
    * in long-lived drivers.
    */
  def packSequences(
      docs: DataFrame,
      seqLen: Int,
      sepToken: Option[Int] = None,
      numPartitions: Int = 0,
      withSpans: Boolean = false,
      orderSeed: Option[Long] = None
  ): DataFrame =
    packSequencesWithHandle(docs, seqLen, sepToken, numPartitions, withSpans, orderSeed)._1
}
