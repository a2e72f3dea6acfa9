package graft.codec

import graft.core._

/** Single-pass statistics over a block's flattened token stream, driving
  * codec auto-selection (the generalization of the reference's pluggable
  * estimators in /root/reference/src/graphs/estimator/ — Fixed/Log2/
  * Huffman cost strategies become closed-form size formulas per codec).
  *
  * The whole block-codec layer is specialized to non-negative int32 values
  * (the input_hint token domain): Array[Int] halves memory traffic versus a
  * Long stream, which matters — the encode kernel is memory-bandwidth-bound
  * at high core counts.
  */
final case class BlockStats(
    n: Int,
    min: Int,
    max: Int,
    nRuns: Int,
    maxRunLen: Int,
    distinct: Int, // exact if <= DictCap, else DictCap + 1
    distinctValues: Array[Int], // sorted, only when distinct <= DictCap
    // EXACT payload bits [[DeltaCodec]] would write for this stream (its
    // miniblock widths depend on every residual, so a closed form over
    // scalar stats can't express it; the same single pass computes it
    // directly instead)
    deltaBits: Long
) extends Serializable

/** Streaming accumulator for [[BlockStats.deltaBits]]: feeds values through
  * the continuous zigzag chain and closes a width group every
  * [[DeltaCodec.GroupSize]] values — the ONE definition of the miniblock
  * size math, shared by [[BlockStats.compute]] and
  * [[HybridCodec.exactBitsAndStats]] so the exact-estimate invariant
  * (estimate == DeltaCodec's bitsWritten) cannot drift between the two
  * stats passes. Final class with primitive fields; JIT inlines add().
  */
private[codec] final class DeltaBitsAcc {
  private var dPrev = 0L
  private var gMax = 0L
  private var gLen = 0
  private var dBits = 0L

  def add(v: Int): Unit = {
    val d = v.toLong - dPrev
    val zz = (d << 1) ^ (d >> 63)
    if (zz > gMax) gMax = zz
    dPrev = v.toLong
    gLen += 1
    if (gLen == DeltaCodec.GroupSize) {
      dBits += 6L + gLen.toLong * IntCodecs.bitsFor(gMax)
      gLen = 0; gMax = 0L
    }
  }

  /** Total bits including the trailing partial group; call once at end. */
  def result(): Long =
    if (gLen > 0) dBits + 6L + gLen.toLong * IntCodecs.bitsFor(gMax) else dBits
}

object BlockStats {
  val DictCap = 4096

  /** values must be non-negative. */
  def compute(values: Array[Int], from: Int, until: Int): BlockStats = {
    val n = until - from
    if (n == 0) return BlockStats(0, 0, 0, 0, 0, 0, Array.emptyIntArray, 0L)
    var min = Int.MaxValue
    var max = Int.MinValue
    var runs = 1
    var runLen = 1
    var maxRun = 1
    val delta = new DeltaBitsAcc
    // primitive open-addressing set (values are non-negative; -1 = empty)
    val capacity = Integer.highestOneBit(DictCap * 4 - 1) * 2
    val mask = capacity - 1
    val set = new Array[Int](capacity)
    java.util.Arrays.fill(set, -1)
    var setSize = 0
    var capped = false
    var i = from
    var prev = values(from)
    while (i < until) {
      val v = values(i)
      if (v < min) min = v
      if (v > max) max = v
      delta.add(v)
      if (i > from) {
        if (v == prev) { runLen += 1; if (runLen > maxRun) maxRun = runLen }
        else { runs += 1; runLen = 1 }
      }
      if (!capped && v != prev || i == from) {
        var slot = ((v * 0x9e3779b9) >>> 17) & mask
        while (set(slot) != -1 && set(slot) != v) slot = (slot + 1) & mask
        if (set(slot) == -1) {
          set(slot) = v
          setSize += 1
          if (setSize > DictCap) capped = true
        }
      }
      prev = v
      i += 1
    }
    val distinct = if (capped) DictCap + 1 else setSize
    val dv =
      if (capped) Array.emptyIntArray
      else {
        val out = new Array[Int](setSize)
        var j = 0
        var s = 0
        while (s < capacity) {
          if (set(s) != -1) { out(j) = set(s); j += 1 }
          s += 1
        }
        java.util.Arrays.sort(out)
        out
      }
    BlockStats(n, min, max, runs, maxRun, distinct, dv, delta.result())
  }
}

/** A per-block integer codec over the flattened (non-negative int32) token
  * stream of a block of rows. `rowOffsets` (length nRows+1) marks row
  * boundaries — only the hybrid codec is row-sensitive (its context model
  * resets per row). Every codec's payload is self-contained given the codec
  * id and `n`.
  */
trait IntBlockCodec extends Serializable {
  def id: Byte
  def name: String

  /** Exact number of payload bits `encode` will write for this stream. */
  def estimateBits(stats: BlockStats): Long
  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit
  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int]
}

object IntCodecs {
  @inline def bitsFor(maxValue: Long): Int =
    if (maxValue <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(maxValue).toInt

  val PlainId: Byte = 0
  val BitPackId: Byte = 1
  val ForId: Byte = 2
  val RleId: Byte = 3
  val DictId: Byte = 4
  val HybridId: Byte = 5
  val DeltaId: Byte = 6
  val DeltaHybridId: Byte = 7

  def nameOf(id: Byte): String = id match {
    case PlainId => "plain"
    case BitPackId => "bitpack"
    case ForId => "for"
    case RleId => "rle"
    case DictId => "dict"
    case HybridId => "hybrid"
    case DeltaId => "delta"
    case DeltaHybridId => "dhybrid"
    case other => s"codec-$other"
  }
}

/** Fixed 32-bit little-endian values; the fallback with zero metadata. */
object PlainCodec extends IntBlockCodec {
  val id: Byte = IntCodecs.PlainId
  val name = "plain"
  def estimateBits(s: BlockStats): Long = s.n.toLong * 32

  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
    var i = 0
    while (i < values.length) { w.writeBits(values(i).toLong, 32); i += 1 }
  }

  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = r.readBits(32).toInt; i += 1 }
    out
  }
}

/** Fixed-width bit packing: 6-bit width header then n * width bits. */
object BitPackCodec extends IntBlockCodec {
  val id: Byte = IntCodecs.BitPackId
  val name = "bitpack"

  def estimateBits(s: BlockStats): Long = 6L + s.n.toLong * IntCodecs.bitsFor(s.max.toLong)

  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
    var max = 0
    var i = 0
    while (i < values.length) { if (values(i) > max) max = values(i); i += 1 }
    val width = IntCodecs.bitsFor(max.toLong)
    w.writeBits(width.toLong, 6)
    i = 0
    while (i < values.length) { w.writeBits(values(i).toLong, width); i += 1 }
  }

  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
    val width = r.readBits(6).toInt
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = r.readBits(width).toInt; i += 1 }
    out
  }
}

/** Frame-of-reference: 33-bit base (min) + 6-bit width + deltas off the base. */
object ForCodec extends IntBlockCodec {
  val id: Byte = IntCodecs.ForId
  val name = "for"

  def estimateBits(s: BlockStats): Long =
    33L + 6L + s.n.toLong * IntCodecs.bitsFor((s.max - s.min).toLong)

  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
    var min = Int.MaxValue
    var max = Int.MinValue
    var i = 0
    while (i < values.length) {
      if (values(i) < min) min = values(i)
      if (values(i) > max) max = values(i)
      i += 1
    }
    if (values.isEmpty) { min = 0; max = 0 }
    val width = IntCodecs.bitsFor((max - min).toLong)
    w.writeBits(min.toLong, 33)
    w.writeBits(width.toLong, 6)
    i = 0
    while (i < values.length) { w.writeBits((values(i) - min).toLong, width); i += 1 }
  }

  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
    val base = r.readBits(33)
    val width = r.readBits(6).toInt
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = (base + r.readBits(width)).toInt; i += 1 }
    out
  }
}

/** Delta encoding with per-miniblock widths (the Parquet
  * DELTA_BINARY_PACKED shape): zigzag(v[i] - v[i-1]) residuals in one
  * CONTINUOUS chain (prev starts at 0; no per-row reset — lightweight
  * blocks always decode whole, so chaining across row boundaries costs
  * nothing and keeps [[BlockStats]] row-independent), written in groups of
  * [[DeltaCodec.GroupSize]] values, each group bit-packed at ITS OWN 6-bit
  * width. Per-group widths localize outlier residuals — a row-boundary
  * jump inside a block widens one 128-value group, not the whole stream,
  * which is what makes delta win on multi-row blocks of monotone rows.
  * Wins on sorted or slowly-varying streams — monotone id/offset/timestamp
  * columns — where residuals are far narrower than the values; on unsorted
  * streams residuals widen past the value range and selection never picks
  * it. This is the reference's gap encoding of successor lists
  * (/root/reference/src/graphs/convert.rs, adjacency gaps feed the hybrid
  * coder) carried into the lightweight family as a standalone codec.
  */
object DeltaCodec extends IntBlockCodec {
  val id: Byte = IntCodecs.DeltaId
  val name = "delta"

  /** Values per width group. 128 bounds outlier cost (one wide group per
    * jump) while keeping header overhead at 6/128 ≈ 0.05 bits/value.
    */
  val GroupSize = 128

  @inline private def zigzag(d: Long): Long = (d << 1) ^ (d >> 63)
  @inline private def unzigzag(z: Long): Long = (z >>> 1) ^ -(z & 1L)

  /** Exact: group widths depend on every residual, so the stats pass
    * computes the full size directly ([[BlockStats.deltaBits]]).
    */
  def estimateBits(s: BlockStats): Long = s.deltaBits

  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
    val n = values.length
    val buf = new Array[Long](GroupSize)
    var prev = 0L
    var i = 0
    while (i < n) {
      var gLen = 0
      var gMax = 0L
      while (gLen < GroupSize && i < n) {
        val zz = zigzag(values(i).toLong - prev)
        prev = values(i).toLong
        buf(gLen) = zz
        if (zz > gMax) gMax = zz
        gLen += 1
        i += 1
      }
      val width = IntCodecs.bitsFor(gMax)
      w.writeBits(width.toLong, 6)
      var k = 0
      while (k < gLen) { w.writeBits(buf(k), width); k += 1 }
    }
  }

  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
    val out = new Array[Int](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      val width = r.readBits(6).toInt
      var gLen = 0
      while (gLen < GroupSize && i < n) {
        prev += unzigzag(r.readBits(width))
        out(i) = prev.toInt
        gLen += 1
        i += 1
      }
    }
    out
  }
}

/** Run-length encoding: header (nRuns:32, widthV:6, widthR:6) then per run
  * the value and (runLength - 1).
  */
object RleCodec extends IntBlockCodec {
  val id: Byte = IntCodecs.RleId
  val name = "rle"

  def estimateBits(s: BlockStats): Long = {
    val widthV = IntCodecs.bitsFor(s.max.toLong)
    val widthR = IntCodecs.bitsFor(s.maxRunLen.toLong - 1)
    32L + 6L + 6L + s.nRuns.toLong * (widthV + widthR)
  }

  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
    val n = values.length
    if (n == 0) { w.writeBits(0, 32); w.writeBits(0, 6); w.writeBits(0, 6); return }
    var max = 0
    var nRuns = 1
    var runLen = 1
    var maxRun = 1
    var i = 0
    var prev = values(0)
    while (i < n) {
      val v = values(i)
      if (v > max) max = v
      if (i > 0) {
        if (v == prev) { runLen += 1; if (runLen > maxRun) maxRun = runLen }
        else { nRuns += 1; runLen = 1 }
      }
      prev = v
      i += 1
    }
    val widthV = IntCodecs.bitsFor(max.toLong)
    val widthR = IntCodecs.bitsFor(maxRun.toLong - 1)
    w.writeBits(nRuns.toLong, 32)
    w.writeBits(widthV.toLong, 6)
    w.writeBits(widthR.toLong, 6)
    i = 0
    while (i < n) {
      val v = values(i)
      var len = 1
      while (i + len < n && values(i + len) == v) len += 1
      w.writeBits(v.toLong, widthV)
      w.writeBits(len.toLong - 1, widthR)
      i += len
    }
  }

  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
    val nRuns = r.readBits(32).toInt
    val widthV = r.readBits(6).toInt
    val widthR = r.readBits(6).toInt
    val out = new Array[Int](n)
    var i = 0
    var run = 0
    while (run < nRuns) {
      val v = r.readBits(widthV).toInt
      val len = r.readBits(widthR).toInt + 1
      var k = 0
      while (k < len) { out(i) = v; i += 1; k += 1 }
      run += 1
    }
    out
  }
}

/** Dictionary encoding: header (card:32, widthV:6) + sorted dictionary
  * bit-packed at widthV + indices bit-packed at bitsFor(card-1).
  * Only selected when the stream's exact cardinality <= BlockStats.DictCap.
  */
object DictCodec extends IntBlockCodec {
  val id: Byte = IntCodecs.DictId
  val name = "dict"

  def estimateBits(s: BlockStats): Long = {
    if (s.distinct > BlockStats.DictCap) return Long.MaxValue
    val widthV = IntCodecs.bitsFor(s.max.toLong)
    val widthIdx = IntCodecs.bitsFor(s.distinct.toLong - 1)
    32L + 6L + s.distinct.toLong * widthV + s.n.toLong * widthIdx
  }

  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
    val set = new java.util.TreeSet[Integer]()
    var i = 0
    while (i < values.length) { set.add(values(i)); i += 1 }
    val dict = new Array[Int](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { dict(j) = it.next(); j += 1 }
    val widthV = IntCodecs.bitsFor(if (dict.isEmpty) 0L else dict(dict.length - 1).toLong)
    val widthIdx = IntCodecs.bitsFor(dict.length.toLong - 1)
    w.writeBits(dict.length.toLong, 32)
    w.writeBits(widthV.toLong, 6)
    i = 0
    while (i < dict.length) { w.writeBits(dict(i).toLong, widthV); i += 1 }
    i = 0
    while (i < values.length) {
      val idx = java.util.Arrays.binarySearch(dict, values(i))
      w.writeBits(idx.toLong, widthIdx)
      i += 1
    }
  }

  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
    val card = r.readBits(32).toInt
    val widthV = r.readBits(6).toInt
    val dict = new Array[Int](card)
    var i = 0
    while (i < card) { dict(i) = r.readBits(widthV).toInt; i += 1 }
    val widthIdx = IntCodecs.bitsFor(card.toLong - 1)
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = dict(r.readBits(widthIdx).toInt); i += 1 }
    out
  }

  /** Encoder bound to the block's ALREADY-COMPUTED sorted dictionary (the
    * selection stats pass's `distinctValues`): skips re-deriving the set
    * through a boxing TreeSet and replaces the per-value binary search with
    * one open-addressing probe. Payload is bit-identical to
    * [[DictCodec.encode]] — same sorted dict, same widths, same indexes —
    * pinned by a randomized equivalence test.
    */
  final class Bound(dict: Array[Int]) extends IntBlockCodec {
    val id: Byte = IntCodecs.DictId
    val name = "dict"
    def estimateBits(s: BlockStats): Long = DictCodec.estimateBits(s)

    def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
      val widthV = IntCodecs.bitsFor(if (dict.isEmpty) 0L else dict(dict.length - 1).toLong)
      val widthIdx = IntCodecs.bitsFor(dict.length.toLong - 1)
      w.writeBits(dict.length.toLong, 32)
      w.writeBits(widthV.toLong, 6)
      var i = 0
      while (i < dict.length) { w.writeBits(dict(i).toLong, widthV); i += 1 }
      // value -> dict index, open addressing (values non-negative; -1 empty)
      val capacity = math.max(Integer.highestOneBit(math.max(dict.length, 1) * 4 - 1) * 2, 16)
      val mask = capacity - 1
      val keys = new Array[Int](capacity)
      java.util.Arrays.fill(keys, -1)
      val idxs = new Array[Int](capacity)
      i = 0
      while (i < dict.length) {
        var slot = ((dict(i) * 0x9e3779b9) >>> 17) & mask
        while (keys(slot) != -1) slot = (slot + 1) & mask
        keys(slot) = dict(i)
        idxs(slot) = i
        i += 1
      }
      i = 0
      while (i < values.length) {
        val v = values(i)
        var slot = ((v * 0x9e3779b9) >>> 17) & mask
        while (keys(slot) != v) slot = (slot + 1) & mask
        w.writeBits(idxs(slot).toLong, widthIdx)
        i += 1
      }
    }

    def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] =
      DictCodec.decode(r, n, rowOffsets)
  }
}

/** The reference's hybrid canonical-Huffman codec over a shared (broadcast)
  * symbol table. Row-sensitive: the context model resets at each row
  * boundary (per-list state, /root/reference/src/main.rs:394-399 and the
  * Zuckerli model, context_model.rs:70-189), so every row is independently
  * decodable given its start bit. Payload carries no header — tables ship
  * via the block's tableHash + the job manifest.
  */
final class HybridCodec(tables: SymbolTables, model: ContextModel) extends IntBlockCodec {
  require(
    tables.numContexts >= model.minContexts,
    s"tables have ${tables.numContexts} contexts; model ${model.name} needs ${model.minContexts}"
  )

  /** Prev-token model over `numContexts` contexts (the original default). */
  def this(tables: SymbolTables, numContexts: Int) =
    this(tables, new SimpleContextModel(numContexts))

  val id: Byte = IntCodecs.HybridId
  val name = "hybrid"

  // The default prev-token model runs on dedicated loops with the context
  // arithmetic inlined: the virtual first/next dispatch per value costs
  // ~16% encode throughput (measured), which matters on a path that moves
  // 10^8 tokens/s/core. simpleNCtx > 0 selects the fast path.
  private val simpleNCtx: Int = model match {
    case s: SimpleContextModel => s.numContexts
    case _ => 0
  }

  @transient private lazy val lut: Array[Array[Int]] = Huffman.decoderLut(tables)

  // encoder LUT: (codeLen << 24 | code) per (ctx, token) — one lookup per
  // written value where nBits + codes cost two (the write loop runs at
  // ~10 ns/value, so the second dereference is measurable); codeLen 0 =
  // absent symbol
  @transient private lazy val encLut: Array[Array[Int]] = Huffman.encoderLut(tables)

  def tableHash: Long = tables.tableHash
  def contextModel: ContextModel = model

  /** Bit cost of the self-describing table header (O7) — charged to the
    * hybrid side during selection when blocks embed their tables.
    */
  lazy val headerBits: Long = {
    val w = new BitWriter(4096)
    Huffman.writeHeader(tables, w)
  }

  /** Exact cost; needs the actual values, so stats-only estimation is done
    * by [[exactBits]] during selection instead.
    */
  def estimateBits(stats: BlockStats): Long = Long.MaxValue

  def exactBits(values: Array[Int], rowOffsets: Array[Int]): Long = {
    var bits = 0L
    var row = 0
    if (simpleNCtx > 0) {
      // prev-token fast path with ONE split per value: the token feeding
      // bitCost is also the next context (clamped), so the context chain
      // never recomputes it
      val ctxMax = simpleNCtx - 1
      val nBits = tables.nBits
      while (row < rowOffsets.length - 1) {
        var ctx = 0
        var i = rowOffsets(row)
        while (i < rowOffsets(row + 1)) {
          val packed = Hybrid.split(values(i).toLong)
          val tok = Hybrid.splitToken(packed)
          val nb = nBits(ctx)(tok).toInt
          bits += (if (nb == 0) 1 << 24 else nb + Hybrid.splitNBits(packed))
          ctx = if (tok < ctxMax) tok else ctxMax
          i += 1
        }
        row += 1
      }
    } else {
      while (row < rowOffsets.length - 1) {
        var ctx = model.first(rowOffsets(row + 1) - rowOffsets(row))
        var i = rowOffsets(row)
        while (i < rowOffsets(row + 1)) {
          val v = values(i).toLong
          bits += tables.bitCost(ctx, v)
          ctx = model.next(v)
          i += 1
        }
        row += 1
      }
    }
    bits
  }

  /** One-pass fusion of [[BlockStats.compute]] and [[exactBits]]: codec
    * auto-selection's pre-encode analysis touches each block's values ONCE
    * instead of twice. The block-encode path is memory-bandwidth-bound at
    * high core counts (Bench: staged-auto scales worse than hybrid-only),
    * so the saved pass buys more than its instruction count. Must stay
    * equivalent to (BlockStats.compute(values, 0, n), exactBits(values,
    * rowOffsets)) — pinned by a randomized equivalence test.
    */
  def exactBitsAndStats(values: Array[Int], rowOffsets: Array[Int]): (BlockStats, Long) = {
    val n = values.length
    if (n == 0) return (BlockStats(0, 0, 0, 0, 0, 0, Array.emptyIntArray, 0L), 0L)
    require(rowOffsets(rowOffsets.length - 1) == n, "rowOffsets must cover the whole stream")
    var min = Int.MaxValue
    var max = Int.MinValue
    var runs = 1
    var runLen = 1
    var maxRun = 1
    val delta = new DeltaBitsAcc
    val capacity = Integer.highestOneBit(BlockStats.DictCap * 4 - 1) * 2
    val mask = capacity - 1
    val set = new Array[Int](capacity)
    java.util.Arrays.fill(set, -1)
    var setSize = 0
    var capped = false
    var prev = values(0)
    var bits = 0L
    var row = 0
    while (row < rowOffsets.length - 1) {
      var ctx =
        if (simpleNCtx > 0) 0 else model.first(rowOffsets(row + 1) - rowOffsets(row))
      var i = rowOffsets(row)
      while (i < rowOffsets(row + 1)) {
        val v = values(i)
        if (v < min) min = v
        if (v > max) max = v
        delta.add(v)
        if (i > 0) {
          if (v == prev) { runLen += 1; if (runLen > maxRun) maxRun = runLen }
          else { runs += 1; runLen = 1 }
        }
        if (!capped && v != prev || i == 0) {
          var slot = ((v * 0x9e3779b9) >>> 17) & mask
          while (set(slot) != -1 && set(slot) != v) slot = (slot + 1) & mask
          if (set(slot) == -1) {
            set(slot) = v
            setSize += 1
            if (setSize > BlockStats.DictCap) capped = true
          }
        }
        prev = v
        val vl = v.toLong
        // one split serves both the cost lookup and (on the simple model)
        // the next context — chooseContext would recompute it
        val packed = Hybrid.split(vl)
        val tok = Hybrid.splitToken(packed)
        val nb = tables.nBits(ctx)(tok).toInt
        bits += (if (nb == 0) 1 << 24 else nb + Hybrid.splitNBits(packed))
        ctx =
          if (simpleNCtx > 0) { if (tok < simpleNCtx - 1) tok else simpleNCtx - 1 }
          else model.next(vl)
        i += 1
      }
      row += 1
    }
    val distinct = if (capped) BlockStats.DictCap + 1 else setSize
    val dv =
      if (capped) Array.emptyIntArray
      else {
        val out = new Array[Int](setSize)
        var j = 0
        var s = 0
        while (s < capacity) {
          if (set(s) != -1) { out(j) = set(s); j += 1 }
          s += 1
        }
        java.util.Arrays.sort(out)
        out
      }
    (BlockStats(n, min, max, runs, maxRun, distinct, dv, delta.result()), bits)
  }

  def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
    encodeWithRowBits(values, rowOffsets, w)
    ()
  }

  /** Encode and return each row's payload bit LENGTH (the O25 random-access
    * index: a decoder prefix-sums these to seek straight to a row).
    */
  def encodeWithRowBits(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Array[Int] = {
    val nRows = rowOffsets.length - 1
    val rowBits = new Array[Int](nRows)
    var row = 0
    if (simpleNCtx > 0) {
      // prev-token fast path: the fused encoder LUT serves code+length in
      // one lookup, and the token it was indexed by IS the next context
      // (clamped) — no recompute per value
      val ctxMax = simpleNCtx - 1
      val el = encLut
      while (row < nRows) {
        val before = w.bitsWritten
        var ctx = 0
        var i = rowOffsets(row)
        while (i < rowOffsets(row + 1)) {
          val v = values(i).toLong
          val packed = Hybrid.split(v)
          val tok = Hybrid.splitToken(packed)
          val nb = Hybrid.splitNBits(packed)
          val entry = el(ctx)(tok)
          val codeLen = entry >>> 24
          if (codeLen == 0)
            throw new IllegalStateException(
              s"value $v (token $tok) absent from tables in ctx $ctx"
            )
          // one fused append: code low, raw mantissa above (identical
          // stream layout to Huffman.writeValueTok)
          val total = codeLen + nb
          if (total < 64)
            w.writeBits((entry & 0xffffff).toLong | (Hybrid.rawBits(v, nb) << codeLen), total)
          else {
            w.writeBits((entry & 0xffffff).toLong, codeLen)
            w.writeBits(Hybrid.rawBits(v, nb), nb)
          }
          ctx = if (tok < ctxMax) tok else ctxMax
          i += 1
        }
        rowBits(row) = rowBitLen(w.bitsWritten - before)
        row += 1
      }
    } else {
      while (row < nRows) {
        val before = w.bitsWritten
        var ctx = model.first(rowOffsets(row + 1) - rowOffsets(row))
        var i = rowOffsets(row)
        while (i < rowOffsets(row + 1)) {
          val v = values(i).toLong
          Huffman.writeValue(tables, ctx, v, w)
          ctx = model.next(v)
          i += 1
        }
        rowBits(row) = rowBitLen(w.bitsWritten - before)
        row += 1
      }
    }
    rowBits
  }

  /** Row bit lengths ride in an int column; a silent overflow (a single
    * row beyond ~33M tokens) would corrupt the random-access index.
    */
  @inline private def rowBitLen(bits: Long): Int = {
    require(bits <= Int.MaxValue, s"row payload of $bits bits overflows the row index")
    bits.toInt
  }

  def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
    val out = new Array[Int](n)
    var row = 0
    while (row < rowOffsets.length - 1) {
      decodeRowInto(r, out, rowOffsets(row), rowOffsets(row + 1))
      row += 1
    }
    out
  }

  /** Decode one row of `until - from` values at the reader's position. */
  @inline private def decodeRowInto(r: BitReader, out: Array[Int], from: Int, until: Int): Unit = {
    if (simpleNCtx > 0) {
      // prev-token fast path with the LUT read inlined: the entry already
      // carries the decoded TOKEN, which is the next context (clamped) —
      // chooseContext's floor-log2 recompute per value drops out
      val l = lut
      val maxBits = tables.maxBits
      val ctxMax = simpleNCtx - 1
      var ctx = 0
      var i = from
      while (i < until) {
        val entry = l(ctx)(r.peekBits(maxBits))
        val codeLen = entry >>> 24
        val nb = (entry >>> 16) & 0xff
        val tok = entry & 0xffff
        val v =
          if (codeLen + nb <= 57) {
            val bits = r.readBits(codeLen + nb) >>> codeLen
            Hybrid.assemble(tok, bits)
          } else {
            r.skipBits(codeLen)
            val bits = if (nb > 0) r.readBits(nb) else 0L
            Hybrid.assemble(tok, bits)
          }
        out(i) = v.toInt
        ctx = if (tok < ctxMax) tok else ctxMax
        i += 1
      }
    } else {
      var ctx = model.first(until - from)
      var i = from
      while (i < until) {
        val v = Huffman.readValue(lut, tables.maxBits, ctx, r)
        out(i) = v.toInt
        ctx = model.next(v)
        i += 1
      }
    }
  }

  /** Random-access row decode: seek + decode a single row (context models
    * reset per row, so rows are independent given their start bit).
    */
  def decodeRow(r: BitReader, nTok: Int): Array[Int] = {
    val out = new Array[Int](nTok)
    decodeRowInto(r, out, 0, nTok)
    out
  }

  /** Random-access row decode into a caller-owned buffer at `off` — lets a
    * reader concatenate sparse point-read rows into one contiguous block
    * buffer without a per-row intermediate array.
    */
  def decodeRow(r: BitReader, nTok: Int, out: Array[Int], off: Int): Unit =
    decodeRowInto(r, out, off, off + nTok)

  /** Decode while measuring per-context bit usage via bit-position deltas
    * (the reference StatsDecoder approach, /root/reference/src/graphs/
    * stats.rs:45-151). `counts`/`codeBits`/`rawBits` are per-context
    * accumulators of length tables.numContexts.
    */
  def decodeWithStats(
      r: BitReader,
      n: Int,
      rowOffsets: Array[Int],
      counts: Array[Long],
      codeBits: Array[Long],
      rawBits: Array[Long]
  ): Array[Int] = {
    val out = new Array[Int](n)
    val maxBits = tables.maxBits
    var row = 0
    while (row < rowOffsets.length - 1) {
      var ctx = model.first(rowOffsets(row + 1) - rowOffsets(row))
      var i = rowOffsets(row)
      while (i < rowOffsets(row + 1)) {
        val before = r.bitPos
        val entry = lut(ctx)(r.peekBits(maxBits))
        r.skipBits(entry >>> 24)
        val afterCode = r.bitPos
        val tok = entry & 0xffff
        val nb = (entry >>> 16) & 0xff
        val bits = if (nb > 0) r.readBits(nb) else 0L
        val v = Hybrid.assemble(tok, bits)
        counts(ctx) += 1
        codeBits(ctx) += afterCode - before
        rawBits(ctx) += r.bitPos - afterCode
        out(i) = v.toInt
        ctx = model.next(v)
        i += 1
      }
      row += 1
    }
    out
  }
}

/** Cost-based per-block codec selection: pick the codec with the smallest
  * exact encoded size (generalizing the reference's estimator-driven
  * selection rounds, /root/reference/src/graphs/convert.rs:95-152).
  */
object CodecSelector {
  // DeltaCodec is LAST: selection uses strict <, so on a tie the earlier
  // (simpler / non-chained) codec wins — delta must be strictly smaller to
  // be chosen. The DuckDB oracle (q_codec_cost) mirrors this order.
  val lightweight: Seq[IntBlockCodec] =
    Seq(BitPackCodec, ForCodec, RleCodec, DictCodec, DeltaCodec)

  /** Returns (codec, predicted payload bits). `hybridExtraBits` charges
    * per-block overhead to the hybrid side (e.g. an embedded table header).
    */
  def select(
      values: Array[Int],
      rowOffsets: Array[Int],
      hybrid: Option[HybridCodec],
      hybridExtraBits: Long = 0L
  ): (IntBlockCodec, Long) = {
    // with a hybrid candidate, stats and the hybrid exact cost come from
    // ONE fused pass over the values (see HybridCodec.exactBitsAndStats)
    val (stats, hybridBits) = hybrid match {
      case Some(h) => h.exactBitsAndStats(values, rowOffsets)
      case None => (BlockStats.compute(values, 0, values.length), Long.MaxValue)
    }
    var best: IntBlockCodec = PlainCodec
    var bestBits: Long = PlainCodec.estimateBits(stats)
    lightweight.foreach { c =>
      val b = c.estimateBits(stats)
      if (b < bestBits) { best = c; bestBits = b }
    }
    hybrid.foreach { h =>
      val b = hybridBits + hybridExtraBits
      if (b < bestBits) { best = h; bestBits = b }
    }
    // entropy-coded residual trial, gated by the fixed-width delta estimate.
    // Block-level only (hybrid.isDefined): the per-doc/metadata selection
    // paths — and q_codec_cost's closed-form DuckDB oracle — stay on the
    // stats-only family above.
    if (hybrid.isDefined) {
      DeltaHybrid.tryBuild(values, rowOffsets, stats.deltaBits, bestBits).foreach {
        case (enc, b) => best = enc; bestBits = b
      }
    }
    // dict won: hand the encoder the dictionary the stats pass already
    // computed (sorted exact distinct set), so encode skips rebuilding it
    if ((best eq DictCodec) && stats.n > 0 && stats.distinctValues.nonEmpty)
      best = new DictCodec.Bound(stats.distinctValues)
    (best, bestBits)
  }

  /** Encode a standalone integer metadata column (e.g. per-row n_tok) with
    * the best lightweight codec; payload is self-contained given the name.
    */
  def encodeIntColumn(values: Array[Int]): (String, Array[Byte]) = {
    val offsets = Array(0, values.length)
    val (codec, _) = select(values, offsets, None)
    val w = new graft.core.BitWriter(values.length / 2 + 16)
    codec.encode(values, offsets, w)
    (codec.name, w.toBytes)
  }

  def decodeIntColumn(name: String, bytes: Array[Byte], n: Int): Array[Int] = {
    val codec: IntBlockCodec =
      if (name == PlainCodec.name) PlainCodec
      else
        lightweight
          .find(_.name == name)
          .getOrElse(throw new IllegalArgumentException(s"unknown int column codec $name"))
    codec.decode(new graft.core.BitReader(bytes), n, Array(0, n))
  }

  def decoderFor(id: Byte, hybrid: Option[HybridCodec]): IntBlockCodec = id match {
    case IntCodecs.PlainId => PlainCodec
    case IntCodecs.BitPackId => BitPackCodec
    case IntCodecs.ForId => ForCodec
    case IntCodecs.RleId => RleCodec
    case IntCodecs.DictId => DictCodec
    case IntCodecs.DeltaId => DeltaCodec
    case IntCodecs.DeltaHybridId => DeltaHybrid.Decoder // self-describing payload
    case IntCodecs.HybridId =>
      hybrid.getOrElse(throw new IllegalStateException("hybrid tables not provided"))
    case other => throw new IllegalArgumentException(s"unknown codec id $other")
  }
}
