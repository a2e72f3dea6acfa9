package graft.codec

import graft.core._

/** Delta-hybrid: entropy-coded zigzag residuals with per-block embedded
  * tables — the reference's actual successor pipeline (adjacency gaps feed
  * the hybrid coder, /root/reference/src/graphs/convert.rs:95-152) realized
  * as a per-block codec. Where [[DeltaCodec]] bit-packs residuals at
  * per-miniblock fixed widths, this feeds the same residual stream through
  * the canonical-Huffman hybrid coder, which wins whenever the residual
  * distribution is skewed (small gaps common, jumps rare — the shape of
  * sorted id/offset/timestamp streams).
  *
  * Residual chains reset per ROW (prev = 0 at each row start), so rows stay
  * independently decodable and the row_bits random-access index keeps
  * working — point reads seek into dhybrid blocks exactly like hybrid ones.
  * The payload is fully self-describing: it begins with the block's OWN
  * canonical-code header (O7, `Huffman.writeHeader`) over
  * [[DeltaHybrid.NumContexts]] contexts, so decode needs no external tables
  * and no second broadcast table family — the block pays its header bits in
  * selection and must still win.
  *
  * Selection is exact and gated: the per-block residual histogram and
  * package-merge tables are built only when the fixed-width delta estimate
  * ([[BlockStats.deltaBits]]) is within [[GateFactor]] of the best
  * candidate so far — fixed-width is a near-upper-bound on the entropy-
  * coded size, so distant blocks cannot win and skip the extra passes.
  */
object DeltaHybrid {

  /** Residual context count. Fewer than the corpus tables' default 64: the
    * per-block histogram is small and the embedded header grows with
    * contexts, so 16 keeps header amortization and per-block package-merge
    * cost low. A format constant of the codec (readers hardcode it — the
    * header does not self-describe its context count).
    */
  val NumContexts = 16

  /** Canonical-code length limit; 8 covers every token the zigzag-residual
    * domain (< 2^33) can produce, same family as the corpus tables.
    */
  val MaxBits = 8

  /** Below this many values the embedded header cannot amortize and the
    * per-block table build is pure overhead — skip the trial.
    */
  val MinBlockValues = 1024

  /** Run the entropy trial when fixed-width delta is within this factor of
    * the best candidate so far.
    */
  val GateFactor = 1.3

  @inline def zigzag(d: Long): Long = (d << 1) ^ (d >> 63)
  @inline def unzigzag(z: Long): Long = (z >>> 1) ^ -(z & 1L)

  /** Exact-cost trial: Some((encoder, totalBits)) when the entropy-coded
    * residual stream — embedded header included — is strictly smaller than
    * `bestBits`. `deltaBits` is the stats pass's fixed-width delta size
    * (the gate signal).
    */
  def tryBuild(
      values: Array[Int],
      rowOffsets: Array[Int],
      deltaBits: Long,
      bestBits: Long
  ): Option[(Encoder, Long)] = {
    if (values.length < MinBlockValues) return None
    if (bestBits == Long.MaxValue) return None
    if (deltaBits.toDouble >= GateFactor * bestBits.toDouble) return None
    // residual context = token of the PREVIOUS residual, clamped — the same
    // prev-token chain as the corpus coder, so the same one-split-per-value
    // fusion applies (the token feeding the histogram/cost IS the next ctx)
    val hist = new Histograms(NumContexts, 1 << MaxBits)
    var row = 0
    while (row < rowOffsets.length - 1) {
      var prevV = 0L
      var ctx = 0
      var i = rowOffsets(row)
      while (i < rowOffsets(row + 1)) {
        val zz = zigzag(values(i).toLong - prevV)
        prevV = values(i).toLong
        val tok = Hybrid.token(zz)
        hist.addToken(ctx, tok)
        ctx = if (tok < NumContexts - 1) tok else NumContexts - 1
        i += 1
      }
      row += 1
    }
    val tables = Huffman.buildTables(hist, MaxBits)
    var cost = {
      val scratch = new BitWriter(2048)
      Huffman.writeHeader(tables, scratch)
    }
    row = 0
    while (row < rowOffsets.length - 1 && cost < bestBits) {
      var prevV = 0L
      var ctx = 0
      var i = rowOffsets(row)
      while (i < rowOffsets(row + 1)) {
        val zz = zigzag(values(i).toLong - prevV)
        prevV = values(i).toLong
        val packed = Hybrid.split(zz)
        val tok = Hybrid.splitToken(packed)
        val nb = tables.nBits(ctx)(tok).toInt
        cost += (if (nb == 0) 1 << 24 else nb + Hybrid.splitNBits(packed))
        ctx = if (tok < NumContexts - 1) tok else NumContexts - 1
        i += 1
      }
      row += 1
    }
    if (row == rowOffsets.length - 1 && cost < bestBits) Some((new Encoder(tables), cost))
    else None
  }

  /** Write side, carrying the per-block tables [[tryBuild]] prepared.
    * `estimateBits` returns MaxValue so no stats-driven selection can pick
    * this codec accidentally — it is only ever chosen through the trial's
    * exact cost.
    */
  final class Encoder(val tables: SymbolTables) extends IntBlockCodec {
    val id: Byte = IntCodecs.DeltaHybridId
    val name = "dhybrid"
    def estimateBits(s: BlockStats): Long = Long.MaxValue

    def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit = {
      encodeWithRowBits(values, rowOffsets, w)
      ()
    }

    /** Embedded header + rows; returns per-row payload bit lengths (header
      * excluded) — the random-access index, mirroring
      * [[HybridCodec.encodeWithRowBits]].
      */
    def encodeWithRowBits(
        values: Array[Int],
        rowOffsets: Array[Int],
        w: BitWriter
    ): Array[Int] = {
      Huffman.writeHeader(tables, w)
      // fused (codeLen << 24 | code) table — tiny (16 contexts) and built
      // once per winning block; identical stream to writeValueTok
      val encLut = Huffman.encoderLut(tables)
      val nRows = rowOffsets.length - 1
      val rowBits = new Array[Int](nRows)
      var row = 0
      while (row < nRows) {
        val before = w.bitsWritten
        var prevV = 0L
        var ctx = 0
        var i = rowOffsets(row)
        while (i < rowOffsets(row + 1)) {
          val zz = zigzag(values(i).toLong - prevV)
          prevV = values(i).toLong
          val packed = Hybrid.split(zz)
          val tok = Hybrid.splitToken(packed)
          val nb = Hybrid.splitNBits(packed)
          val entry = encLut(ctx)(tok)
          val codeLen = entry >>> 24
          if (codeLen == 0)
            throw new IllegalStateException(s"value $zz (token $tok) absent from tables in ctx $ctx")
          val total = codeLen + nb
          if (total < 64)
            w.writeBits((entry & 0xffffff).toLong | (Hybrid.rawBits(zz, nb) << codeLen), total)
          else {
            w.writeBits((entry & 0xffffff).toLong, codeLen)
            w.writeBits(Hybrid.rawBits(zz, nb), nb)
          }
          ctx = if (tok < NumContexts - 1) tok else NumContexts - 1
          i += 1
        }
        val bits = w.bitsWritten - before
        require(bits <= Int.MaxValue, s"row payload of $bits bits overflows the row index")
        rowBits(row) = bits.toInt
        row += 1
      }
      rowBits
    }

    def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] =
      Decoder.decode(r, n, rowOffsets)
  }

  /** Read side: stateless — every dhybrid payload starts with its own
    * header, parsed on decode. The [[CodecSelector.decoderFor]] dispatch
    * target.
    */
  object Decoder extends IntBlockCodec {
    val id: Byte = IntCodecs.DeltaHybridId
    val name = "dhybrid"
    def estimateBits(s: BlockStats): Long = Long.MaxValue

    def encode(values: Array[Int], rowOffsets: Array[Int], w: BitWriter): Unit =
      throw new UnsupportedOperationException(
        "dhybrid encodes through DeltaHybrid.tryBuild's Encoder"
      )

    def decode(r: BitReader, n: Int, rowOffsets: Array[Int]): Array[Int] = {
      val rows = new RowReader(r) // consumes the header; r now sits at row 0
      val out = new Array[Int](n)
      var row = 0
      while (row < rowOffsets.length - 1) {
        rows.decodeRow(r, out, rowOffsets(row), rowOffsets(row + 1))
        row += 1
      }
      out
    }
  }

  /** Parses the embedded header once, then decodes rows at arbitrary bit
    * positions — the seek-path helper (DSv2 point reads / lookupDocs hand
    * it per-row BitReaders offset by [[dataStart]] + prefix-summed
    * row_bits).
    */
  final class RowReader(header: BitReader) {
    val tables: SymbolTables = Huffman.readHeader(header, MaxBits, NumContexts)

    /** First payload bit after the header — row seeks offset from here. */
    val dataStart: Long = header.bitPos

    private val lut = Huffman.decoderLut(tables)

    def decodeRow(r: BitReader, out: Array[Int], from: Int, until: Int): Unit = {
      // LUT read inlined: the entry's TOKEN is the next context (clamped),
      // so the per-value floor-log2 of chooseContext drops out
      var prevV = 0L
      var ctx = 0
      var i = from
      while (i < until) {
        val entry = lut(ctx)(r.peekBits(MaxBits))
        val codeLen = entry >>> 24
        val nb = (entry >>> 16) & 0xff
        val tok = entry & 0xffff
        val zz =
          if (codeLen + nb <= 57) {
            val bits = r.readBits(codeLen + nb) >>> codeLen
            Hybrid.assemble(tok, bits)
          } else {
            r.skipBits(codeLen)
            val bits = if (nb > 0) r.readBits(nb) else 0L
            Hybrid.assemble(tok, bits)
          }
        prevV += unzigzag(zz)
        out(i) = prevV.toInt
        ctx = if (tok < NumContexts - 1) tok else NumContexts - 1
        i += 1
      }
    }

    def decodeRow(r: BitReader, nTok: Int): Array[Int] = {
      val out = new Array[Int](nTok)
      decodeRow(r, out, 0, nTok)
      out
    }
  }
}
