package graft.codec

/** Lightweight per-column codecs for int64 value streams — the codec family
  * behind the attachable aux columns (per-token logprobs and friends; see
  * [[graft.sources.AuxColumn]]). The same shape as the int32 family
  * ([[IntCodecs]]): small self-describing codecs plus EXACT auto-selection
  * (encode the candidates, keep the smallest — aux payloads are per-doc
  * sized, so trial encoding costs microseconds, not an analysis pass).
  *
  *   - `vz`    zigzag + LEB128 varint (signed-friendly; the plain baseline)
  *   - `dvz`   delta then zigzag-varint (monotone-ish streams — cumulative
  *             logprobs, positions)
  *   - `const` one value, run-length n (all-equal streams — padding masks)
  *
  * All codecs are lossless over the full int64 domain.
  */
object LongCodecs {

  @inline def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** LEB128 on zigzagged longs (≤10 bytes per value). */
  def packVar(values: Array[Long]): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < values.length) {
      var z = zigzag(values(i))
      var n = 1
      while ((z & ~0x7fL) != 0L) { n += 1; z >>>= 7 }
      bytes += n
      i += 1
    }
    val out = new Array[Byte](bytes)
    var o = 0
    i = 0
    while (i < values.length) {
      var z = zigzag(values(i))
      while ((z & ~0x7fL) != 0L) {
        out(o) = ((z & 0x7fL) | 0x80L).toByte
        o += 1
        z >>>= 7
      }
      out(o) = z.toByte
      o += 1
      i += 1
    }
    out
  }

  def unpackVar(packed: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var o = 0
    var i = 0
    while (i < n) {
      var z = 0L
      var shift = 0
      var b = packed(o)
      o += 1
      while ((b & 0x80) != 0) {
        z |= (b & 0x7fL) << shift
        shift += 7
        b = packed(o)
        o += 1
      }
      z |= (b & 0xffL) << shift
      out(i) = unzigzag(z)
      i += 1
    }
    require(o == packed.length, s"varint64 stream: $o of ${packed.length} bytes consumed for $n values")
    out
  }

  private def deltas(values: Array[Long]): Array[Long] = {
    val d = new Array[Long](values.length)
    var prev = 0L
    var i = 0
    while (i < values.length) { d(i) = values(i) - prev; prev = values(i); i += 1 }
    d
  }

  /** Exact auto-selection: smallest encoding wins (ties: vz > dvz > const
    * never matter — sizes differ or the cheaper-to-decode one is kept).
    */
  def encodeAuto(values: Array[Long]): (String, Array[Byte]) = {
    if (values.isEmpty) return ("vz", Array.emptyByteArray)
    var allEqual = true
    var i = 1
    while (allEqual && i < values.length) { allEqual = values(i) == values(0); i += 1 }
    if (allEqual) return ("const", packVar(Array(values(0))))
    val vz = packVar(values)
    val dvz = packVar(deltas(values))
    if (dvz.length < vz.length) ("dvz", dvz) else ("vz", vz)
  }

  def decode(codec: String, payload: Array[Byte], n: Int): Array[Long] = codec match {
    case "vz" =>
      if (n == 0) Array.emptyLongArray else unpackVar(payload, n)
    case "dvz" =>
      val d = unpackVar(payload, n)
      var acc = 0L
      var i = 0
      while (i < n) { acc += d(i); d(i) = acc; i += 1 }
      d
    case "const" =>
      val v = unpackVar(payload, 1)(0)
      Array.fill(n)(v)
    case other => throw new IllegalArgumentException(s"unknown long codec '$other'")
  }
}
