package graft.core

/** Zuckerli-style hybrid integer split: each non-negative value becomes an
  * entropy-coded token plus raw trailing mantissa bits.
  *
  * Semantics follow the reference scheme (/root/reference/src/huffman/
  * common.rs:16-53 and the Zuckerli paper, Versari et al. 2020): values below
  * 2^k are explicit tokens; larger values pack the exponent n = floor(log2 v),
  * the top `i` mantissa bits and the bottom `j` bits into the token, leaving
  * n - i - j raw bits. Defaults k=4, i=2, j=1.
  */
object Hybrid {
  final val Log2NumExplicit = 4 // k
  final val MsbInToken = 2 // i
  final val LsbInToken = 1 // j
  final val SplitToken = 1 << Log2NumExplicit // 16

  final val DefaultMaxBits = 8
  final val MaxNumContexts = 256

  /** token for `value` (drop the raw-bit info). */
  @inline def token(value: Long): Int = {
    if (value < SplitToken) value.toInt
    else {
      val n = 63 - java.lang.Long.numberOfLeadingZeros(value)
      val m = value & ~(1L << n)
      (SplitToken +
        ((n.toLong - Log2NumExplicit) << (MsbInToken + LsbInToken)) +
        ((m >>> (n - MsbInToken)) << LsbInToken) +
        (m & ((1L << LsbInToken) - 1))).toInt
    }
  }

  /** Full split: packs (token, nRawBits) into one Long as (token << 8 | nRawBits);
    * raw bits are recomputed by [[rawBits]]. Avoids tuple allocation in hot loops.
    */
  @inline def split(value: Long): Long = {
    if (value < SplitToken) value << 8
    else {
      val n = 63 - java.lang.Long.numberOfLeadingZeros(value)
      val m = value & ~(1L << n)
      val tok = SplitToken +
        ((n.toLong - Log2NumExplicit) << (MsbInToken + LsbInToken)) +
        ((m >>> (n - MsbInToken)) << LsbInToken) +
        (m & ((1L << LsbInToken) - 1))
      val nBits = n - MsbInToken - LsbInToken
      (tok << 8) | nBits
    }
  }

  @inline def splitToken(packed: Long): Int = (packed >>> 8).toInt
  @inline def splitNBits(packed: Long): Int = (packed & 0xff).toInt

  /** Raw trailing bits for `value` given its split. */
  @inline def rawBits(value: Long, nBits: Int): Long =
    (value >>> LsbInToken) & ((1L << nBits) - 1)

  /** Number of raw bits implied by `token` (inverse of the split). */
  @inline def tokenNBits(token: Int): Int = {
    if (token < SplitToken) 0
    else
      (Log2NumExplicit - (MsbInToken + LsbInToken) +
        ((token - SplitToken) >>> (MsbInToken + LsbInToken)))
  }

  /** Reassemble a value from its token and raw bits. */
  @inline def assemble(token: Int, bits: Long): Long = {
    if (token < SplitToken) token.toLong
    else {
      val nBits = tokenNBits(token)
      val low = token & ((1 << LsbInToken) - 1)
      val t = token >>> LsbInToken
      (((((1L << MsbInToken) | (t & ((1 << MsbInToken) - 1))) << nBits) | bits) << LsbInToken) | low
    }
  }

  /** Context for the next value given the previous decoded value: the token of
    * the previous value clamped to the context count (reference
    * /root/reference/src/main.rs:394-399).
    */
  @inline def chooseContext(lastValue: Long, numContexts: Int): Int =
    math.min(token(lastValue), numContexts - 1)

  /** Largest token that a stream of values <= maxValue can produce. */
  def maxTokenFor(maxValue: Long): Int = token(math.max(maxValue, 0L))

  /** Smallest maxBits whose symbol space covers all tokens of values <= maxValue. */
  def requiredMaxBits(maxValue: Long): Int = {
    val t = maxTokenFor(maxValue)
    var b = DefaultMaxBits
    while ((1 << b) <= t) b += 1
    b
  }
}
