package graft.core

/** Per-context token-frequency matrix: `counts(ctx)(token)`.
  *
  * The mergeable partial-aggregate of pass 1 (semantics of the reference's
  * `IntegerHistograms`, /root/reference/src/huffman/encoder.rs:101-167) —
  * merge is element-wise sum, so it composes with Spark's partial+final
  * aggregation (`mapPartitions` + `reduce`).
  */
final class Histograms(val numContexts: Int, val numSymbols: Int) extends Serializable {
  val counts: Array[Array[Long]] = Array.ofDim[Long](numContexts, numSymbols)

  def add(ctx: Int, value: Long): Unit = {
    counts(ctx)(Hybrid.token(value)) += 1
  }

  def addToken(ctx: Int, token: Int): Unit = counts(ctx)(token) += 1

  def merge(other: Histograms): Histograms = {
    require(other.numContexts == numContexts && other.numSymbols == numSymbols)
    var c = 0
    while (c < numContexts) {
      val a = counts(c); val b = other.counts(c)
      var s = 0
      while (s < numSymbols) { a(s) += b(s); s += 1 }
      c += 1
    }
    this
  }

  def contextTotal(ctx: Int): Long = {
    var s = 0; var t = 0L
    val a = counts(ctx)
    while (s < numSymbols) { t += a(s); s += 1 }
    t
  }

  def total: Long = (0 until numContexts).map(contextTotal).sum

  /** Flatten for shipping through a Dataset[Array[Long]] reduce. */
  def flat: Array[Long] = {
    val out = new Array[Long](numContexts * numSymbols)
    var c = 0
    while (c < numContexts) {
      System.arraycopy(counts(c), 0, out, c * numSymbols, numSymbols)
      c += 1
    }
    out
  }

  /** Estimated entropy cost in bits per (ctx, token): ~log2(total/freq), plus
    * the token's raw-bit count at use sites (reference cost model,
    * /root/reference/src/huffman/encoder.rs:179-198).
    */
  def costModel: Array[Array[Int]] = {
    val costs = Array.ofDim[Int](numContexts, numSymbols)
    var c = 0
    while (c < numContexts) {
      val tot = contextTotal(c)
      var s = 0
      while (s < numSymbols) {
        val cnt = math.max(counts(c)(s).toDouble, 0.1)
        val invFreq = (tot.toDouble / cnt).toLong
        costs(c)(s) = 63 - java.lang.Long.numberOfLeadingZeros(math.max(invFreq, 2L))
        s += 1
      }
      c += 1
    }
    costs
  }
}

object Histograms {
  def fromFlat(flat: Array[Long], numContexts: Int, numSymbols: Int): Histograms = {
    require(flat.length == numContexts * numSymbols)
    val h = new Histograms(numContexts, numSymbols)
    var c = 0
    while (c < numContexts) {
      System.arraycopy(flat, c * numSymbols, h.counts(c), 0, numSymbols)
      c += 1
    }
    h
  }

  def mergeFlat(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length)
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }
}
