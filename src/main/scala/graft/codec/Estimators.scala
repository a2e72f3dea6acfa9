package graft.codec

import graft.core.Hybrid

/** Pluggable per-value bit-cost estimators — the reference's estimator trio
  * (/root/reference/src/graphs/estimator/fixed_estimator.rs:8-58,
  * log2_estimator.rs:8-58, huffman_estimator.rs:11-108) retargeted to block
  * routing: analysis rounds score "what would the hybrid entropy coder pay
  * for this stream" WITHOUT building tables or writing bits. Round 1 uses
  * the Log2 prior (the reference's bootstrap), later rounds the Huffman
  * estimator over the previous round's measured cost model.
  */
sealed trait CostEstimator extends Serializable {
  def name: String

  /** Estimated bits to encode `value` in context `ctx`. */
  def bits(ctx: Int, value: Long): Long
}

/** 1 bit per value — ranks streams purely by length (reference
  * FixedEstimator).
  */
object FixedEstimator extends CostEstimator {
  val name = "fixed"
  @inline def bits(ctx: Int, value: Long): Long = 1L
}

/** floor(log2(v+2)) bits per value — the scale-free bootstrap prior
  * (reference Log2Estimator: `u64::ilog2(value + 2)`).
  */
object Log2Estimator extends CostEstimator {
  val name = "log2"
  @inline def bits(ctx: Int, value: Long): Long =
    (63 - java.lang.Long.numberOfLeadingZeros(value + 2)).toLong
}

/** Entropy cost from a measured per-(ctx, token) cost model (code bits
  * ~ log2(total/freq)) plus the token's raw mantissa bits (reference
  * HuffmanEstimator over the previous round's histograms).
  */
final class HuffmanCostEstimator(costModel: Array[Array[Int]]) extends CostEstimator {
  val name = "huffman"
  @inline def bits(ctx: Int, value: Long): Long = {
    val packed = Hybrid.split(value)
    costModel(ctx)(Hybrid.splitToken(packed)).toLong + Hybrid.splitNBits(packed)
  }
}
