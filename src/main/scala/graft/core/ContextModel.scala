package graft.core

/** Stateless-per-call context models for the hybrid entropy coder (the
  * Spark retarget of the reference's `ContextModel` trait,
  * /root/reference/src/graphs/context_model.rs:6-19). A row's values are
  * coded left to right; the model picks the entropy table for the first
  * value from the row's length and for each later value from the previous
  * value — exactly the information a random-access decoder has after
  * reading the row metadata, so every model keeps rows independently
  * decodable.
  */
sealed abstract class ContextModel extends Serializable {
  def name: String

  /** Smallest numContexts this model needs. */
  def minContexts: Int

  /** Context of the FIRST value in a row of `nTok` values. */
  def first(nTok: Int): Int

  /** Context of a subsequent value given the previous decoded value. */
  def next(prev: Long): Int
}

/** Prev-token model (the reference CLI's stateful model,
  * /root/reference/src/main.rs:394-399): ctx = token(prev) clamped; the
  * first value sees ctx = token(0) = 0.
  */
final class SimpleContextModel(val numContexts: Int) extends ContextModel {
  val name = "simple"
  // the model indexes the full [0, numContexts) space (next() clamps to
  // numContexts-1), so compatibility checks (HybridCodec's require) must
  // see the whole space — returning 1 here would let a 64-context model
  // pair with 16-context tables and mis-index at encode/decode
  def minContexts = numContexts
  @inline def first(nTok: Int): Int = 0
  @inline def next(prev: Long): Int = math.min(Hybrid.token(prev), numContexts - 1)
}

/** Single shared context (reference ConstantContextModel,
  * context_model.rs:44-65).
  */
final class ConstantContextModel extends ContextModel {
  val name = "single"
  def minContexts = 1
  @inline def first(nTok: Int): Int = 0
  @inline def next(prev: Long): Int = 0
}

/** Zuckerli-style stateful model (context_model.rs:70-189, retargeted to
  * the token-table stream): of the reference's component contexts only the
  * residual family exists here — the FIRST value of a row is keyed by the
  * token of the row length (the reference's FirstResidual keyed by the
  * total-residuals token, :149-152, 16 contexts), and every later value by
  * the token of the previous value (Residual keyed by the last-residual
  * token, :153-156, here 32 contexts). 48 contexts total.
  */
final class ZuckerliContextModel extends ContextModel {
  import ZuckerliContextModel._
  val name = "zuckerli"
  def minContexts = NumContexts
  @inline def first(nTok: Int): Int =
    BaseFirst + math.min(Hybrid.token(nTok.toLong), NumFirst - 1)
  @inline def next(prev: Long): Int =
    BaseRest + math.min(Hybrid.token(prev), NumRest - 1)
}

object ZuckerliContextModel {
  val BaseFirst = 0
  val NumFirst = 16 // reference NUM_FIRST_RESIDUALS, context_model.rs:113
  val BaseRest = NumFirst
  val NumRest = 32 // reference NUM_RESIDUALS is 16; rows here are longer
  val NumContexts: Int = BaseRest + NumRest // 48
}

object ContextModel {
  /** Resolve by name; numContexts must cover the model's context space. */
  def apply(name: String, numContexts: Int): ContextModel = {
    val m: ContextModel = name match {
      case "simple" => new SimpleContextModel(numContexts)
      case "single" => new ConstantContextModel
      case "zuckerli" => new ZuckerliContextModel
      case other => throw new IllegalArgumentException(s"unknown context model $other")
    }
    require(
      numContexts >= m.minContexts,
      s"model $name needs >= ${m.minContexts} contexts, config has $numContexts"
    )
    m
  }
}
