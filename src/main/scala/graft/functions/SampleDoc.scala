package graft.functions

import graft.ops.XHash
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_sample(doc_id, fraction[, seed])` — the DSv2 scan's deterministic
  * doc-sample membership ([[graft.sources.GraftDataSource]] `sampleDocs`
  * option) as a SQL/Column predicate over ANY table. The point is
  * CONSISTENCY across tables: filtering `documents`, `embeddings`, and a
  * graft corpus read with `option("sampleDocs", f)` by the same
  * (fraction, seed) selects the SAME doc_ids everywhere, so a sampled
  * experiment can join its side tables without re-materializing id lists.
  * Same nesting property as the scan option: membership at a smaller
  * fraction is a subset of membership at a larger one (the hash is compared
  * against the threshold, not re-drawn).
  *
  * fraction and seed must be literals (they parameterize the hash, fixed at
  * plan time); non-string doc_ids are cast — the decimal string form is the
  * cross-engine hash domain the DuckDB oracles recompute.
  */
case class SampleDoc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_sample expects a STRING doc_id, got ${first.dataType.catalogString}")
    else if (!second.foldable || !second.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure("graft_sample fraction must be a numeric literal")
    else if (!third.foldable ||
      !Seq[DataType](LongType, IntegerType, ShortType, ByteType).contains(third.dataType))
      TypeCheckResult.TypeCheckFailure("graft_sample seed must be an integral literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val ppm: Int = {
    val f = second.eval() match {
      case d: java.math.BigDecimal            => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case d: java.lang.Double                => d.doubleValue()
      case f: java.lang.Float                 => f.doubleValue()
      case n: java.lang.Number                => n.doubleValue()
      case other => throw new IllegalArgumentException(s"graft_sample fraction: $other")
    }
    require(f > 0.0 && f < 1.0, s"graft_sample fraction must be in (0,1), got $f")
    math.max(1, math.round(f * 1e6).toInt)
  }

  private lazy val mixedSeed: Long = {
    val s = third.eval() match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(s"graft_sample seed: $other")
    }
    XHash.mix62(s & XHash.Mask62)
  }

  override protected def nullSafeEval(id: Any, f: Any, s: Any): Any =
    SampleDoc.keep(id.asInstanceOf[UTF8String], ppm, mixedSeed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fraction/seed are foldable: bake the derived constants into the
    // generated code so the per-row work is one static call
    val (p, m) = (ppm, mixedSeed)
    nullSafeCodeGen(
      ctx,
      ev,
      (id, _, _) => s"${ev.value} = graft.functions.SampleDoc.keep($id, $p, ${m}L);"
    )
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SampleDoc =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SampleDoc {
  /** The scan option's membership rule, verbatim (DocSample.keep twin). */
  def keep(id: UTF8String, ppm: Int, mixedSeed: Long): Boolean =
    XHash.mix62(XHash.hashChars(id.toString) ^ mixedSeed) % 1000000L < ppm

  /** Column API: graft.functions.SampleDoc.graft_sample($"doc_id", 0.01). */
  def graft_sample(c: Column, fraction: Double, seed: Long = 0L): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    GraftSqlBridge.column(
      SampleDoc(
        Cast(GraftSqlBridge.expression(c), StringType),
        Literal(fraction),
        Literal(seed)
      )
    )
  }
}
