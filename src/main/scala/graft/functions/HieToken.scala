package graft.functions

import graft.core.Hybrid
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Catalyst expression for the hybrid integer split's token (the
  * entropy-coded part of the reference's encode split,
  * /root/reference/src/huffman/common.rs:38-53), with whole-stage codegen:
  * `hie_token(value)` stays inside the generated loop instead of breaking
  * codegen the way a Scala UDF would.
  */
case class HieToken(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hie_token expects BIGINT, got ${child.dataType.catalogString}"
      )
  }

  override protected def nullSafeEval(value: Any): Any =
    Hybrid.token(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // inline the split arithmetic (k=4, i=2, j=1) — no virtual call
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      s"""
         |if ($v < 16L) {
         |  ${ev.value} = (int) $v;
         |} else {
         |  int $n = 63 - java.lang.Long.numberOfLeadingZeros($v);
         |  long $m = $v & ~(1L << $n);
         |  ${ev.value} = (int) (16L + (((long) $n - 4L) << 3) +
         |    (($m >>> ($n - 2)) << 1) + ($m & 1L));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HieToken =
    copy(child = newChild)
}

object HieToken {
  /** Column API: graft.functions.HieToken.hie_token($"value"). */
  def hie_token(c: Column): Column =
    GraftSqlBridge.column(HieToken(GraftSqlBridge.expression(c.cast("long"))))
}
