package graft.functions

import graft.ops.XHash
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Catalyst expression hashing an array<int> column to a 62-bit content key
  * (`graft_token_fold(tokens[, seed])`): FNV-1a over the elements widened
  * UNSIGNED to [0, 2^32) — two docs differing only in int32 sign bits still
  * hash apart — chained from a seed-mixed init and finished with the
  * splitmix-style avalanche, all in [[graft.ops.XHash]]'s 62-bit cross-engine
  * domain so a DuckDB oracle recomputes it exactly with
  * `list_reduce` + HUGEINT arithmetic (see [[TokenFold.oracleSqlExpr]]).
  *
  * This is the engine's content-addressing primitive: two independent seeds
  * give a 124-bit key, collision-safe at web scale (10^12 docs ~ 10^24
  * pairs vs 2^124 — expected collisions ~ 5e-14), while the group-by that
  * uses it shuffles ~30 bytes per document instead of the token payload.
  * Null elements are skipped (the `graft_token_sum` convention); a null
  * array folds to null. Codegen'd: the loop reads primitives straight off
  * the ArrayData (UnsafeArrayData or the graft scan's columnar token
  * vector), so scan -> hash -> partial agg stays one codegen span.
  */
case class TokenFold(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_token_fold"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_token_fold expects (ARRAY<INT>, BIGINT seed), got (${l.catalogString}, ${r.catalogString})"
        )
    }
  }

  override protected def nullSafeEval(arr: Any, seed: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    var h = XHash.mix62((XHash.FnvInit ^ seed.asInstanceOf[Long]) & XHash.Mask62)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val c = a.getInt(i).toLong & 0xffffffffL
        h = XHash.fnvStep(h, c)
      }
      i += 1
    }
    XHash.mix62(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (arr, seed) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val h = ctx.freshName("h")
        val c = ctx.freshName("c")
        val vals = ctx.freshName("vals")
        // mix62/fnvStep inlined as plain long arithmetic (the 62-bit domain
        // is just `& Mask62` after each multiply/add)
        def mix(v: String): String =
          s"""$h = ($v + ${XHash.MixAdd}L) & ${XHash.Mask62}L;
             |$h = (($h ^ ($h >>> 30)) * ${XHash.MixC1}L) & ${XHash.Mask62}L;
             |$h = (($h ^ ($h >>> 27)) * ${XHash.MixC2}L) & ${XHash.Mask62}L;
             |$h = $h ^ ($h >>> 31);""".stripMargin
        val noNulls = left.dataType match {
          case ArrayType(_, containsNull) => !containsNull
          case _ => false
        }
        // statically null-free arrays (the scan's tokens column): one bulk
        // extraction — ColumnarArray.toIntArray lands on the scan vector's
        // arraycopy override, UnsafeArrayData's is one memory copy — then a
        // tight primitive loop; beats a per-element virtual getInt/isNullAt
        // chain on a path that folds every corpus token twice
        val fold =
          if (noNulls)
            s"""final int[] $vals = $arr.toIntArray();
               |for (int $i = 0; $i < $vals.length; $i++) {
               |  final long $c = ((long) $vals[$i]) & 0xffffffffL;
               |  $h = (($h ^ $c) * ${XHash.FnvPrime}L) & ${XHash.Mask62}L;
               |}""".stripMargin
          else
            s"""final int $n = $arr.numElements();
               |for (int $i = 0; $i < $n; $i++) {
               |  if (!$arr.isNullAt($i)) {
               |    final long $c = ((long) $arr.getInt($i)) & 0xffffffffL;
               |    $h = (($h ^ $c) * ${XHash.FnvPrime}L) & ${XHash.Mask62}L;
               |  }
               |}""".stripMargin
        s"""
           |long $h;
           |${mix(s"((${XHash.FnvInit}L ^ $seed) & ${XHash.Mask62}L)")}
           |$fold
           |${mix(h)}
           |${ev.value} = $h;
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): TokenFold = copy(left = newLeft, right = newRight)
}

object TokenFold {
  /** Column API: graft.functions.TokenFold.token_fold($"tokens", seed). */
  def token_fold(c: Column, seed: Long): Column =
    GraftSqlBridge.column(
      TokenFold(GraftSqlBridge.expression(c), Literal(seed))
    )

  /** The DuckDB expression computing `token_fold(col, seed)` WITHOUT the
    * avalanche finisher, over a LIST(INTEGER) column — stage this in a CTE
    * column and finish with `XHash.sqlMix62("<col>")` (the finisher
    * duplicates its operand ~8x, so it must see a column reference, not
    * this whole reduce). The seed-mixed init folds to a Scala-side literal.
    */
  def oracleSqlRawExpr(listExpr: String, seed: Long): String = {
    val h0 = XHash.mix62((XHash.FnvInit ^ seed) & XHash.Mask62)
    val codes = s"list_transform(list_filter($listExpr, t -> t IS NOT NULL), " +
      s"t -> CAST(t AS BIGINT) & 4294967295)"
    s"list_reduce(list_prepend(CAST($h0 AS BIGINT), $codes), " +
      s"(h, c) -> ${XHash.sqlMul62("xor(h, c)", XHash.FnvPrime)})"
  }

  /** The full oracle twin of `token_fold(col, seed)` (raw fold + finisher
    * inline). Prefer [[oracleSqlRawExpr]] staged via a CTE for large lists.
    */
  def oracleSqlExpr(listExpr: String, seed: Long): String =
    XHash.sqlMix62(oracleSqlRawExpr(listExpr, seed))
}
