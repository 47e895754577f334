package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<long>` columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`: Spark's
  * higher-order functions are `CodegenFallback` — every row pays
  * interpreted lambda dispatch plus a materialized intermediate product
  * array. This expression compiles to a tight primitive loop inside the
  * enclosing WholeStageCodegen stage (no allocation, no virtual calls),
  * which is the difference that matters when the dot product is the
  * per-row kernel of a 100 TB similarity scan (reference capability:
  * embedding similarity / near-dup search; see SURVEY.md training-data
  * extensions).
  *
  * Semantics: sum over the common prefix length (inputs here are always
  * equal-length 64-dim vectors); NULL if either array is NULL. Inputs are
  * integerized embeddings (|x| <= 1e7), so products are <= 1e14 and a
  * 64-dim sum is <= 6.4e15 — no overflow anywhere near int64 range, hence
  * the unchecked Java `+`/`*` match the ANSI-checked builtin arithmetic
  * bit-for-bit.
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}
