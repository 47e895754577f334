package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Sign-random-projection LSH band values of an integerized embedding, in
  * one codegen'd pass: bit b of the signature is `sign(v · matrix(b))`,
  * and consecutive groups of `bandBits` bits pack (MSB-first) into one
  * band value — `matrix.length / bandBits` longs out.
  *
  * The composed form (`transform` over a matrix literal with a dot + an
  * `aggregate` bit-pack) is interpreted end-to-end (HOFs are
  * CodegenFallback) and re-dispatches a lambda per hyperplane row. Here
  * the matrix is a JVM `long[]` reference object and the whole signature
  * is two nested primitive loops inside the stage — the map-side cost of
  * embedding near-dup at corpus scale lives exactly here.
  *
  * The matrix rides along as a constructor constant (not a child
  * expression): it is engine configuration, fixed per deployment, which
  * keeps the SQL surface a plain one-argument function
  * (`graft_sign_bands(ie)`).
  */
case class SignBands(child: Expression, matrix: Seq[Seq[Long]], bandBits: Int)
    extends UnaryExpression {

  private val nBits = matrix.length
  private val dim = matrix.head.length
  private val nBands = nBits / bandBits
  @transient private lazy val flat: Array[Long] = matrix.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_bands"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBits) {
      var s = 0L
      var j = 0
      while (j < n) { s += flat(b * dim + j) * v.getLong(j); j += 1 }
      out(b / bandBits) = (out(b / bandBits) << 1) | (if (s >= 0) 1L else 0L)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("signMatrix", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($dim, $v.numElements());
         |final long[] $out = new long[$nBands];
         |for (int $b = 0; $b < $nBits; $b++) {
         |  long $s = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $s += $matRef[$b * $dim + $j] * $v.getLong($j);
         |  }
         |  $out[$b / $bandBits] = ($out[$b / $bandBits] << 1) | ($s >= 0L ? 1L : 0L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}
