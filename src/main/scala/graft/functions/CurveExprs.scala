package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of a quantized 2-D point, as a native codegen'd
  * expression — the measured alternative to [[graft.sources.ZOrder]]'s
  * bit interleave. The Hilbert transform is the classic iterative
  * rotate-and-fold (one pass over the `order` bit levels, O(1) state),
  * which is mutable-register-shaped: it cannot be folded into a pure
  * Column expression the way Z's interleave can, so it lives here as a
  * custom Expression (SURVEY §7.2 option (b)) with an interpreted eval
  * and a whole-stage-codegen body emitting the same loop in Java.
  *
  * Why bother when Z exists: Z's known wart is boundary jumps — a box
  * straddling a HIGH interleave bit touches ~2× the tiles because the
  * curve teleports across the split. Hilbert is continuous (every
  * consecutive index step is a unit grid step — pinned as a property
  * test over the full order-4 grid), so tiles of a range stay edge-
  * connected and the worst-case straddle factor roughly halves.
  * ZORDERLAB_r10.json carries the measured comparison on the same
  * layouts; the default stays Z (simpler, pure-expression) unless the
  * workload is boundary-straddling box queries.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
  extends BinaryExpression {

  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y, d, s, rx, ry, t) = (ctx.freshName("hx"), ctx.freshName("hy"),
        ctx.freshName("hd"), ctx.freshName("hs"), ctx.freshName("rx"),
        ctx.freshName("ry"), ctx.freshName("ht"))
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << ${order - 1}; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Scalar twin of the codegen body (used by eval and by the spec's
    * full-grid property check). Wikipedia's xy2d with the standard
    * rotate step. */
  def compute(x0: Long, y0: Long, order: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (order - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Equi-depth bucket rank: the index of `value` among the SORTED cut
  * array — `count(c in cuts : value >= c)` — as a native codegen'd
  * binary search. This is the per-row quantizer kernel of
  * [[graft.sources.ZOrder.withZEquiDepth]].
  *
  * Why not `aggregate(cuts, 0L, (acc, c) => acc + when(v >= c, 1, 0))`:
  * Spark's HOFs are `CodegenFallback` — the rank re-dispatched an
  * interpreted lambda 255 times per row, and ZORDERLAB_r11 measured the
  * equi-depth layout BUILD at ~5-7× the linear quantizer's (11.6 vs
  * 2.2 s at sf1, 37.5 vs 5.1 s at sf10) with the rank HOF as the known
  * lever. A re-cluster at 100 TB pays that 5× on every maintenance
  * pass. Here the rank is an O(log n) primitive binary search inside
  * the enclosing WholeStageCodegen stage.
  *
  * Semantics: requires `cuts` non-decreasing (percentile_approx output
  * always is — upper-bound binary search equals the linear count then,
  * duplicates included). Layout key columns are non-null by contract;
  * NULL in either input yields NULL (the HOF fallback maps a NULL value
  * to rank 0 — both land in the lowest tile, so layouts agree on real
  * data; ZOrderSpec pins value equivalence on the data path).
  */
case class BucketRank(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    // containsNull must be FALSE: a null cut element would be read as
    // garbage through ArrayData.getLong (and the HOF fallback counts a
    // null cut as 0 — silently different ranks). percentile_approx
    // output — the internal equi-depth path — is containsNull=false by
    // construction; any other SQL caller with a nullable-element array
    // is rejected at analysis instead of mis-ranking at runtime
    // (ADVICE r12).
    case org.apache.spark.sql.types.ArrayType(LongType, false)
        if left.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, array<bigint> with non-null " +
        s"elements), got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bucket_rank"

  override def nullSafeEval(v: Any, cutsAny: Any): Any = {
    val cuts = cutsAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val x = v.asInstanceOf[Long]
    var lo = 0
    var hi = cuts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts.getLong(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cuts) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $cuts.numElements();
         |while ($lo < $hi) {
         |  final int $mid = ($lo + $hi) >>> 1;
         |  if ($cuts.getLong($mid) <= $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketRank =
    copy(left = newLeft, right = newRight)
}
