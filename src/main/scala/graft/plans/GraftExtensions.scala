package graft.plans

import org.apache.spark.sql.{SparkSessionExtensions, SparkSessionExtensionsProvider}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BpeCount, BucketRank, DotLong, HilbertIndex, HilbertIndexN, SignBands}

/** Engine extension point, registered the public way:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Injects the native expressions into the session's function registry so
  * operators reach them via `call_function` — no private Spark API, and
  * SQL users get them for free (`SELECT graft_dot_long(a, b)`). Operators
  * fall back to the equivalent higher-order-function form when a session
  * was built without the extension (see `Similarity.dot`), so correctness
  * never depends on registration — only the hot-path speed does.
  */
class GraftExtensions extends SparkSessionExtensionsProvider {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.install(ext)
}

object GraftExtensions {
  val DotLongName = "graft_dot_long"
  val SignBandsName = "graft_sign_bands"
  val SignBandsWideName = "graft_sign_bands_wide"
  val SignBandsXWideName = "graft_sign_bands_xwide"
  val HilbertName = "graft_hilbert"
  val HilbertNName = "graft_hilbert_n"
  val BucketRankName = "graft_bucket_rank"
  val BpeCountName = "graft_bpe_count"

  def install(ext: SparkSessionExtensions): Unit = {
    // the whole-operator path: plans AsOfJoinNode -> AsOfJoinExec
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier(DotLongName),
      new ExpressionInfo(classOf[DotLong].getName, DotLongName),
      (args: Seq[Expression]) => DotLong(args(0), args(1))))
    // the sign-LSH matrix is engine configuration (fixed per deployment),
    // so the SQL surface stays a one-argument function
    ext.injectFunction((
      FunctionIdentifier(SignBandsName),
      new ExpressionInfo(classOf[SignBands].getName, SignBandsName),
      (args: Seq[Expression]) => SignBands(args(0),
        graft.operators.Dedup.hyperplanes, graft.operators.Dedup.RpBandBits)))
    // production-scale signature (128-bit, 16-bit bands): same expression
    // class, wider fixed matrix — see Dedup.ScaledRpBits scaladoc
    ext.injectFunction((
      FunctionIdentifier(SignBandsWideName),
      new ExpressionInfo(classOf[SignBands].getName, SignBandsWideName),
      (args: Seq[Expression]) => SignBands(args(0),
        graft.operators.Dedup.hyperplanesWide, graft.operators.Dedup.ScaledBandBits)))
    // the corpus-growth re-cut: SAME 128-bit signature, 32-bit bands —
    // the band-width ladder rung that keeps random collisions (n²/2^w)
    // below true-dup mass as n grows (see Dedup.XWideBandBits scaladoc)
    ext.injectFunction((
      FunctionIdentifier(SignBandsXWideName),
      new ExpressionInfo(classOf[SignBands].getName, SignBandsXWideName),
      (args: Seq[Expression]) => SignBands(args(0),
        graft.operators.Dedup.hyperplanesWide, graft.operators.Dedup.XWideBandBits)))
    // Hilbert 2-D curve index at the ZOrder quantizer width — the
    // boundary-continuous clustering alternative (see CurveExprs)
    ext.injectFunction((
      FunctionIdentifier(HilbertName),
      new ExpressionInfo(classOf[HilbertIndex].getName, HilbertName),
      (args: Seq[Expression]) => HilbertIndex(args(0), args(1),
        graft.sources.ZOrder.QuantBits)))
    // N-D Hilbert (Skilling transpose form) over an array<bigint> of
    // quantized coordinates — same fixed order as the 2-D kernel, so
    // n_dims <= 3 at the 16-bit quantizer (n*order must fit a long;
    // checked per row against the actual array length)
    ext.injectFunction((
      FunctionIdentifier(HilbertNName),
      new ExpressionInfo(classOf[HilbertIndexN].getName, null, HilbertNName,
        s"$HilbertNName(coords) - Hilbert curve index of an array<bigint> " +
          s"of quantized coordinates at order ${graft.sources.ZOrder.QuantBits} " +
          "(n_dims * order must be <= 63). NULL array or element -> NULL.",
        ""),
      (args: Seq[Expression]) => HilbertIndexN(args(0),
        graft.sources.ZOrder.QuantBits)))
    // equi-depth quantizer kernel: rank of a value among the sorted cut
    // array (binary search; the ZOrder.withZEquiDepth write-time hot
    // path). Session-wide SQL function, so the usage string carries the
    // PRECONDITION any external caller must honor (ADVICE r12): cuts
    // must be sorted non-decreasing — an unsorted array silently
    // mis-ranks (the binary search's upper-bound contract equals the
    // linear count only on sorted input). Nullable-element arrays are
    // rejected at analysis (BucketRank.checkInputDataTypes).
    ext.injectFunction((
      FunctionIdentifier(BucketRankName),
      new ExpressionInfo(classOf[BucketRank].getName, null, BucketRankName,
        s"$BucketRankName(x, cuts) - rank of bigint `x` in `cuts` " +
          "(array<bigint>, MUST be sorted non-decreasing with non-null " +
          "elements; unsorted input silently mis-ranks). Returns the " +
          "count of cut values <= x via upper-bound binary search.",
        ""),
      (args: Seq[Expression]) => BucketRank(args(0), args(1))))
    // BPE tokenizer apply at production vocab scale: token count of a
    // pre-normalized text under a TRAINED merges list bound as a foldable
    // array<struct<x,y>> constant — the rank-map kernel whose cost is
    // independent of vocabulary size (replaces the per-merge replace
    // chain past ~24 merges; see functions.BpeCount)
    ext.injectFunction((
      FunctionIdentifier(BpeCountName),
      new ExpressionInfo(classOf[BpeCount].getName, null, BpeCountName,
        s"$BpeCountName(text, merges) - BPE token count of pre-normalized " +
          "`text` (lowercase, single spaces) under the constant merges " +
          "list `merges` (array<struct<x string, y string>>, rank order, " +
          "must be foldable).",
        ""),
      (args: Seq[Expression]) => BpeCount(args(0), args(1))))
  }
}
