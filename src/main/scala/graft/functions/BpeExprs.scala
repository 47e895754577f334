package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}

/** Compiled merge table for [[BpeCount]]: rank-indexed merge rules plus a
  * pair→rank hash index, built ONCE per plan from the foldable merges
  * argument and shipped to executors as a codegen reference object. The
  * lookup is two chained HashMap gets (x → (y → rank)) so the per-pair
  * probe allocates nothing. */
final class BpeTable(val xs: Array[String], val ys: Array[String]) extends Serializable {
  val size: Int = xs.length
  /** merged output symbol per rank */
  val xy: Array[String] = Array.tabulate(size)(i => xs(i) + ys(i))
  /** Inner values are boxed [[java.lang.Integer]] ON PURPOSE: with a
    * Scala `Int` value type, `get` on a missing key unboxes Java's null
    * to 0 — every absent pair would alias rank 0 and a word without the
    * rank-0 pair would loop forever in the kernel (found the hard way:
    * a 331 s-CPU stuck task in the first spec run). */
  @transient lazy val rank: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var i = 0
    while (i < size) {
      var inner = m.get(xs(i))
      if (inner == null) { inner = new java.util.HashMap[String, Integer](); m.put(xs(i), inner) }
      // first (lowest) rank wins if a pair ever repeats in a list
      if (!inner.containsKey(ys(i))) inner.put(ys(i), Integer.valueOf(i))
      i += 1
    }
    m
  }
}

/** BPE token count of a pre-normalized text under a TRAINED merges list —
  * the vocab-axis scale path for the BPE family (VERDICT r15 #1). The r15
  * apply was a foldLeft of one `replace` Expression per merge: exact and
  * codegen'd at the gated 8–24 merges, but a production 32k–100k-merge
  * vocab blows the JVM/codegen method limit (→ CodegenFallback,
  * O(merges·len) interpreted per row). This expression binds the merges
  * ONCE (a foldable array<struct> argument — typically a `typedLit` of
  * the trained list) and runs the classic rank-map tokenizer per word:
  * find the lowest-ranked adjacent pair present, merge ALL its
  * occurrences leftmost-first, repeat. Cost per word is
  * O(len · merges-applied), INDEPENDENT of vocabulary size — the same
  * algorithm production tokenizers use.
  *
  * Semantics contract: for a WELL-FORMED merges list (each operand is a
  * base character or the output of a strictly earlier merge — true of
  * every greedy-trained list by construction) min-rank-first application
  * equals the sequential rank-order replace chain, which is what the
  * DuckDB oracle applies; TextSpec pins the equivalence word-by-word on
  * the trained 512-merge list and the gate hashes pin it end-to-end.
  * Space (' ') never appears inside a trained symbol, so per-word
  * tokenization composes: total tokens = Σ tokens(word). Input must be
  * pre-normalized (lower, single spaces — `Hashes.normText`); symbols
  * are UTF-16 chars, which equals DuckDB's per-codepoint wrapping on the
  * ASCII corpora this engine trains on.
  *
  * Null: NULL text → NULL. The merges argument must be foldable
  * (plan-time constant); non-foldable input is rejected at analysis.
  */
case class BpeCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(st: StructType, _))
        if st.fields.length == 2 &&
          st.fields.forall(_.dataType == StringType) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (constant) merges argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<struct<string,string>>), " +
        s"got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val table: BpeTable = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[String](n)
    val ys = new Array[String](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      xs(i) = row.getUTF8String(0).toString
      ys(i) = row.getUTF8String(1).toString
      i += 1
    }
    new BpeTable(xs, ys)
  }

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeCount.tokenCount(t.toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    // the merges child is foldable; its generated read is a constant
    // reference the JIT hoists — the table object above is what the
    // kernel actually uses
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeCount.tokenCount($t.toString(), $tableRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeCount =
    copy(left = newLeft, right = newRight)
}

object BpeCount {
  /** Static kernel (called from generated code — a primitive-args static
    * call stays inside whole-stage codegen). Tokenizes each
    * space-separated word with the min-rank-first merge loop and returns
    * the total symbol count. */
  def tokenCount(text: String, table: BpeTable): Long = {
    var total = 0L
    var start = 0
    val len = text.length
    while (start <= len) {
      var end = text.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) total += tokenizeWord(text, start, end, table)
      start = end + 1
    }
    total
  }

  private def tokenizeWord(text: String, from: Int, to: Int, table: BpeTable): Int = {
    var n = to - from
    if (n == 1 || table.size == 0) return n
    val syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = String.valueOf(text.charAt(from + i)); i += 1 }
    val rank = table.rank
    while (n > 1) {
      // lowest-ranked adjacent pair present in the word
      var best = Int.MaxValue
      i = 0
      while (i < n - 1) {
        val inner = rank.get(syms(i))
        if (inner != null) {
          val r = inner.get(syms(i + 1))
          if (r != null && r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) return n
      // merge ALL occurrences of that pair, leftmost-first non-overlap
      val x = table.xs(best); val y = table.ys(best); val m = table.xy(best)
      var w = 0
      i = 0
      while (i < n) {
        if (i < n - 1 && syms(i) == x && syms(i + 1) == y) { syms(w) = m; i += 2 }
        else { syms(w) = syms(i); i += 1 }
        w += 1
      }
      // progress guard: the selected pair was observed adjacent, so the
      // merge pass must shrink the word; a non-shrinking pass means the
      // table and scan disagree — fail loudly instead of spinning a task
      if (w == n) throw new IllegalStateException(
        s"graft_bpe_count made no progress merging rank $best ('$x','$y')")
      n = w
    }
    n // fully merged to one symbol
  }
}
