package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The whole-operator custom-Catalyst path (SURVEY §7.2 option (c)): a
  * native point-in-time (as-of) join as a logical node + planner
  * strategy + physical operator, registered through
  * `SparkSessionExtensions` ([[GraftExtensions]]).
  *
  * Semantics (identical to the composed [[graft.operators.TimeJoin
  * .asOfJoin]], and gated by the SAME DuckDB oracle): for each left row,
  * the single right row with the greatest (time, tie) such that
  * `rightTime <= leftTime` on the same key; left-outer — unmatched left
  * rows keep NULL right fields.
  *
  * Physical shape: both sides hash-cluster on the key and sort within
  * partitions by (key, time[, tie]) — which EnsureRequirements provides
  * exactly like a sort-merge join — then ONE streaming merge pass per
  * partition matches every left row in O(|L|+|R|) with O(1) state (the
  * last candidate row). Versus the union+window formulation this skips
  * materializing the unioned frame and the window buffer; versus what
  * Catalyst would do unaided (a `<=` condition plans as a broadcast
  * nested-loop, O(|L|·|R|) per key) it is the difference between
  * feasible and not at 100 TB. Row handling is interpreted (eval +
  * JoinedRow), not codegen — the merge is not the bottleneck at the
  * scan speeds involved; codegen would be the next step.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    lKey: Attribute, rKey: Attribute,
    lTime: Attribute, rTime: Attribute, rTie: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` in [[GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rtie) =>
      AsOfJoinExec(lk, rk, lt, rt, rtie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    lKey: Attribute, rKey: Attribute,
    lTime: Attribute, rTime: Attribute, rTie: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Hash-cluster both sides on the key — EnsureRequirements inserts the
    * two exchanges (or reuses existing compatible partitioning, e.g. a
    * bucketed table) and co-partitions them, exactly as for SMJ. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(lKey)), ClusteredDistribution(Seq(rKey)))

  /** Left: (key, time). Right: (key, time, tie) so that the LAST right
    * row consumed for a (key, time) group is the max-tie one — the
    * documented tie rule falls out of the sort order, costing nothing
    * in the merge itself. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKey, Ascending), SortOrder(lTime, Ascending)),
    Seq(SortOrder(rKey, Ascending), SortOrder(rTime, Ascending),
      SortOrder(rTie, Ascending)))

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](lKey, left.output)
    val lTimeB = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](lTime, left.output)
    val rKeyB = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](rKey, right.output)
    val rTimeB = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](rTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(lKey.dataType)
    val nRight = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        // downstream operators (codegen, exchanges) require UnsafeRow;
        // the projection also snaps the JoinedRow view into a stable row
        private val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
        private val nullRight = new GenericInternalRow(nRight)
        private var rRow: InternalRow = advanceRight()
        // the best candidate so far: the last right row seen with
        // rTime <= current left time on this key (right sort order makes
        // "last seen" = "max (time, tie)"); rows are copied out of the
        // iterator because Spark reuses the underlying UnsafeRow buffer
        private var candKey: Any = null
        private var cand: InternalRow = null
        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val ltRaw = lTimeB.eval(l)
          val lt = if (ltRaw == null) Long.MinValue else ltRaw.asInstanceOf[Long]
          var scanning = lk != null
          while (scanning && rRow != null) {
            val rk = rKeyB.eval(rRow)
            if (rk == null) { rRow = advanceRight() }
            else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) {
                // keys sorted on both sides: a right key below the
                // current left key can never match again — discard
                rRow = advanceRight()
              } else if (cmp == 0) {
                val rtRaw = rTimeB.eval(rRow)
                if (rtRaw == null) { rRow = advanceRight() }
                else if (rtRaw.asInstanceOf[Long] <= lt) {
                  candKey = rk
                  cand = rRow.copy()
                  rRow = advanceRight()
                } else scanning = false
              } else scanning = false
            }
          }
          if (cand != null && lk != null && keyOrd.compare(candKey, lk) == 0)
            toUnsafe(joined(l, cand))
          else toUnsafe(joined(l, nullRight))
        }
      }
    }
  }
}

/** DataFrame-level entry point for the native operator. */
object AsOfJoin {
  /** Native as-of join of `left` against `right`. Column names across
    * the two sides must be disjoint (rename before joining — the output
    * is left.columns ++ right.columns). `rightTie` breaks timestamp ties
    * (greatest wins). Right-side attributes are re-aliased to fresh
    * expression ids so self-joins (both sides carved from one scan) are
    * safe. */
  def apply(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
            leftTime: String, rightTime: String, rightTie: String): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"asOf sides must not share column names, got $dup")
    val r = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"asOf: column '$n' not found in [${p.output.map(_.name).mkString(", ")}]"))
    def requireTime(a: Attribute): Attribute = {
      require(a.dataType == TimestampType || a.dataType == LongType,
        s"asOf time column '${a.name}' must be timestamp or long, got ${a.dataType}")
      a
    }
    Bridge.ofRows(left.sparkSession, AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      requireTime(attr(lPlan, leftTime)), requireTime(attr(rPlan, rightTime)),
      attr(rPlan, rightTie)))
  }
}
