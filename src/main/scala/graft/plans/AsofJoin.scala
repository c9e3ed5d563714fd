package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension: AS-OF LEFT JOIN — for every left row,
  * attach the single right row with the greatest right-time at or
  * before the left row's time ("backward", the default), the smallest
  * right-time at or after it ("forward"), or whichever of the two is
  * closer with ties to backward ("nearest" — pandas merge_asof's
  * direction set, DuckDB's >= / <= ASOF comparators), within the same
  * key. Spark has no
  * native as-of join; the relational spellings are either an
  * inequality join (O(pairs) blowup) or a union + carry-forward window
  * (one shuffle of BOTH tables into one sort — the q40 spelling).
  *
  * This operator instead asks EnsureRequirements for the two sides
  * co-partitioned on their keys and sorted by (key, time) — the
  * sort-merge-join layout — then streams BOTH sorted sides once per
  * partition with a single carried "last match" row: O(|L|+|R|) per
  * partition, no pair expansion, no combined re-sort of the union, and
  * each side's sort can be satisfied for free by an already-bucketed /
  * sorted table. Time columns must be LongType (the engine's integer
  * micros convention, which is also what keeps the oracle bit-exact).
  *
  * Null semantics: a null left time matches nothing; null right times
  * never match; a null in either side's join key never matches (SQL
  * join semantics — unlike a raw ordering compare, where null == null).
  * Unmatched left rows join a null right side (LEFT join).
  *
  * Duplicate-time ties: when several right rows share the matched
  * (key, time), the winner is defined by the single-pass mechanics —
  * backward (and the forward/nearest exact-tie rt == lt path, which
  * reuses the carried `lastMatch`) returns the LAST such row in the
  * sorted right partition, because the advance loop keeps overwriting
  * the carry while rt <= lt; a strictly-future forward match (rt > lt)
  * returns the FIRST such row, because it peeks the un-consumed right
  * head. pandas `merge_asof` picks the first row in both cases, so the
  * exact-tie choice diverges from pandas. Within one (key, time) group
  * the right sort order is not further specified anyway, so callers
  * that need a deterministic winner among exact duplicates should
  * pre-aggregate the right side to one row per (key, time) — q124 does
  * (`Events.scala`), which is also what keeps its oracle bit-exact.
  */
case class AsofJoinPlan(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    direction: String,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    direction: String,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join requires LongType time columns (integer micros)")
  require(tolerance.forall(_ >= 0), "as-of tolerance must be non-negative")
  require(Set("backward", "forward", "nearest")(direction),
    s"unknown as-of direction: $direction")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on their keys (co-partitioned by
    * EnsureRequirements, like a sort-merge join)... */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** ...and sorted by (key, time) so one forward pass suffices. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lOut = left.output
    val rOut = right.output
    val out = output
    // tolerance filters at EMIT time: the carried match is the most
    // recent right row at-or-before the left time, so a carried match
    // older than the bound has no admissible replacement — null side
    val tol = tolerance.getOrElse(Long.MaxValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      // ordering over the PROJECTED key rows (same schema both sides)
      val keyOrdering = GenerateOrdering.generate(
        lKeys.zipWithIndex.map { case (k, i) =>
          SortOrder(BoundReference(i, k.dataType, k.nullable), Ascending)
        })
      val lTimeBound = BindReferences.bindReference(lTime, lOut)
      val rTimeBound = BindReferences.bindReference(rTime, rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // execute() must emit UnsafeRow (getByteArrayRdd / sorters cast):
      // project the JoinedRow through a result projection like Spark's
      // own join execs do. Bound against `output` (right side nullable —
      // unmatched rows carry the all-null GenericInternalRow). The
      // projection reuses one buffer per call — the standard contract;
      // buffering consumers copy().
      val resultProj = UnsafeProjection.create(out, out)
      val rBuf = rIter.buffered
      // last right row whose (key, time) qualified, the key it belongs
      // to — both copied (iterator rows are reused buffers) — and its time
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      var lastMatchTime: Long = 0L
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lKeyHasNull = lKey.anyNull
        val lt = lTimeBound.eval(lRow)
        if (lt != null && !lKeyHasNull) {
          val ltv = lt.asInstanceOf[Long]
          // consume right rows that can never match a LATER left row:
          // smaller keys, or same key with time at-or-before ltv
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val c = keyOrdering.compare(rKey, lKey)
            if (c < 0) {
              rBuf.next()
              // a right row for an earlier key invalidates nothing of
              // ours but its own stale match is dropped below via key check
            } else if (c == 0) {
              val rt = rTimeBound.eval(rBuf.head)
              if (rKey.anyNull) {
                // null keys sort together but never join-match (SQL)
                rBuf.next()
              } else if (rt != null && rt.asInstanceOf[Long] <= ltv) {
                lastMatch = rBuf.next().copy()
                lastMatchKey = lKey.copy()
                lastMatchTime = rt.asInstanceOf[Long]
              } else if (rt == null) {
                rBuf.next() // null right time never matches anything
              } else {
                advancing = false
              }
            } else {
              advancing = false
            }
          }
        }
        // diff >= 0 guards Long overflow on both sides: the match
        // invariants give rt <= lt (backward) / rt >= lt (forward), so
        // a negative difference means the true distance exceeded Long
        // range — necessarily farther than any tolerance
        val ltv = if (lt == null) 0L else lt.asInstanceOf[Long]
        val sameKeyCarry = lastMatch != null && lastMatchKey != null &&
          lt != null && !lKeyHasNull &&
          keyOrdering.compare(lastMatchKey, lKey) == 0
        val backAge = ltv - lastMatchTime
        val backOk = sameKeyCarry && backAge >= 0 && backAge <= tol
        // forward candidate: the carried row at exactly ltv (distance
        // 0 — consumed by the advance loop), else the next unconsumed
        // same-key right row, which the sort guarantees is the
        // smallest right-time > ltv. Peek only: it may still match
        // later left rows.
        var fwdRow: InternalRow = null
        var fwdGap = 0L
        if (direction != "backward" && lt != null && !lKeyHasNull) {
          if (sameKeyCarry && lastMatchTime == ltv) {
            fwdRow = lastMatch
            fwdGap = 0L
          } else if (rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            if (!rKey.anyNull && keyOrdering.compare(rKey, lKey) == 0) {
              val rt = rTimeBound.eval(rBuf.head)
              if (rt != null) {
                val gap = rt.asInstanceOf[Long] - ltv
                if (gap >= 0 && gap <= tol) { fwdRow = rBuf.head; fwdGap = gap }
              }
            }
          }
        }
        val chosen: InternalRow = direction match {
          case "backward" => if (backOk) lastMatch else null
          case "forward"  => fwdRow
          case _ => // nearest: closer side wins, ties to backward
            if (backOk && fwdRow != null) {
              if (backAge <= fwdGap) lastMatch else fwdRow
            } else if (backOk) lastMatch
            else fwdRow
        }
        resultProj(joined(lRow, if (chosen != null) chosen else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: lower the logical as-of join to the merge exec. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(lk, rk, lt, rt, tol, dir, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, tol, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Name-based public API: as-of LEFT join `left` to `right` on
  * `left.leftKey == right.rightKey` and the greatest
  * `right.rightTime <= left.leftTime`. An optional `toleranceUs` bounds
  * the match's age (`leftTime - rightTime <= toleranceUs`, the
  * feature-store freshness window; pandas merge_asof's `tolerance`) —
  * a staler best match joins the null side instead. `direction` picks
  * the match rule: "backward" (default, greatest rightTime <= leftTime),
  * "forward" (smallest rightTime >= leftTime), or "nearest" (closer of
  * the two, ties to backward). Column names of
  * the two sides must not collide (alias the right side first). */
object AsofJoin {
  import org.apache.spark.sql.DataFrame

  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceUs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graft.PlanShim.ofRows(left.sparkSession,
      AsofJoinPlan(Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
        attr(lPlan, leftTime), attr(rPlan, rightTime), toleranceUs, direction,
        lPlan, rPlan))
  }
}
