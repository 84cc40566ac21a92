package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Backward as-of join as a first-class binary operator: for every left
  * row, attach the single right row with the greatest `rightTs <=
  * leftTs` among rows sharing the partition keys (or nulls when none
  * precedes it) — the event/feature-pipeline staple ("state of X as of
  * this event": last feature snapshot, last purchase, last model
  * version). Spark has no native as-of join; the composed-builtin
  * encodings (union + last_value window, or a range join + per-left-row
  * top-1) pay a windowed sort-and-buffer over BOTH inputs or an
  * intermediate the size of the range-join blowup.
  *
  * This operator instead declares SMJ-style requirements — both children
  * clustered on the keys (co-partitioned by EnsureRequirements) and
  * locally sorted by (keys, ts) — then runs a two-pointer merge scan per
  * partition: O(|L| + |R|), no buffering beyond one remembered right
  * row, no intermediate blowup. The local sorts are narrow Tungsten
  * sorts the merge needs anyway; nothing is re-sorted downstream.
  * Right-side ties on (keys, ts) must be pre-resolved by the caller
  * (e.g. aggregate to one row per (keys, ts)) for deterministic output.
  */
case class AsOfJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  // left rows always survive (left-outer semantics); right columns nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // SMJ-style: both sides clustered on the keys (same exprs → same hash
  // partitioning → co-partitioned) and sorted by (keys, ts) so the
  // per-partition merge is a single forward scan of each side.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)) ::
      (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending)) :: Nil

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable locals — a `this` reference in the
    // closure would drag the whole plan subtree into every task binary
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTs = leftTs; val rTs = rightTs
    val lSchema = left.output; val rSchema = right.output
    val outputLocal = output
    val lRdd = left.execute(); val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children not co-partitioned (${lRdd.getNumPartitions} vs " +
        s"${rRdd.getNumPartitions}) — EnsureRequirements should have aligned them")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      // (key..., ts) projections into a common shape so one ordering
      // compares across sides
      val keyTypes = lKeys.map(_.dataType) :+ lTs.dataType
      val lProj = UnsafeProjection.create(lKeys :+ lTs, lSchema)
      val rProj = UnsafeProjection.create(rKeys :+ rTs, rSchema)
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lKeyOnly = UnsafeProjection.create(lKeys, lSchema)
      val rKeyOnly = UnsafeProjection.create(rKeys, rSchema)
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rSchema.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(
        outputLocal, lSchema ++ rSchema.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        private var rNext: InternalRow = _           // lookahead right row
        private var held: UnsafeRow = _              // last right row ≤ current left (same key)
        private var heldKey: UnsafeRow = _
        private def advanceRight(): Unit = {
          rNext = null
          // SQL semantics: a NULL key never equals anything and a NULL ts
          // never satisfies `<=` — rows carrying either can never match,
          // so skip them here (the nulls-first natural ordering would
          // otherwise let them through and diverge from ASOF semantics)
          while (rNext == null && rIter.hasNext) {
            val candidate = rIter.next()
            if (!rProj(candidate).anyNull) rNext = candidate.copy()
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lProj(l)
          val lk = lKeyOnly(l)
          // consume right rows with (key, ts) <= left's; remember the last
          while (rNext != null && ord.compare(rProj(rNext), lkt) <= 0) {
            held = rNext.asInstanceOf[UnsafeRow]
            heldKey = rKeyOnly(held).copy()
            advanceRight()
          }
          // a left NULL key or NULL ts joins nothing, same as SQL
          val matched = !lkt.anyNull && held != null && keyOrd.compare(heldKey, lk) == 0
          resultProj(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  object Strategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoin(lk, rk, lts, rts, l, r) =>
        AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** API surface: backward as-of join `left` with `right` on equal
    * (`leftKeys`[i] = `rightKeys`[i]) keys, matching each left row to the
    * latest right row whose `rightTsCol` <= the left row's `leftTsCol`.
    * Right columns come back nullable; unmatched left rows carry nulls.
    * Right-side (keys, ts) duplicates should be pre-aggregated for
    * deterministic results.
    *
    * When the two inputs share lineage (the common self-derived case —
    * e.g. purchases filtered out of the same events frame), their
    * attribute ids overlap, which a custom binary node must not pass to
    * the optimizer (pruning/dedup rules mis-resolve the duplicate ids) —
    * the right side is re-aliased with fresh ids, names unchanged.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTsCol: String,
      rightTsCol: String): DataFrame = {
    require(leftKeys.nonEmpty, "as-of join needs at least one equality key")
    require(leftKeys.size == rightKeys.size, "key lists must pair up")
    val spark = left.sparkSession
    graft.plans.Strategies.register(spark, Strategy)
    val lPlan = GraftSqlBridge.analyzedPlan(left)
    val sharedIds = lPlan.outputSet.intersect(
      GraftSqlBridge.analyzedPlan(right).outputSet)
    val rightSafe =
      if (sharedIds.isEmpty) right
      else right.select(right.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*)
    val rPlan = GraftSqlBridge.analyzedPlan(rightSafe)
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => plan.output.filter(_.name.equalsIgnoreCase(n)) match {
          case Seq(a) => a
          case Seq() => throw new IllegalArgumentException(
            s"no column $n in ${plan.output.map(_.name).mkString(", ")}")
          case many => throw new IllegalArgumentException(
            s"ambiguous column $n: ${many.map(_.name).mkString(", ")}")
        }
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.size} columns share the name")
      }
    val lk = leftKeys.map(attr(lPlan, _): Expression)
    val rk = rightKeys.map(attr(rPlan, _): Expression)
    require(lk.map(_.dataType) == rk.map(_.dataType),
      "as-of join key types must match on both sides")
    val lTsAttr = attr(lPlan, leftTsCol)
    val rTsAttr = attr(rPlan, rightTsCol)
    // the merge comparator is built from the LEFT types and applied to
    // rows projected with the RIGHT types — a mismatch would compare
    // reinterpreted bits silently, so fail fast instead
    require(lTsAttr.dataType == rTsAttr.dataType,
      s"as-of join timestamp types must match: ${lTsAttr.dataType} vs ${rTsAttr.dataType}")
    GraftSqlBridge.ofRows(spark,
      AsOfJoin(lk, rk, lTsAttr, rTsAttr, lPlan, rPlan))
  }
}
