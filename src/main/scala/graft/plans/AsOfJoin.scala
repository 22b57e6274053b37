package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, NullsFirst, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}

/** Native as-of join — the whole-operator form of
  * [[graft.operators.AsOf.asofJoin]]'s union + running-last
  * composition: for each left row, the latest right row of the same
  * key with `rightTs <= leftTs` (inclusive), null payload when none.
  *
  * Why a custom plan node (ladder step (c)): the composed form is
  * already one shuffle + one sort, but it pays to materialize the
  * union (every right column null-padded onto every left row and vice
  * versa) and runs a window operator over the merged stream. The
  * native exec streams the two sorted sides through a classic merge —
  * no union materialization, no window state machine, and the right
  * side carries only (key, ts, payload). Same distribution
  * requirements as a sort-merge join: both children hash-clustered on
  * the key (EnsureRequirements co-partitions them) and sorted by
  * (key, ts) per partition.
  *
  * Semantics notes: ties on `rightTs` within a key resolve to the
  * last row in partition sort order (same as the composed running
  * `last`); both are deterministic only when (key, ts) is unique on
  * the right — true of event streams keyed by unique event ids.
  * A right row whose payload is NULL counts as a match here (the
  * composed form's `last(ignoreNulls = true)` would skip past it to an
  * earlier non-null row) — supply non-null payloads, or treat a null
  * result as "no usable match" as the query faces do.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    keyName: String,
    leftTsName: String,
    rightTsName: String,
    payloadName: String,
    payloadAttr: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ payloadAttr
  override def producedAttributes: AttributeSet = AttributeSet(payloadAttr)
  // every left column flows through; the right side is consumed by name
  // — block column pruning below this node on both sides
  override def references: AttributeSet = left.outputSet ++ right.outputSet
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  private def bind(name: String, side: SparkPlan, which: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"AsOfJoin: column '$name' not in $which side ${side.output.map(_.name)}"))

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, key, lTs, rTs, payload, payloadAttr) =>
      val lp = planLater(l)
      val rp = planLater(r)
      AsOfJoinExec(
        bind(key, lp, "left"), bind(lTs, lp, "left"),
        bind(key, rp, "right"), bind(rTs, rp, "right"),
        bind(payload, rp, "right"), payloadAttr, lp, rp) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    payload: Attribute,
    payloadAttr: AttributeReference,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ payloadAttr
  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Both sides clustered on the key (EnsureRequirements inserts
    * compatible hash exchanges) ... */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** ... and sorted (key, ts) within partitions — the merge is then a
    * single linear pass over each side. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending, NullsFirst, Seq.empty),
      SortOrder(leftTs, Ascending, NullsFirst, Seq.empty)),
    Seq(SortOrder(rightKey, Ascending, NullsFirst, Seq.empty),
      SortOrder(rightTs, Ascending, NullsFirst, Seq.empty)))

  override def outputOrdering: Seq[SortOrder] = Seq(
    SortOrder(leftKey, Ascending, NullsFirst, Seq.empty),
    SortOrder(leftTs, Ascending, NullsFirst, Seq.empty))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeyB = leftKey; val lTsB = leftTs
    val rKeyB = rightKey; val rTsB = rightTs
    val payloadB = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // cross-side (key, ts) comparison through a shared synthetic
      // schema: project each side to a 2-col row of identical types
      val pairSchema = Seq(
        AttributeReference("k", lKeyB.dataType, lKeyB.nullable)(),
        AttributeReference("t", lTsB.dataType, lTsB.nullable)())
      val pairOrd = GenerateOrdering.generate(
        pairSchema.map(a => SortOrder(a, Ascending, NullsFirst, Seq.empty)),
        pairSchema)
      val keySchema = Seq(pairSchema.head)
      val keyOrd = GenerateOrdering.generate(
        keySchema.map(a => SortOrder(a, Ascending, NullsFirst, Seq.empty)),
        keySchema)
      val lPairProj = UnsafeProjection.create(Seq(lKeyB, lTsB), lOutput)
      val rPairProj = UnsafeProjection.create(Seq(rKeyB, rTsB), rOutput)
      val lKeyProj = UnsafeProjection.create(Seq(lKeyB), lOutput)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyB), rOutput)
      val rPayloadProj = UnsafeProjection.create(Seq(payloadB), rOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      val r = rIter.buffered
      var lastKey: UnsafeRow = null
      var lastPayload: UnsafeRow = null
      val nullPayload = new GenericInternalRow(1) // stays null
      val joined = new JoinedRow
      lIter.map { lRow =>
        val lPair = lPairProj(lRow)
        while (r.hasNext && pairOrd.compare(rPairProj(r.head), lPair) <= 0) {
          val rRow = r.next()
          lastKey = rKeyProj(rRow).copy()
          lastPayload = rPayloadProj(rRow).copy()
        }
        val matched = lastKey != null &&
          keyOrd.compare(lastKey, lKeyProj(lRow)) == 0
        outProj(joined(lRow, if (matched) lastPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object NativeAsOf {
  /** As-of join via the native plan node: left columns + `outName`
    * (the latest `payload` from `right` with the same `key` and
    * `rightTs <= leftTs`, null when none). Columns are plain names
    * bound at planning; registers the strategy on the session
    * (idempotent). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: String,
      outName: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val payloadAttr = AttributeReference(outName,
      right.schema(payload).dataType, nullable = true)()
    GraftBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      key, leftTs, rightTs, payload, payloadAttr))
  }
}
