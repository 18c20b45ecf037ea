package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator — SURVEY.md §7.3 path (c): a
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, for semantics
  * Spark's built-in operators don't express directly. Where the
  * composed formulation ([[graft.ops.TemporalJoins.asofJoin]]) unions
  * both inputs and runs an ordered window, this physical operator asks
  * the planner for hash co-partitioning on the key plus (key, ts)
  * ordering — the same requirements a sort-merge join declares — and
  * then streams both sides through a single merge pass per partition:
  * O(left + right), one shuffle per side, zero extra materialization,
  * and the "latest right row so far" is one buffered row of state.
  *
  * Semantics: for each left row, the latest right row with the same key
  * and `right.ts <= left.ts` (ties inclusive); left rows without a match
  * keep nulls (ASOF LEFT JOIN). Key and ts must be LongType /
  * TimestampType (both read as 8-byte longs). NULL never matches (SQL
  * comparison semantics): right rows with a NULL key or ts are skipped,
  * left rows with a NULL key or ts come out with a null payload. If the
  * right side holds several rows with identical (key, ts), the one with
  * the greatest payload (natural struct order over `rightPayload`) is
  * carried — the same deterministic tie-break as the composed
  * union+window formulation ([[graft.ops.TemporalJoins.asofJoin]]
  * orders by the payload struct, last/max wins), so both formulations
  * and reruns agree against one oracle.
  */
final case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

final case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    val rightSchema = right.output
    val payload = rightPayload
    val nPayload = payload.length

    val payloadTypes = payload.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // project the matched right row down to the payload columns; the
      // buffered row must be a copy (unsafe rows are reused by iterators)
      val payloadProj = UnsafeProjection.create(payload, rightSchema)
      // natural struct order over the payload columns — the duplicate
      // (key, ts) tie-break, shared with the union+window formulation
      val payloadOrd =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(payloadTypes)
      val nullRow = new GenericInternalRow(nPayload)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKey = 0L
        private var rTs = 0L
        private var rValid = false
        private var matchRow: InternalRow = _ // copied payload projection
        private var matchKey = 0L
        private var matchTs = 0L
        advanceRight()

        // NULL key/ts never matches: skip such right rows outright (they
        // sort first under SortOrder's nulls-first ascending, so this
        // drains them before any comparisons)
        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && rIter.hasNext) {
            rRow = rIter.next()
            if (!rRow.isNullAt(rKeyIdx) && !rRow.isNullAt(rTsIdx)) {
              rKey = rRow.getLong(rKeyIdx)
              rTs = rRow.getLong(rTsIdx)
              rValid = true
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          // NULL left key/ts: no right row qualifies; the merge cursor
          // stays put (null left rows sort first, before any real key)
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx))
            return joined(l, nullRow)
          val lKey = l.getLong(lKeyIdx)
          val lTs = l.getLong(lTsIdx)
          // consume right rows up to (key, ts); remember the last match,
          // breaking equal-ts duplicates by max payload
          while (rValid &&
              (rKey < lKey || (rKey == lKey && rTs <= lTs))) {
            if (rKey == lKey) {
              val proj = payloadProj(rRow)
              if (matchRow == null || matchKey != rKey || matchTs != rTs ||
                  payloadOrd.compare(proj, matchRow) > 0)
                matchRow = proj.copy()
              matchKey = rKey
              matchTs = rTs
            }
            advanceRight()
          }
          if (matchRow != null && matchKey == lKey) joined(l, matchRow)
          else joined(l, nullRow)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] as [[AsofJoinExec]]; injected via
  * `GraftExtensions` or `session.experimental.extraStrategies`.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lts, rk, rts, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, payload) :: Nil
    case _ => Nil
  }
}

object AsofJoin {

  /** As-of join through the custom operator. Both inputs need `key` and
    * `ts` columns; `rightCols` are carried to the output (nullable).
    */
  def apply(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    val s = left.sparkSession
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsofJoinStrategy
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so its attributes get fresh exprIds — both
    // inputs often derive from the same plan (self-as-of), and without
    // the dedup the Dataset.join API performs, shared ids make the
    // optimizer conflate the two sides
    import org.apache.spark.sql.functions.col
    val rPlan = right.select(
      right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: column $name missing from ${p.output.map(_.name)}"))
    GraftShims.dataFrameOf(s, AsofJoinNode(
      lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts),
      attr(rPlan, key), attr(rPlan, ts),
      rightCols.map(attr(rPlan, _))))
  }
}
