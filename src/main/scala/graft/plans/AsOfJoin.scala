package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.CatalystBridge

/** AS-OF JOIN as a first-class custom operator — the full
  * LogicalPlan → Strategy → SparkPlan surface (SURVEY.md §7.4, guide
  * "custom operator"), for a join shape vanilla Spark SQL lacks: for each
  * left row, the single right row with the same key and the greatest
  * timestamp ≤ the left timestamp (left-outer semantics).
  *
  * Execution: both children are hash-distributed on the key and sorted by
  * (key, ts) — declared via requiredChildDistribution/Ordering, so
  * Catalyst's EnsureRequirements inserts the exchanges and sorts (and AQE
  * still optimizes them). Each co-partition pair is then merged in one
  * linear pass, carrying the latest matching right row per key: the same
  * cost shape as a sort-merge join, O(|L|+|R|) per partition, no state
  * beyond one buffered row.
  *
  * Keys and timestamps must be long-comparable (bigint / timestamp);
  * DuckDB's native ASOF JOIN is the oracle for the query entry.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Option[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.classic.Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Option[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // right side additionally ordered by the tiebreak so equal-(key, ts)
  // rows resolve deterministically (last in order wins)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // emit UnsafeRows: a JoinedRow reaching an exchange/serializer
      // directly (e.g. when pushdown leaves NO projection between this
      // node and a Sort) is a ClassCastException — every exec node owes
      // its consumers the unsafe format unless it declares otherwise
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIt.buffered
      var candKey = Long.MinValue
      var cand: InternalRow = null
      lIt.map { lrow =>
        val lk = lkB.eval(lrow)
        val lt = ltB.eval(lrow)
        if (lk == null || lt == null) {
          toUnsafe(joined(lrow, nullRight))
        } else {
          val lKey = lk.asInstanceOf[Long]
          val lTs = lt.asInstanceOf[Long]
          // advance the right side up to (lKey, lTs], tracking the last
          // right row whose key matches
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rkB.eval(rBuf.head)
            val rt = rtB.eval(rBuf.head)
            if (rk == null || rt == null) { rBuf.next() }
            else {
              val rKey = rk.asInstanceOf[Long]
              val rTs = rt.asInstanceOf[Long]
              if (rKey < lKey || (rKey == lKey && rTs <= lTs)) {
                val row = rBuf.next()
                if (rKey == lKey) { cand = row.copy(); candKey = rKey }
              } else advance = false
            }
          }
          if (cand != null && candKey == lKey) toUnsafe(joined(lrow, cand))
          else toUnsafe(joined(lrow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  import org.apache.spark.sql.functions._

  /** Query entry: attach to every event the user's most recent
    * prior-or-simultaneous purchase. DuckDB's native ASOF JOIN is the
    * oracle. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> ((s, d) => {
      val ev = graft.Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      asof(ev, purchases, "user_id", "p_user_id", "ts", "p_ts",
        tieBreak = Some("p_event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_event_id"), col("p_value"))
        .orderBy(col("event_id"))
    }))

  def oracle: Map[String, String] = Map(
    "asof_join" ->
      """SELECT e.event_id, e.user_id, e.ts, p.p_event_id, p.p_value
        |FROM events e ASOF LEFT JOIN (
        |  SELECT user_id, ts AS p_ts, event_id AS p_event_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id AND e.ts >= p.p_ts
        |ORDER BY e.event_id""".stripMargin)

  /** Left-outer as-of join: for each left row, the right row with
    * `leftKey = rightKey` and the greatest `rightTsCol` ≤ `leftTsCol`.
    * Use distinct column names on the two sides (the output carries both
    * schemas). Pass `tieBreak` (a right-side column; greatest wins) when
    * (key, ts) may not be unique on the right — without it the choice
    * among equal-timestamp rows is partition-arrival-dependent. */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTsCol: String, rightTsCol: String,
      tieBreak: Option[String] = None): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    CatalystBridge.addStrategy(spark, AsOfJoinStrategy)
    CatalystBridge.addOptimization(spark, PushFilterThroughAsOfJoin)
    val lPlan = CatalystBridge.analyzed(leftDf)
    val rPlan = CatalystBridge.analyzed(rightDf)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    // fail fast on types: the merge evaluates keys/timestamps as Long
    // (bigint / timestamp) — anything else would die mid-job in executors
    def longBacked(a: Attribute, role: String): Attribute = {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      require(Seq(LongType, TimestampType, TimestampNTZType).contains(a.dataType),
        s"$role column '${a.name}' must be bigint or timestamp, got ${a.dataType.simpleString}")
      a
    }
    CatalystBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      longBacked(attr(lPlan, leftKey), "key"),
      longBacked(attr(rPlan, rightKey), "key"),
      longBacked(attr(lPlan, leftTsCol), "timestamp"),
      longBacked(attr(rPlan, rightTsCol), "timestamp"),
      tieBreak.map(n => longBacked(attr(rPlan, n), "tiebreak"))))
  }
}
