package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join equals window-function formulation on the events table") {
    val out = AsOfJoin.queries("asof_join")(spark, sf0001)
    // reference: last_value over a union trick — tag purchases, then for
    // every event take the latest purchase row at or before it
    val ev = Tables.events(spark, sf0001)
    ev.createOrReplaceTempView("asof_ev")
    val want = spark.sql(
      """WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_event_id,
        |                  value AS p_value
        |           FROM asof_ev WHERE event_type = 'purchase'),
        |ranked AS (
        |  SELECT e.event_id, e.user_id, e.ts, p.p_event_id, p.p_value,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY p.p_ts DESC) AS rn
        |  FROM asof_ev e LEFT JOIN p
        |    ON e.user_id = p.user_id AND p.p_ts <= e.ts)
        |SELECT event_id, user_id, ts, p_event_id, p_value
        |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin)
    assert(out.collect().toSeq == want.collect().toSeq)
  }

  test("physical plan uses AsOfJoinExec with exchanges inserted by Catalyst") {
    val out = AsOfJoin.queries("asof_join")(spark, sf0001)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("no-match and null-key rows get null right side") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 100L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 80L, 7.0)).toDF("k2", "rt", "v")
      .select($"k2", $"rt", $"v")
    val out = AsOfJoin.asof(left, right, "k", "k2", "t", "rt")
      .select($"id", $"v").orderBy($"id").collect()
    assert(out(0).getDouble(1) == 7.0) // id 1: t=100 >= 80
    assert(out(1).isNullAt(1))         // id 2: t=50 < 80 → no match
    assert(out(2).isNullAt(1))         // id 3: different key
  }

  test("equal-timestamp right rows resolve by the tiebreak (greatest wins)") {
    val left = Seq((1L, 5L, 100L)).toDF("id", "k", "t")
    val right = Seq((5L, 100L, 1L, 10.0), (5L, 100L, 3L, 30.0), (5L, 100L, 2L, 20.0))
      .toDF("k2", "rt", "rid", "v")
    val out = AsOfJoin.asof(left, right, "k", "k2", "t", "rt",
      tieBreak = Some("rid")).select($"rid", $"v").collect()
    assert(out.head.getLong(0) == 3L && out.head.getDouble(1) == 30.0)
  }

  test("picks the greatest right ts <= left ts") {
    val left = Seq((1L, 5L, 100L)).toDF("id", "k", "t")
    val right = Seq((5L, 10L, 1.0), (5L, 90L, 2.0), (5L, 100L, 3.0), (5L, 110L, 4.0))
      .toDF("k2", "rt", "v")
    val out = AsOfJoin.asof(left, right, "k", "k2", "t", "rt")
      .select($"v").collect()
    assert(out.head.getDouble(0) == 3.0) // inclusive: rt == t wins
  }

  test("optimizer rule pushes left-only filters below the join, mirrors key filters") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    val filtered = AsOfJoin
      .asof(ev, purchases, "user_id", "p_user_id", "ts", "p_ts",
        tieBreak = Some("p_event_id"))
      .filter(col("user_id") < 50 && col("event_type") === "view")
    // results: pushing must equal filtering the inputs up front
    val want = AsOfJoin.asof(
        ev.filter(col("user_id") < 50 && col("event_type") === "view"),
        purchases, "user_id", "p_user_id", "ts", "p_ts",
        tieBreak = Some("p_event_id"))
      .orderBy(col("event_id")).collect().toSeq
    assert(filtered.orderBy(col("event_id")).collect().toSeq == want)
    // plan: both conjuncts sit BELOW the join, and the key conjunct is
    // mirrored onto the right child too
    val opt = filtered.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val j = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    def filtersIn(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case f: Filter => f.condition.sql }.mkString(" AND ")
    assert(filtersIn(j.left).contains("user_id"), filtersIn(j.left))
    assert(filtersIn(j.left).contains("event_type"), filtersIn(j.left))
    assert(filtersIn(j.right).contains("p_user_id"), filtersIn(j.right))
    assert(opt.collectFirst { case f: Filter
        if f.child.isInstanceOf[AsOfJoinPlan] => f }.isEmpty,
      s"left-only filter stayed above the join:\n$opt")
    // and the pushed predicate reaches the parquet scan
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters: [IsNotNull(user_id), LessThan(user_id,50)") ||
      phys.contains("LessThan(user_id,50)"), phys.take(4000))
  }

  test("optimizer rule leaves right-referencing filters above (semantics!)") {
    // filtering the right side on a non-key column would RE-MATCH an
    // earlier purchase instead of dropping the row — assert the rule
    // refuses, and that results equal the filter-last definition
    val left = Seq((1L, 5L, 100L)).toDF("id", "k", "t")
    val right = Seq((5L, 90L, 0.0), (5L, 80L, 9.0)).toDF("k2", "rt", "v")
    val out = AsOfJoin.asof(left, right, "k", "k2", "t", "rt")
      .filter(col("v") > 1.0)
    // as-of matches rt=90 (v=0.0), the filter then drops the row: the
    // correct answer is EMPTY — a naive right-side push would return 9.0
    assert(out.collect().isEmpty)
    val j = out.queryExecution.optimizedPlan
      .collectFirst { case a: AsOfJoinPlan => a }.get
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    assert(j.right.collect { case f: Filter => f }
      .forall(!_.condition.sql.contains("v")),
      "right-referencing predicate was pushed into the right child")
  }
}
