package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed point-in-interval equals the naive theta-join, with no nested loop") {
    val pts = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") > 45).select(col("l_shipdate"))
    val ivs = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderdate"))

    val bucketed = RangeJoin.pointInInterval(pts, "l_shipdate", ivs, "o_orderdate", 7)
      .groupBy(col("o_orderkey")).count()
    val naive = pts.join(ivs,
        col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("o_orderkey")).count()

    val b = bucketed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == n && b.nonEmpty)

    // the scale contract: a hash join on the bucket key, not a BNLJ
    val plan = RangeJoin.queries("range_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n${plan.take(1500)}")
  }

  test("bucketed interval-overlap equals the naive theta-join, each pair exactly once") {
    def side(p: String) = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as(s"${p}_key"),
        col("o_orderdate").cast("date").as(s"${p}_start"),
        // varied lengths: 3..10 days, so intervals span 1..3 buckets and
        // pairs share up to 3 — the first-common-bucket dedup must fire
        date_add(col("o_orderdate").cast("date"),
          (pmod(col("o_orderkey"), lit(8)) + 3).cast("int")).as(s"${p}_end"))
    val a = side("a"); val b = side("b")

    val bucketed = RangeJoin.intervalOverlap(a, "a_start", "a_end",
        b, "b_start", "b_end", 4)
      .select(col("a_key"), col("b_key"))
    val naive = a.join(b,
        col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select(col("a_key"), col("b_key"))

    val bp = bucketed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val np = naive.collect().map(r => (r.getLong(0), r.getLong(1)))
    // multiset equality: no pair lost, no pair duplicated by replication
    assert(bp.length == bp.distinct.length,
      "replicated pair emitted more than once")
    assert(bp.sorted.toSeq == np.sorted.toSeq && bp.nonEmpty)

    val plan = RangeJoin.queries("interval_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval overlap fell back to a nested loop:\n${plan.take(1500)}")
  }

  test("degenerate intervals (end <= start) are excluded, not mis-bucketed") {
    import spark.implicits._
    // a1 proper; a2 EMPTY [d, d); a3 INVERTED (end < start). Without the
    // degeneracy filter a3's descending sequence() would replicate it
    // into buckets it never occupies, and a2 would pass the residual
    // `aStart < bEnd AND bStart < aEnd` against any interval strictly
    // containing its point — both violating ∩-non-empty semantics.
    val a = Seq(
      (1L, "2024-01-01", "2024-01-05"),
      (2L, "2024-01-03", "2024-01-03"),
      (3L, "2024-01-20", "2024-01-10"))
      .toDF("a_key", "as0", "ae0")
      .select($"a_key", $"as0".cast("date").as("a_start"),
        $"ae0".cast("date").as("a_end"))
    val b = Seq(
      (10L, "2024-01-02", "2024-01-04"),   // overlaps a1; contains a2's point
      (20L, "2024-01-08", "2024-01-25"))   // spans a3's inverted range
      .toDF("b_key", "bs0", "be0")
      .select($"b_key", $"bs0".cast("date").as("b_start"),
        $"be0".cast("date").as("b_end"))
    val got = RangeJoin.intervalOverlap(a, "a_start", "a_end",
        b, "b_start", "b_end", 4)
      .select($"a_key", $"b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 10L)),
      s"degenerate intervals must contribute no pair, got $got")
  }

  test("column-name collisions between the two sides are rejected loudly") {
    val pts = Tables.lineitem(spark, sf0001)
      .select(col("l_shipdate"), col("l_orderkey").as("okey"))
    val ivs = Tables.orders(spark, sf0001)
      .select(col("o_orderdate"), col("o_orderkey").as("okey"))
    // a shared non-join column would surface as ambiguous duplicates in
    // the joined output — refuse up front
    val e = intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(pts, "l_shipdate", ivs, "o_orderdate", 7))
    assert(e.getMessage.contains("okey"))
  }
}
