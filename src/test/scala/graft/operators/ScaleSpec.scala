package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("salted sum equals plain groupBy sum") {
    val li = Tables.lineitem(spark, sf0001)
    val got = Scale.saltedSum(li, Seq("l_returnflag"), "l_quantity")
      .orderBy("l_returnflag").collect().toSeq
    val want = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_l_quantity"))
      .orderBy("l_returnflag").collect().toSeq
    assert(got == want)
  }

  test("salted join equals plain join") {
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
      .withColumnRenamed("c_custkey", "o_custkey")
    val got = Scale.saltedJoin(o, c, "o_custkey")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().toSeq
    val want = o.join(c, Seq("o_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(got == want)
  }

  test("approx_count_distinct within rsd bounds of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("bucketed join plans without a shuffle exchange") {
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val (bo, bl) = Scale.bucketedTables(spark, o, l, "o_orderkey", 8,
      "bt_orders", "bt_lineitem")
    // force sort-merge (tiny test tables would broadcast otherwise) to
    // show the bucket layout satisfies the join's distribution: no
    // shuffle exchange on either side
    val joined = bo.hint("merge").join(bl.hint("merge"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() ==
      o.join(l, Seq("o_orderkey")).count())
  }
}
