package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("AQE skew join: the hot partition is split (skew=true in the final plan)") {
    // skew_salted_join proves the MANUAL salting path; this pins the
    // case where salting is NOT hand-written — AQE's OptimizeSkewedJoin
    // must split the hot partition at runtime. Thresholds are lowered so
    // the deterministic 90%-one-key fixture triggers at spec scale; the
    // sf10 run of the same shape at the same thresholds is recorded in
    // PLANS.md (tools/SkewDemo).
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k-row fact, 90% of rows on key 0; dim = one row per key.
      // The hot shuffle partition carries ~180k rows (~3 MB ≫ the 64 KB
      // threshold and ≫ 2× the median partition), the rest are tiny.
      val fact = spark.range(0, 200000).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      // unique-by-construction dim (a distinct() would leave its final
      // HashAggregate between the shuffle read and the join, and
      // OptimizeSkewedJoin only matches Sort-over-shuffle join inputs)
      val dim = spark.range(0, 200000)
        .filter(col("id") % 10 === 9).select(col("id").as("k"))
        .union(spark.range(0, 1).select(lit(0L).as("k")))
      val j = fact.join(dim, "k")
      // execute THIS queryExecution (count() builds its own) so the
      // adaptive plan below is the final, executed one
      assert(j.collect().length == 200000) // result correctness first
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the hot partition:\n${plan.take(3000)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

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
