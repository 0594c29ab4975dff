package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {

  test("basket_pairs: scalar replay of cap + pair counts + support agrees") {
    val got = Mining.queries("basket_pairs")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val items = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = collection.mutable.Map.empty[(Long, Long), Long]
    items.groupBy(_._1).values.foreach { basket =>
      val capped = basket.map(_._2).sorted.take(8)
      for (i <- capped.indices; j <- i + 1 until capped.length)
        counts((capped(i), capped(j))) =
          counts.getOrElse((capped(i), capped(j)), 0L) + 1L
    }
    val expect = counts.filter(_._2 >= 2).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("the per-basket cap bounds fanout: no basket contributes more than C(8,2)") {
    // replay the pre-cap pipeline and assert the biggest basket's pair
    // contribution is exactly C(min(B, 8), 2) — the straggler bound
    val sizes = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey")).count().collect().map(_.getLong(1))
    assert(sizes.exists(_ > 8), "fixture must contain a cap-binding basket")
    val maxPairs = sizes.map(b => math.min(b, 8L)).map(b => b * (b - 1) / 2).max
    assert(maxPairs <= 28, s"cap failed: $maxPairs pairs from one basket")
  }
}
