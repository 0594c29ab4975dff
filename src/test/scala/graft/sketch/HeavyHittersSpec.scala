package graft.sketch

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private def rows = HeavyHitters.queries("heavy_hitters")(spark, sf0001)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3)))

  test("no false negatives: every exact heavy hitter survives the sketch filter") {
    val keys = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nTot = keys.values.sum
    val nKeys = Tables.part(spark, sf0001).count()
    val thr = nTot * 3 / (2 * nKeys)
    val trueHeavies = keys.filter(_._2 >= thr).keySet
    assert(trueHeavies.nonEmpty, "fixture must contain a heavy hitter")
    val got = rows
    val candidates = got.map(_._1).toSet
    assert(trueHeavies.subsetOf(candidates),
      s"CM one-sidedness violated: missing ${trueHeavies -- candidates}")
    // flagged = exactly the true heavies; the rescue pass weeds out any
    // collision-inflated candidate
    assert(got.filter(_._4).map(_._1).toSet == trueHeavies)
  }

  test("estimates are one-sided and rescue counts are exact") {
    val keys = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (k, est, exact, _) =>
      assert(exact == keys.getOrElse(k, 0L), s"rescue count wrong for $k")
      assert(est >= exact, s"CM under-estimated $k: $est < $exact")
    }
  }
}
