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

  // Load-bearing for thr (r17 advice): the query derives n_tot from the
  // pinned sketch as Σ row-0 counters, which silently depends on
  // buckets()/fold() emitting exactly ONE non-dropped row-0 posting per
  // key. If the sketch shape ever changes (row count, null filtering),
  // this must fail before the threshold silently skews.
  test("n_tot invariant: sum of row-0 sketch counters == count(keys)") {
    val keys = Tables.lineitem(spark, sf0001).select(col("l_partkey").as("k"))
    // row 0 of the CM grid, same constants as HeavyHitters (P, W, RowA(0),
    // RowB(0)) — duplicated here on purpose so a constant drift fails too
    val row0 = keys
      .select((pmod(pmod(col("k"), lit(1000003L)) * 2654435761L + 7L,
        lit(1000000007L)) % 4096).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("counter"))
    assert(row0.agg(sum(col("counter"))).head.getLong(0) == keys.count())
  }

  // r18: below the gate n_tot is count(keys), above it Σ row-0 counters
  // off the pinned sketch — force the gate open and assert the two
  // derivations produce the identical result frame.
  test("gate-open and gate-closed query forms agree row-for-row") {
    val closed = rows
    spark.conf.set("spark.graft.share.minBytes", "0")
    try {
      val open = HeavyHitters.queries("heavy_hitters")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3)))
      assert(open.toSeq == closed.toSeq)
    } finally spark.conf.unset("spark.graft.share.minBytes")
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
