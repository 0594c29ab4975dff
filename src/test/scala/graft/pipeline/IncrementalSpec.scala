package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def cents =
    (col("value").cast("decimal(18,2)") * 100).cast("long")

  private def ev = Tables.events(spark, sf0001)
    .select(col("event_type"), cents.as("c"))

  private val keys = Seq("event_type")

  private def full = Incremental.partials(ev, keys, col("c"))
    .orderBy(col("event_type")).collect().toSeq

  test("merge of base + delta partials equals the full recompute at ANY split") {
    // three cutoffs — early, middle, past-the-end (empty delta)
    for (cut <- Seq("2024-01-03", "2024-01-15", "2025-01-01")) {
      val c = lit(cut).cast("timestamp")
      val base = Incremental.partials(
        Tables.events(spark, sf0001).filter(col("ts") < c)
          .select(col("event_type"), cents.as("c")), keys, col("c"))
      val delta = Incremental.partials(
        Tables.events(spark, sf0001).filter(col("ts") >= c)
          .select(col("event_type"), cents.as("c")), keys, col("c"))
      val merged = Incremental.merge(keys, base, delta)
        .orderBy(col("event_type")).collect().toSeq
      assert(merged == full, s"split at $cut diverges from recompute")
    }
  }

  test("merge is associative: many shards in any order fold to the same view") {
    val shards = (0 until 4).map(i =>
      Incremental.partials(ev.filter(pmod(col("c"), lit(4)) === i),
        keys, col("c")))
    val ltr = Incremental.merge(keys, shards: _*)
      .orderBy(col("event_type")).collect().toSeq
    val nested = Incremental.merge(keys,
      Incremental.merge(keys, shards(2), shards(0)),
      Incremental.merge(keys, shards(3), shards(1)))
      .orderBy(col("event_type")).collect().toSeq
    assert(ltr == full && nested == full)
  }

  test("finalized view derives avg from partials, truncating like the oracle") {
    val rows = Incremental.queries("mv_refresh")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(2) / r.getLong(1),
        s"avg_cents mismatch for ${r.getString(0)}")
      assert(r.getLong(3) <= r.getLong(5) && r.getLong(5) <= r.getLong(4),
        "avg outside [min, max]")
    }
  }
}
