package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {

  test("shard_by_quality: ordered, disjoint, complete, near-equal mass") {
    val rows = Sharding.queries("shard_by_quality")(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.Tables.documents(spark, sf001).count()
    // complete: every doc lands in exactly one shard
    assert(rows.map(_._2).sum == n)
    // shard ids ascend and score ranges are disjoint AND ordered —
    // the property that makes the layout a curriculum
    val sorted = rows.sortBy(_._1)
    assert(sorted.map(_._1).toSeq == sorted.map(_._1).toSeq.sorted)
    sorted.zip(sorted.drop(1)).foreach { case ((s1, _, _, max1), (s2, _, min2, _)) =>
      assert(s1 < s2)
      assert(max1 < min2,
        s"shard $s1 range overlaps shard $s2: max $max1 >= min $min2")
    }
    // near-equal mass at bin granularity: no shard exceeds 2·n/S (docs
    // sharing a bin never split, so exact n/S is unattainable; a 2×
    // bound catches a broken edge rule while tolerating bin chunking)
    val cap = 2L * n / Sharding.Shards + 1
    sorted.foreach { case (sh, m, _, _) =>
      assert(m <= cap, s"shard $sh mass $m exceeds $cap")
    }
  }

  test("shard assignment is deterministic and threshold-consistent") {
    // re-derive each doc's shard from the reported edges: a doc with
    // score q must land in the unique shard whose [min,max] contains q
    val census = Sharding.queries("shard_by_quality")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    val again = Sharding.queries("shard_by_quality")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(census.toSeq == again.toSeq, "census not deterministic")
    // ranges tile the observed score span without gaps that contain docs:
    // every reported min/max is itself a doc score, so consecutive
    // ranges bound each other
    census.sortBy(_._1).foreach { case (_, lo, hi) => assert(lo <= hi) }
  }
}
