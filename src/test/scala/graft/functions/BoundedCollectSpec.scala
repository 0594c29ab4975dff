package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def asPairs(r: Row): Seq[(Long, String)] =
    r.getSeq[Row](1).map(x => (x.getLong(0), x.getString(1)))

  test("firstN equals slice(sort_array(collect_list)) on random groups") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong,
        rnd.alphanumeric.take(rnd.nextInt(8)).mkString)
    }
    // 8 partitions so partial buffers MERGE (the heap-merge path runs)
    val df = spark.createDataFrame(rows).toDF("g", "id", "s")
      .repartition(8)
    for (cap <- Seq(1, 3, 16, 5000)) {
      val got = df.groupBy($"g")
        .agg(BoundedCollect.firstN($"id", $"s", cap).as("ms"))
        .collect().map(r => r.getLong(0) -> asPairs(r)).toMap
      val want = df.groupBy($"g")
        .agg(slice(sort_array(collect_list(struct($"id", $"s"))),
          1, cap).as("ms"))
        .collect().map(r => r.getLong(0) -> asPairs(r)).toMap
      assert(got == want, s"cap=$cap")
    }
  }

  test("duplicate (id, s) entries survive as a bag; nulls are skipped") {
    val df = Seq(
      (1L, Some("a")), (1L, Some("a")), (2L, Some("b")), (3L, None)
    ).toDF("id", "s")
    val got = df.agg(lit(0L), BoundedCollect.firstN($"id", $"s", 10))
      .collect().map(asPairs).head
    assert(got == Seq((1L, "a"), (1L, "a"), (2L, "b")))
  }

  test("buffer stays O(cap): a million-row group aggregates under a tiny heap") {
    // the point of the aggregate — a collect_list here would buffer 1M
    // entries in ONE ObjectHashAggregate buffer; firstN keeps 4
    val got = spark.range(1000000).select(
        lit(1L).as("g"), (lit(999999L) - $"id").as("id"),
        concat(lit("w"), $"id".cast("string")).as("s"))
      .groupBy($"g")
      .agg(BoundedCollect.firstN($"id", $"s", 4).as("ms"))
      .collect().map(asPairs).head
    assert(got == Seq((0L, "w999999"), (1L, "w999998"),
      (2L, "w999997"), (3L, "w999996")))
  }
}
