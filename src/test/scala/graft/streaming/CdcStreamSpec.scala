package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import CdcStream.Change

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val b1 = Seq(
    Change(1L, 1L, "u", 100L), Change(2L, 1L, "u", 50L),
    Change(1L, 2L, "u", 120L), Change(3L, 1L, "u", 80L))
  private val b2 = Seq(
    Change(2L, 2L, "d", 0L),   // delete doc 2
    Change(1L, 3L, "u", 130L), // third version of doc 1
    Change(3L, 0L, "u", 999L), // STALE (ver 0 < 1): must be dropped
    Change(4L, 1L, "u", 10L))  // new doc

  test("streaming CDC apply equals the batch argmax merge across batches") {
    val stream = MemoryStream[Change](spark)
    val q = CdcStream(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("cdc_img")
      .outputMode(OutputMode.Update).start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val snap = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("doc_id")).orderBy(col("ver").desc)
      spark.table("cdc_img").withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .orderBy("doc_id").collect().toSeq
    }
    val batch = CdcStream.batchMerge((b1 ++ b2).toDF())
      .orderBy("doc_id").collect().toSeq
    assert(snap == batch)
    // the stale ver-0 update for doc 3 must not have clobbered ver 1
    val d3 = snap.find(_.getLong(0) == 3L).get
    assert(d3.getLong(1) == 1L && d3.getLong(3) == 80L)
    // the delete tombstone survives
    val d2 = snap.find(_.getLong(0) == 2L).get
    assert(d2.getBoolean(2) && d2.getLong(3) == -1L)
    // census over all emissions
    val c = CdcStream.census(spark.table("cdc_img")).collect().head
    assert((c.getLong(0), c.getLong(1), c.getLong(2)) == (3L, 1L, 220L))
  }
}
