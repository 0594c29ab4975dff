package graft.emf

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class SalesRow(cust: String, prod: String, month: Int, state: String, quant: Int)

class EmfStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Set("cust", "prod", "month", "state", "quant")

  private val rows = Seq(
    SalesRow("c1", "p1", 1, "NY", 10), SalesRow("c1", "p1", 2, "CT", 4),
    SalesRow("c1", "p2", 2, "NY", 6), SalesRow("c2", "p1", 1, "NY", 8),
    SalesRow("c2", "p2", 3, "NJ", 2), SalesRow("c1", "p1", 3, "NY", 20))

  private val simpleQ = EmfParser.parseOne(
    """cust,avg_quant_NY,sum_quant_CT
      |2
      |cust
      |avg_quant_NY,sum_quant_CT
      |{MF.cust.avg_quant_NY}[=]{cust}:{state}[=]{NY},{MF.cust.sum_quant_CT}[=]{cust}:{state}[=]{CT}""".stripMargin, cols)

  test("streaming SIMPLE EMF equals batch planner result, updated incrementally") {
    val stream = MemoryStream[SalesRow](spark)
    val q = EmfStreaming.plan(simpleQ, stream.toDF())
      .writeStream.format("memory").queryName("emf_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(rows.take(3))
      q.processAllAvailable()
      val mid = spark.table("emf_stream").collect()
      assert(mid.length == 1) // only c1 so far
      stream.addData(rows.drop(3))
      q.processAllAvailable()
      val fin = spark.table("emf_stream").orderBy("cust").collect().toSeq
      val batch = EmfPlanner.plan(simpleQ, rows.toDF())
        .orderBy("cust").collect().toSeq
      assert(fin == batch)
    } finally q.stop()
  }

  test("streaming EMF applies HAVING over the evolving MF structure") {
    val q = EmfParser.parseOne(
      """cust,avg_quant_NY,sum_quant_CT
        |2
        |cust
        |avg_quant_NY,sum_quant_CT
        |{MF.cust.avg_quant_NY}[=]{cust}:{state}[=]{NY},{MF.cust.sum_quant_CT}[=]{cust}:{state}[=]{CT}
        |{MF.avg_quant_NY,>,7}""".stripMargin, cols)
    val stream = MemoryStream[SalesRow](spark)
    val sq = EmfStreaming.plan(q, stream.toDF())
      .writeStream.format("memory").queryName("emf_having")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(rows)
      sq.processAllAvailable()
      val custs = spark.table("emf_having").collect().map(_.getString(0)).toSet
      // c1 NY avg = (10+6+20)/3 = 12 > 7 ✓; c2 NY avg = 8 > 7 ✓
      assert(custs == Set("c1", "c2"))
      // push c2's NY average below the HAVING threshold incrementally
      stream.addData(SalesRow("c2", "p9", 4, "NY", 0), SalesRow("c2", "p9", 5, "NY", 1))
      sq.processAllAvailable()
      val custs2 = spark.table("emf_having").collect().map(_.getString(0)).toSet
      assert(custs2 == Set("c1")) // c2 avg now (8+0+1)/3 = 3 ≤ 7
    } finally sq.stop()
  }

  test("dependent query rejected by incremental path, works via microBatch") {
    val emfQ = EmfParser.parseOne(
      """prod,avg_quant_1,count_quant_2
        |2
        |prod
        |avg_quant_1,count_quant_2
        |{MF.prod.avg_quant_1}[=]{prod},{MF.prod.count_quant_2}[=]{prod}:{MF.avg_quant_1.count_quant_2}[>]{quant}""".stripMargin, cols)
    val stream = MemoryStream[SalesRow](spark)
    val e = intercept[IllegalArgumentException](
      EmfStreaming.plan(emfQ, stream.toDF()))
    assert(e.getMessage.contains("SIMPLE"))

    var last: Seq[org.apache.spark.sql.Row] = Nil
    val q = EmfStreaming.microBatch(emfQ, stream.toDF()) { (df, _) =>
      val out = df.orderBy("prod").collect().toSeq
      if (out.nonEmpty) last = out
    }.outputMode(OutputMode.Append).start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    val batch = EmfPlanner.plan(emfQ, rows.toDF()).orderBy("prod").collect().toSeq
    assert(last == batch)
  }
}
