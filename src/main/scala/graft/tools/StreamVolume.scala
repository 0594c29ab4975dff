package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.emf.{EmfPlanner, EmfStreaming, GoldenQueries}

/** Volume rehearsal for the incremental streaming EMF planners: drives
  * the REAL sf-dir sales_view row stream (not a micro fixture) through
  * planWindowed / planDependent / planChained in micro-batches,
  * asserts the final snapshot equals the batch planner on the same
  * rows, and reports throughput plus the state-store footprint the
  * domain-bound guards promise stays bounded (state rows ≤ groups ×
  * value-domain, independent of stream length — the claim this run
  * certifies on real volume). Usage:
  *   runMain graft.tools.StreamVolume <sfDir> [nChunks]
  */
object StreamVolume {
  final case class SaleRow(cust: String, prod: String, day: Int,
      month: Int, year: Int, state: String, quant: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nChunks = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fed via toLocalIterator, NOT a whole-corpus collect: the sf10
    // rehearsal streams 60M sales rows; only one micro-batch chunk is
    // ever resident on the driver
    val view = graft.Tables.salesView(spark, sfDir).as[SaleRow]
    val nRows = view.count()
    val chunkSize = math.max(1L, (nRows + nChunks - 1) / nChunks).toInt
    println(s"[streamvol] $nRows sales rows, " +
      s"$nChunks micro-batches of ~$chunkSize")

    // q4 minus its equality pin: the KEYLESS global complement ("each
    // cust vs every OTHER cust"), measured through BOTH lowerings —
    // the constant-state-key form (planCrossGroup, E = ∅) and the
    // cluster-scale sharded form (per-anti partials + render-side
    // all-but-self; its state is ONE row per cust, so stateRows here
    // reads as the anti-domain size, not groups × domain)
    val keylessQ = graft.emf.EmfParser.parseOne(
      """cust,avg_quant_oth,min_quant_oth
        |2
        |cust
        |avg_quant_oth,min_quant_oth
        |{MF.cust.avg_quant_oth}[!=]{cust},{MF.cust.min_quant_oth}[!=]{cust}""".stripMargin,
      graft.Tables.salesView(spark, sfDir).schema.fieldNames.toSet)

    val defaultSnap: (DataFrame, graft.emf.EmfQuery) => DataFrame =
      EmfStreaming.snapshot
    val allCases = Seq[(String, graft.emf.EmfQuery,
        (graft.emf.EmfQuery, DataFrame) => DataFrame,
        (DataFrame, graft.emf.EmfQuery) => DataFrame)](
      ("q3_windowed", GoldenQueries.parsed(2), EmfStreaming.planWindowed,
        defaultSnap),
      // q4: cross-group complement membership (!= cust), incremental via
      // the per-prod total ⊖ own subtraction state
      ("q4_crossgroup", GoldenQueries.parsed(3), EmfStreaming.planCrossGroup,
        defaultSnap),
      ("q4k_keyless", keylessQ, EmfStreaming.planCrossGroup, defaultSnap),
      ("q4k_sharded", keylessQ, EmfStreaming.planCrossGroupShardedKeyless,
        EmfStreaming.snapshotShardedKeyless),
      ("q6_dependent", GoldenQueries.parsed(5), EmfStreaming.planDependent,
        defaultSnap),
      ("q8_chained", GoldenQueries.parsed(7), EmfStreaming.planChained,
        defaultSnap))
    // args(2+): case names to run, in order, repeats allowed — lets a
    // profiling run isolate per-case cost from the JVM/codegen/state-
    // store warmup the FIRST streaming query in the process pays
    val cases =
      if (args.length > 2)
        args.drop(2).toSeq.map(n => allCases.find(_._1 == n).getOrElse(
          sys.error(s"unknown case $n; have ${allCases.map(_._1)}")))
      else allCases

    // unmeasured warmup: the FIRST streaming query in a JVM pays
    // whole-stage codegen, state-store provider init, and stream-exec
    // setup — r15's "q3_windowed 4× slower" read was exactly this
    // artifact landing on whichever case ran first (re-ordered runs put
    // q3_windowed FASTER than q8_chained, as the per-row work predicts)
    locally {
      val (_, q, planFn, _) = allCases.head
      val warm = MemoryStream[SaleRow](spark)
      val wq = planFn(q, warm.toDF())
        .writeStream.format("memory").queryName("sv_warmup")
        .outputMode(OutputMode.Update).start()
      try {
        view.limit(1000).collect().grouped(500).foreach { c =>
          warm.addData(c.toSeq); wq.processAllAvailable()
        }
      } finally wq.stop()
    }

    var runIdx = 0
    for ((name, q, planFn, snapFn) <- cases) {
      runIdx += 1
      val stream = MemoryStream[SaleRow](spark)
      // runIdx suffix: repeated cases (profiling) get fresh sink tables
      val sink = s"sv_${name}_$runIdx"
      val sq = planFn(q, stream.toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update).start()
      val t0 = System.nanoTime()
      try {
        import scala.jdk.CollectionConverters._
        view.toLocalIterator().asScala.grouped(chunkSize).foreach { chunk =>
          stream.addData(chunk)
          sq.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val prog = sq.lastProgress
        val stateRows = prog.stateOperators.map(_.numRowsTotal).sum
        val stateBytes = prog.stateOperators.map(_.memoryUsedBytes).sum
        // Update-mode memory sink accumulates every emitted version of
        // a group; snapshot() keeps the latest per key
        val snapDf = snapFn(spark.table(sink), q)
        val snapCols = snapDf.columns
        val snap = snapDf
          .orderBy(snapCols.map(org.apache.spark.sql.functions.col): _*)
          .collect().toSeq
        val batch0 = EmfPlanner.plan(q, view.toDF())
        val batch = batch0
          .select(snapCols.map(org.apache.spark.sql.functions.col): _*)
          .orderBy(snapCols.map(org.apache.spark.sql.functions.col): _*)
          .collect().toSeq
        val eq = snap == batch
        println(f"[streamvol] $name%-14s rows=$nRows%d " +
          f"wall=$secs%.1fs thru=${nRows / secs}%.0f rows/s " +
          f"stateRows=$stateRows%d stateMB=${stateBytes / 1048576.0}%.1f " +
          f"outGroups=${snap.length}%d snapshot==batch: $eq%s")
        require(eq, s"$name: streaming snapshot diverged from batch planner " +
          s"(${snap.length} vs ${batch.length} rows)")
      } finally sq.stop()
    }
    spark.stop()
  }
}
