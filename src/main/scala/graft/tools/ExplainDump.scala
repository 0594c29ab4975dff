package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named SparkEntry
  * queries (PLANS.md source material).
  *
  * {{{
  * sbt "runMain graft.tools.ExplainDump /root/testdata/sf0.01 knn_lsh dedup_embcos"
  * }}}
  *
  * Uses the same session shape as Bench/Verify so the audited plans are
  * the plans those mains actually run (AQE on, 32 shuffle partitions,
  * 4 MB file splits).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <sfDir> <query> [query ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"\n===== $name =====")
      df.explain("formatted")
      // materialize THIS plan (count() would plan a different query) so
      // AQE finalizes, then show the adaptive final plan too
      df.collect()
      println(s"----- $name (executed, AQE-final) -----")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
