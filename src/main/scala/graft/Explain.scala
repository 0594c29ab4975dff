package graft

import org.apache.spark.sql.SparkSession

/** CLI: print the formatted physical plan of any SparkEntry query —
  * `runMain graft.Explain q1_pricing emf_q6 [sfDir]`. Used to audit that
  * plans have the shape the scale design claims: filters pushed to the
  * parquet scan, dimension joins broadcast, whole-stage codegen spans
  * covering the hot path, no unexpected shuffles.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (names, dirs) = args.partition(!_.startsWith("/"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    targets.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
