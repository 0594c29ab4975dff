package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf0001 = "/root/testdata/sf0.001"
  // for specs whose fixture needs density sf0.001 can't provide (e.g.
  // support thresholds that nothing reaches at ~6k rows)
  def sf001 = "/root/testdata/sf0.01"

  /** Logical Window nodes with an EMPTY partition spec — each one is a
    * single-task global sort of its input at execution time. Used by
    * per-operator assertions (tokenize_ids) and the repo-wide
    * whitelist sweep (GlobalWindowSpec). */
  def unpartitionedWindows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty =>
        w.windowExpressions.map(_.sql).mkString(", ")
    }
}
