package graft

import org.apache.spark.sql.SparkSession
import graft.emf.{EmfParser, EmfPlanner}

/** CLI: run MF/EMF spec queries against the testdata `sales_view`.
  *
  * The Spark-native equivalent of the reference's
  * `AdhocQueryProcessor.main` + generated `QueryProcessorN.main`
  * (reference `src/AdhocQueryProcessor.java:688-693`), minus the Swing
  * file chooser and the compile-the-generated-Java step: parse → plan →
  * execute happen in one process on Catalyst plans.
  *
  * Usage: EmfRun <specFile> [sfDir] [--explain] [--fact <parquetPath>]
  * With `--fact`, queries run over an arbitrary parquet table instead of
  * the derived `sales_view` — the engine is schema-agnostic; column
  * names in the spec are validated against the fact schema.
  */
object EmfRun {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EmfRun <specFile> [sfDir] [--explain] [--fact <path>]")
    val specFile = args(0)
    val factPath = args.sliding(2).collectFirst {
      case Array("--fact", p) => p
    }
    val sfDir = args.drop(1).filter(!_.startsWith("--"))
      .filterNot(factPath.contains).headOption
      .getOrElse("/root/testdata/sf0.001")
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-emf")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(specFile)), "UTF-8")
    val fact = factPath match {
      case Some(p) => spark.read.parquet(p)
      case None    => Tables.salesView(spark, sfDir)
    }
    // two frontends, one AST: the reference's positional format, or the
    // papers' `GROUP BY …; … SUCH THAT …` SQL (auto-detected)
    val queries =
      if (graft.emf.MfSqlParser.looksLikeSql(text))
        graft.emf.MfSqlParser.parseAll(text, fact.columns.toSet)
      else EmfParser.parseAll(text, fact.columns.toSet)
    queries.zipWithIndex.foreach { case (q, i) =>
      println(s"=== query ${i + 1}: select ${q.select.mkString(",")}")
      val df = EmfPlanner.plan(q, fact)
      if (explain) df.explain("formatted")
      df.persist()
      try {
        df.show(20, truncate = false)
        println(s"Total Records: ${df.count()}") // served from the cache
      } finally df.unpersist()
    }
    spark.stop()
  }
}
