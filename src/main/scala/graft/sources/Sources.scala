package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink breadth beyond parquet (SURVEY.md §2.2 "Scans/sources" /
  * "Sinks"). The reference reads one table over JDBC with no pushdown
  * (`select * from sales`, reference `src/QueryProcessor1.java:79`); here
  * every format goes through Spark's DataSource V2 with pushdown/pruning
  * where the format supports it (parquet/orc) and schema-on-read
  * elsewhere. JDBC is exercised against embedded Derby (SourcesSpec
  * round-trips a table and asserts predicate pushdown reaches the
  * database); at scale one adds `partitionColumn`/`numPartitions` to
  * parallelize the read — the API accepts the same Properties.
  */
object Sources {
  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def readCsv(s: SparkSession, path: String, header: Boolean = true): DataFrame =
    s.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.json(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Line-oriented text source (one `value` column) — the raw-crawl
    * ingest shape before any schema exists. */
  def readText(s: SparkSession, path: String): DataFrame =
    s.read.text(path)

  def readJdbc(s: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    s.read.jdbc(url, table, props)

  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  /** Partitioned sink — the layout that makes downstream partition
    * pruning work at 100 TB (one directory per partition value). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
}
