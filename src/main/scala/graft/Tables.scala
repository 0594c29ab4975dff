package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md). One parquet file per table under `\$dir`.
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; at cluster scale the same paths would point at
  * partitioned directories and nothing here changes.
  */
object Tables {
  /** Loads a table and normalizes timestamp columns to session-TZ
    * `TimestampType`. The driver has generated these files both as
    * parquet TIMESTAMP(isAdjustedToUTC=true) (→ Spark `TimestampType`)
    * and, since the round-6 regen, as naive TIMESTAMP(NANOS/MICROS)
    * (→ Spark `TimestampNTZType`); DuckDB reads every variant as the
    * same naive timestamp. Sessions here always run `UTC`, so the
    * NTZ→LTZ cast is numerically a no-op — it only pins ONE external
    * type (`java.sql.Timestamp`) for the whole engine, keeping typed
    * Datasets, MemoryStream encoders, and stream/batch comparisons
    * type-stable no matter which writer produced the files. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast("timestamp")))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively; sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * and we convert here (integer-division truncation to micros — exactly
    * what DuckDB does on read, so the oracle agrees). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer DIV, not `/`: long→double would lose precision >2^53
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw // already a timestamp (future-proofing)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The reference-schema fixture (FIXTURES.md §2): the reference engine's
    * single `sales(cust, prod, day, month, year, state, quant)` table
    * (schema hard-coded at reference `src/AdhocQueryProcessor.java:267-273`),
    * re-derived from the TPC-H-ish star schema.
    *
    * Dimension sides (`customer`, `part`, `nation`) are explicitly
    * broadcast — they are orders of magnitude smaller than `lineitem` at
    * every scale factor, so the only shuffle left is the lineitem⋈orders
    * join (AQE picks broadcast for that too at small SF).
    *
    * NOTE `quant` uses FLOOR before the int cast: Spark's ANSI double→int
    * cast truncates while DuckDB's rounds; FLOOR on both sides makes the
    * oracle agree (data is integer-valued anyway — verified 1..50).
    *
    * `state` is the SUPPLIER's nation (not the customer's): each customer
    * belongs to one nation, so customer-side state would make the corpus
    * queries degenerate (every cross-state aggregate NULL); supplier-side
    * gives each customer purchases across many states, as in the paper's
    * examples.
    */
  def salesView(s: SparkSession, d: String): DataFrame = {
    // Fixture-builder caveat: the dim hints below are fine HERE because
    // this join exists only to synthesize the reference's `sales` table
    // from the TPC-H testdata — at deployment sales is a stored table
    // (the reference reads it directly) and this code never runs at
    // 100 TB. Production queries over SF-scaled dims stay unhinted.
    val l = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    val p = part(s, d)
    val su = supplier(s, d)
    val n = nation(s, d)
    // Every output derives from an inner-join match over non-null
    // testdata columns, so null is impossible — but parquet schemas say
    // nullable, and nullable GROUPING attrs push EmfPlanner onto its
    // null-safe membership joins (an extra exchange per dependent pass,
    // measured 2-3× on the corpus queries). AssertNotNull DECLARES the
    // non-nullability in the schema — restoring the `=`-key fast path —
    // and turns a null (which here could only mean corrupt testdata)
    // into a loud error instead of a silent group.
    def nn(col: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftbridge.CatalystBridge.column(
        org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
          org.apache.spark.sql.graftbridge.CatalystBridge.expression(col)))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .select(
        nn(c("c_name")).as("cust"),
        nn(p("p_brand")).as("prod"),
        nn(dayofmonth(o("o_orderdate"))).as("day"),
        nn(month(o("o_orderdate"))).as("month"),
        nn(year(o("o_orderdate"))).as("year"),
        nn(n("n_name")).as("state"),
        nn(floor(l("l_quantity")).cast("int")).as("quant"))
  }

  /** DuckDB-side equivalent of [[salesView]], for embedding in oracle SQL
    * as a CTE. Must stay semantically identical to the Spark build above. */
  val salesViewSql: String =
    """SELECT c.c_name AS cust, p.p_brand AS prod,
      | EXTRACT(day FROM o.o_orderdate) AS day,
      | EXTRACT(month FROM o.o_orderdate) AS month,
      | EXTRACT(year FROM o.o_orderdate) AS year,
      | n.n_name AS state,
      | CAST(FLOOR(l.l_quantity) AS INT) AS quant
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier su ON l.l_suppkey = su.s_suppkey
      |JOIN nation n ON su.s_nationkey = n.n_nationkey""".stripMargin
}
