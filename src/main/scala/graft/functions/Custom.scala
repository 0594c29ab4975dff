package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Custom-function surface (SURVEY.md §2.2 "UDF/UDAF/UDTF" + §7.4):
  * a typed [[Aggregator]] UDAF, a scalar UDF, and (in
  * [[graft.functions.HammingDistance]]) a native Catalyst Expression with
  * codegen. The reference hard-codes its five aggregates in generated Java
  * (`src/QueryProcessor1.java:99-110`); here user aggregates plug into
  * Spark's partial/final merge machinery and distribute for free.
  */
object Custom {

  /** Second-largest DISTINCT value — an aggregate Spark lacks natively.
    * Buffer carries (max, secondMax); merges associatively, so map-side
    * partial aggregation works at any parallelism. */
  object SecondMax extends Aggregator[Double, (Option[Double], Option[Double]), Option[Double]] {
    def zero: (Option[Double], Option[Double]) = (None, None)
    def reduce(b: (Option[Double], Option[Double]), x: Double): (Option[Double], Option[Double]) =
      merge(b, (Some(x), None))
    def merge(a: (Option[Double], Option[Double]), b: (Option[Double], Option[Double])): (Option[Double], Option[Double]) = {
      // branchy two-slot insert (no per-row Seq allocation/sort): slot in
      // each of b's candidates, skipping duplicates (DISTINCT semantics)
      var m1 = a._1
      var m2 = a._2
      def add(xo: Option[Double]): Unit = xo.foreach { x =>
        if (!m1.contains(x) && !m2.contains(x)) {
          if (m1.forall(x > _)) { m2 = m1; m1 = Some(x) }
          else if (m2.forall(x > _)) m2 = Some(x)
        }
      }
      add(b._1); add(b._2)
      (m1, m2)
    }
    def finish(b: (Option[Double], Option[Double])): Option[Double] = b._2
    def bufferEncoder: Encoder[(Option[Double], Option[Double])] =
      Encoders.product[(Option[Double], Option[Double])]
    def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
  }

  /** Scalar UDF demo: vowel count. (UDFs are opaque to codegen — fine for
    * glue, never for hot paths; the oracle-checked query proves parity.)
    * NULL-in → NULL-out (Option) and Locale.ROOT lowering, matching SQL
    * semantics regardless of JVM default locale. */
  val vowelCount = udf((s: String) =>
    Option(s).map(_.toLowerCase(java.util.Locale.ROOT).count("aeiou".contains(_))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // UDAF through the full distributed agg pipeline.
    "udaf_second_max" -> ((s, d) => {
      val secondMax = udaf(SecondMax)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(secondMax(col("l_quantity")).as("second_max_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "udf_vowels" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"), vowelCount(col("c_name")).as("n_vowels"))
        .orderBy(col("c_custkey"))
    }),

    // DeclarativeAggregate (expression-based, codegen'd): compound tax
    // factor per order — product() which Spark lacks, DuckDB has.
    "udaf_product" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(round(ProductAgg.product_agg(col("l_tax") + 1), 6).as("tax_factor"),
          count(lit(1)).as("n_items"))
        .orderBy(col("l_orderkey"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "udaf_second_max" ->
      """WITH m AS (SELECT l_returnflag, max(l_quantity) AS mx
        |           FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  max(l_quantity) FILTER (WHERE l_quantity < m.mx) AS second_max_qty,
        |  max(l_quantity) AS max_qty
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "udf_vowels" ->
      """SELECT c_custkey,
        | CAST(len(regexp_extract_all(lower(c_name), '[aeiou]')) AS INT) AS n_vowels
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "udaf_product" ->
      """SELECT l_orderkey,
        | round(product(l_tax + 1), 6) AS tax_factor,
        | count(1) AS n_items
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
  )
}
