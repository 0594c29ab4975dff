package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed point-in-interval range join — the second custom-operator
  * shape the reference family lacks (alongside [[AsOfJoin]]).
  *
  * A θ-only interval predicate (`start <= pt AND pt < start + w`) gives
  * Spark no equi-key, so the built-in plan is a broadcast nested loop —
  * O(|points|·|intervals|) comparisons, a non-starter at 100 TB. The
  * standard fix is time quantization: buckets of exactly the interval
  * width `w`, each interval replicated to the ≤2 buckets it can overlap,
  * points assigned to their single bucket, then an ordinary shuffled
  * hash join on the bucket key with the exact predicate as residual.
  * Cost drops to O(pairs-in-same-bucket) ≈ O(true matches × small
  * constant); the shuffle keys on time buckets, which distribute
  * uniformly for event-like data. (Each true pair is produced exactly
  * once — a point has ONE bucket — so no post-join dedup is needed.)
  */
object RangeJoin {

  /** Inner point-in-interval join: rows of `points` whose `ptCol` falls
    * in [startCol, startCol + widthDays). Bucket width = interval width,
    * so an interval covers at most 2 buckets. */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, widthDays: Int): DataFrame = {
    require(widthDays > 0, "interval width must be positive")
    Seq("__bucket", "__b0").foreach { n =>
      require(!points.columns.contains(n) && !intervals.columns.contains(n),
        s"pointInInterval reserves column name $n")
    }
    // the bucket join would emit ambiguous duplicate columns for any name
    // present on both sides — require disjoint schemas (alias one side)
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty,
      s"pointInInterval: column name collision ${overlap.mkString(", ")} " +
        "between points and intervals — rename/alias one side first")
    val epoch = lit("1970-01-01").cast("date")
    def bucketOf(c: Column): Column =
      floor(datediff(c.cast("date"), epoch) / widthDays)
    val p = points.withColumn("__bucket", bucketOf(col(ptCol)))
    val i = intervals
      .withColumn("__b0", bucketOf(col(startCol)))
      .withColumn("__bucket",
        explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    p.join(i, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) &&
        col(ptCol) < col(startCol) + expr(s"INTERVAL $widthDays DAYS"))
      .drop("__bucket")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Demand-surge probe: per order, how many HIGH-QUANTITY lineitems
    // (any order's) shipped within 7 days after the order was placed.
    // Pure interval predicate — no equi-key anywhere — yet the plan is
    // a bucketed hash join, not a nested loop.
    "range_join" -> ((s, d) => {
      val pts = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 49)
        .select(col("l_shipdate"))
      val ivs = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      val matches = pointInInterval(pts, "l_shipdate", ivs, "o_orderdate", 7)
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_shipped"))
      ivs.select(col("o_orderkey"))
        .join(matches, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
        .orderBy(col("o_orderkey"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "range_join" ->
      """SELECT o.o_orderkey,
        |  CAST(count(l.l_shipdate) AS BIGINT) AS n_shipped
        |FROM orders o LEFT JOIN lineitem l
        |  ON l.l_quantity > 49
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
