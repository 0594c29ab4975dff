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

  /** Inner interval-OVERLAP join: pairs (a, b) with
    * `[aStart, aEnd) ∩ [bStart, bEnd) ≠ ∅` (the standard
    * `aStart < bEnd AND bStart < aEnd` predicate). Harder than
    * point-in-interval — BOTH sides are ranges, so both sides replicate:
    * each interval is exploded to every `bucketDays`-wide bucket it
    * touches (`sequence(bucket(start), bucket(end − 1 day))`), the join
    * runs on the bucket key, and the exact predicate filters residually.
    * A pair can then share MANY buckets; it is kept only in the FIRST
    * bucket both intervals occupy — `bucket = greatest(bucket(aStart),
    * bucket(bStart))` — so every true pair surfaces exactly once with no
    * post-join distinct (the bucket ranges are contiguous, hence their
    * intersection's first element is the max of the two range starts).
    * Replication factor = length/bucketDays + 1 per row: pick
    * `bucketDays` near the typical interval length for ≤2 replicas. The
    * shuffle keys on time buckets (uniform for event-like data), and the
    * per-bucket candidate set is only what genuinely co-occurs in that
    * window — never a nested loop over the corpus.
    *
    * Degenerate intervals (`end <= start`, i.e. empty under the
    * half-open convention) are EXCLUDED up front: an empty interval
    * intersects nothing, so it can contribute no pair — and without the
    * filter `sequence(b0, b1)` with `b1 < b0` would silently emit a
    * DESCENDING bucket list, replicating the row into buckets the
    * interval never occupies, while the residual `aStart < bEnd AND
    * bStart < aEnd` would admit an empty `[d, d)` against any interval
    * strictly containing `d` — both contradicting the documented
    * intersection-non-empty semantics. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String, bucketDays: Int): DataFrame = {
    require(bucketDays > 0, "bucket width must be positive")
    Seq("__bucket", "__b0", "__b1").foreach { n =>
      require(!a.columns.contains(n) && !b.columns.contains(n),
        s"intervalOverlap reserves column name $n")
    }
    val overlap = a.columns.toSet intersect b.columns.toSet
    require(overlap.isEmpty,
      s"intervalOverlap: column name collision ${overlap.mkString(", ")} " +
        "between sides — rename/alias one side first")
    val epoch = lit("1970-01-01").cast("date")
    def bucketOf(c: Column): Column =
      floor(datediff(c.cast("date"), epoch) / bucketDays)
    def replicate(df: DataFrame, s: String, e: String): DataFrame = df
      // drop empty intervals (see scaladoc): keeps sequence() ascending
      // and the residual predicate honest
      .filter(col(e).cast("date") > col(s).cast("date"))
      .withColumn("__b0", bucketOf(col(s)))
      // [s, e): the last occupied bucket holds e − 1 day
      .withColumn("__b1", bucketOf(date_sub(col(e).cast("date"), 1)))
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b1")
    val ra = replicate(a, aStart, aEnd).withColumnRenamed("__b0", "__ba")
    val rb = replicate(b, bStart, bEnd).withColumnRenamed("__b0", "__bb")
    ra.join(rb, Seq("__bucket"))
      .filter(col("__bucket") === greatest(col("__ba"), col("__bb")))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .drop("__bucket", "__ba", "__bb")
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

    // Fulfillment-window contention: for each top-3%-value order, how
    // many OTHER top-value orders' 7-day fulfillment windows overlap its
    // own. Interval × interval, no equi-key — the bucketed overlap join
    // keeps it hash-shaped (bucket width = interval width ⇒ exactly 2
    // replicas per row).
    "interval_join" -> ((s, d) => {
      def side(p: String) = Tables.orders(s, d)
        .filter(col("o_totalprice") > 480000)
        .select(col("o_orderkey").as(s"${p}_key"),
          col("o_orderdate").cast("date").as(s"${p}_start"),
          date_add(col("o_orderdate").cast("date"), 7).as(s"${p}_end"))
      val pairs = intervalOverlap(side("a"), "a_start", "a_end",
          side("b"), "b_start", "b_end", 7)
        .filter(col("a_key") =!= col("b_key"))
        .groupBy(col("a_key")).agg(count(lit(1)).as("n_overlap"))
      side("a").select(col("a_key").as("o_orderkey"))
        .join(pairs.withColumnRenamed("a_key", "o_orderkey"),
          Seq("o_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
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
    // the plain θ self-join the bucketed plan must reproduce exactly
    "interval_join" ->
      """WITH hv AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
        |         CAST(o_orderdate AS DATE) + 7 AS e
        |  FROM orders WHERE o_totalprice > 480000)
        |SELECT a.o_orderkey,
        |  CAST(count(b.o_orderkey) AS BIGINT) AS n_overlap
        |FROM hv a LEFT JOIN hv b
        |  ON b.o_orderkey != a.o_orderkey
        | AND a.s < b.e AND b.s < a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
