package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Co-occurrence pair mining (frequent itemset pairs / "market
  * basket") — the recommender-and-curation primitive that turns a
  * transaction log into an item-affinity table.
  *
  * The quadratic danger is the per-basket pair fanout: an uncapped
  * basket of B items emits B(B−1)/2 pairs, and real logs have
  * pathological baskets (crawlers, bulk orders) that turn one key into
  * a straggler task. The standard mitigation — used by production
  * covisitation engines — is a deterministic PER-BASKET CONTRIBUTION
  * CAP: only each basket's first `MaxBasket` items (by item id — stable
  * under any partitioning) generate pairs, bounding every basket's
  * fanout at MaxBasket(MaxBasket−1)/2 while leaving small-basket
  * statistics untouched. The cap is applied BEFORE the items are
  * collected (a windowed rank-filter, orderkey-keyed), so no task ever
  * materializes an uncapped basket; it is mirrored exactly in the
  * oracle, so the capped semantics — not an approximation of the
  * uncapped ones — is what's verified.
  *
  * Plan shape: distinct (basket, item) → rank-cap window → per-basket
  * collect of ≤ MaxBasket sorted items → pairs generated IN-ROW
  * (shifted-slice transform, the `skipgram_pairs` trick — no self-join
  * shuffle) → ONE pair-keyed count aggregation with map-side combine.
  * The pair-count shuffle carries at most min(Σ fanouts, |items|²)
  * rows, keys are uniform 16-byte (a, b) pairs, and the support
  * threshold prunes the long tail at the aggregate, never the scan.
  */
object Mining {

  private val MaxBasket = 8
  private val MinSupport = 2

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Parts co-ordered in the same order, support ≥ 2 — the affinity
    // table a "frequently bought together" model trains on.
    "basket_pairs" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val rn = row_number().over(
        Window.partitionBy(col("l_orderkey")).orderBy(col("l_partkey")))
      val baskets = items
        .withColumn("rn", rn).filter(col("rn") <= MaxBasket)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_partkey"))).as("parts"))
      baskets
        .select(explode(expr(
          """flatten(transform(parts, (x, i) ->
            |  transform(slice(parts, i + 2, size(parts)),
            |    y -> named_struct('a', x, 'b', y))))""".stripMargin))
          .as("pr"))
        .groupBy(col("pr.a").as("part_a"), col("pr.b").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= MinSupport)
        .orderBy(col("part_a"), col("part_b"))
    }),
  )

  def oracle: Map[String, String] = Map(
    // identical cap (first 8 distinct parts by id), identical support
    "basket_pairs" ->
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |capped AS (
        |  SELECT l_orderkey, l_partkey FROM (
        |    SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_partkey) AS rn FROM it)
        |  WHERE rn <= 8)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |  CAST(count(1) AS BIGINT) AS n_orders
        |FROM capped a JOIN capped b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(1) >= 2
        |ORDER BY part_a, part_b""".stripMargin,
  )
}
