package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scale-out utilities: skew mitigation and shuffle elimination — the
  * knobs a 100 TB deployment turns when AQE alone is not enough.
  *
  *  - [[saltedSum]]: two-phase aggregation for hot grouping keys. A key
  *    receiving 1% of 100 TB lands 1 TB on one reducer in a naive
  *    groupBy; pre-aggregating on (key, salt) caps any single reducer at
  *    1/S of the hot key's volume, and the second phase merges S partials
  *    per key. Deterministic salt (hash of stable columns), so the plan
  *    stays reproducible.
  *  - [[saltedJoin]]: skewed sort-merge equi-join — the big side salts
  *    its key, the small-ish side replicates each row S times. (For true
  *    dim tables prefer `broadcast()`, which is skew-immune; AQE's
  *    skew-join split handles moderate cases automatically.)
  *  - [[bucketedTables]]: co-located joins via bucketing — both sides
  *    pre-shuffled into the same bucket layout at write time, so the join
  *    needs NO exchange at read time (asserted in ScaleSpec).
  */
object Scale {

  /** Two-phase (salted) sum: same result as
    * `df.groupBy(keys).agg(sum(valueCol))` for any skew — bit-exact for
    * integral and decimal value columns; for floating-point columns the
    * re-associated addition can differ in the last ulps (as any change of
    * partitioning already does — use decimals where exactness matters). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16, saltSource: Seq[String] = Nil): DataFrame = {
    val src = if (saltSource.nonEmpty) saltSource else df.columns.toSeq
    val salt = pmod(xxhash64(src.map(col): _*), lit(salts)).as("__salt")
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join: `big ⋈ small on key` with the big side's hot keys
    * spread over `salts` reducers. Result equals the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Oracle-checked query surface for the skew paths — the same results
    * as the naive plans, by construction, with reducer load capped. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Extreme-skew aggregation: lineitem has only 3 return flags, so a
    // naive groupBy lands ~1/3 of the fact table on each of 3 reducers
    // at any cluster size. saltedSum pre-aggregates on (flag, salt) —
    // reducer load capped at hot-key/16 — then merges 16 partials.
    // Decimal value column → both phases exact, oracle hash-stable.
    "skew_salted_agg" -> ((s, d) => {
      val df = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("q"))
      saltedSum(df, Seq("l_returnflag"), "q")
        .select(col("l_returnflag"), col("sum_q").cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Skewed join: orders ⋈ a 3-row status dim on o_orderstatus — the
    // classic hot-key shape (every row of the big side hits one of 3
    // keys). The salted join spreads each hot key over 8 reducers by
    // replicating the small side 8×. Same result as the plain join.
    "skew_salted_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dim = o.select(col("o_orderstatus")).distinct()
        .select(col("o_orderstatus"), concat(lit("st_"), col("o_orderstatus")).as("label"))
      saltedJoin(o.select(col("o_orderstatus"), col("o_totalprice")), dim,
          "o_orderstatus")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("label"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "skew_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT o_orderstatus, 'st_' || o_orderstatus AS label
        |  FROM orders)
        |SELECT d.label, count(1) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN dim d ON d.o_orderstatus = o.o_orderstatus
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )

  /** Write both sides bucketed by the join key into the session catalog;
    * returns the re-read tables. Joining them produces a shuffle-free
    * sort-merge join (bucket layout == required distribution). */
  def bucketedTables(s: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int, leftName: String, rightName: String): (DataFrame, DataFrame) = {
    left.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(leftName)
    right.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(rightName)
    (s.table(leftName), s.table(rightName))
  }
}
