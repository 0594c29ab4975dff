package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
