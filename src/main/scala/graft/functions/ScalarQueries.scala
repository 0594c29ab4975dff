package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function surface (SURVEY.md §2.2 "Scalar functions"): string,
  * date/time, math, array higher-order, and JSON extraction — all stock
  * `org.apache.spark.sql.functions` (codegen'd, stay inside whole-stage
  * codegen; no UDFs on these paths).
  *
  * Oracle notes: every function used has an exact DuckDB counterpart;
  * transcendental outputs (ln/pow) are rounded to 6 dp because libm
  * implementations may differ in the last ulp. sqrt is IEEE-exact — left
  * unrounded deliberately to prove bit-parity.
  */
object ScalarQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "scalar_string" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        col("p_type").contains("BRASS").cast("int").as("is_brass"))
        .orderBy(col("p_partkey"))
    }),

    "scalar_date" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"))
        .orderBy(col("o_orderkey"))
    }),

    "scalar_math" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("abs_c"),
        // divide by a power of two: IEEE-exact, bit-identical to DuckDB
        // (round(x/100, 2) would hit half-boundary divergence on 2-decimal
        // money values — Spark rounds the decimal repr, DuckDB the double)
        (col("l_extendedprice") / 2).as("half_price"),
        floor(col("l_quantity") / 7.0).as("fl"),
        ceil(col("l_quantity") / 7.0).as("ce"),
        sqrt(col("l_quantity")).as("sq"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(pow(col("l_tax") + 1.0, 2), 6).as("tax_sq"),
        pmod(col("l_orderkey"), lit(7)).as("okmod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Higher-order array functions over tokenized text — stays codegen'd,
    // no UDF, no explode-shuffle.
    "scalar_array" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("words")).as("n_words"),
          element_at(col("words"), 1).as("first_word"),
          array_contains(col("words"), "spark").cast("int").as("has_spark"),
          size(array_distinct(col("words"))).as("n_distinct"),
          // higher-order: total chars via transform + aggregate
          aggregate(transform(col("words"), w => length(w)),
            lit(0), (acc, x) => acc + x).as("total_chars"))
        .orderBy(col("doc_id"))
    }),

    "scalar_json" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"))
        .orderBy(col("event_id"))
    }),

    "scalar_regex" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "([A-Z]+) ([A-Z]+)", 2).as("second_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_count(col("p_name"), lit("[aeiou]")).as("n_vowels"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("masked"))
        .orderBy(col("p_partkey"))
    }),

    "scalar_date_arith" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 2).as("plus_2m"),
        last_day(col("o_orderdate")).as("month_end"),
        date_add(col("o_orderdate"), 45).as("plus_45d"),
        quarter(col("o_orderdate")).as("q"),
        weekofyear(col("o_orderdate")).as("wk"))
        .orderBy(col("o_orderkey"))
    }),

    "scalar_case" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<bldg>")).as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"))
        .orderBy(col("c_custkey"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "scalar_string" ->
      """SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
        | substring(p_name, 1, 5) AS prefix, length(p_name) AS name_len,
        | p_brand || '/' || p_type AS brand_type,
        | replace(p_name, ' ', '_') AS snake,
        | CAST(contains(p_type, 'BRASS') AS INT) AS is_brass
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey,
        | CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        | CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        | CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS abs_c,
        | l_extendedprice / 2 AS half_price,
        | CAST(floor(l_quantity / 7.0) AS BIGINT) AS fl,
        | CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ce,
        | sqrt(l_quantity) AS sq,
        | round(ln(l_extendedprice), 6) AS ln_price,
        | round(pow(l_tax + 1.0, 2), 6) AS tax_sq,
        | l_orderkey % 7 AS okmod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "scalar_array" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        | string_split(text, ' ')[1] AS first_word,
        | CAST(list_contains(string_split(text, ' '), 'spark') AS INT) AS has_spark,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        | CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS INT) AS total_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "scalar_json" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k,
        | CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_type, '([A-Z]+) ([A-Z]+)', 2) AS second_word,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        | CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
        | regexp_replace(p_type, '[AEIOU]', '_', 'g') AS masked
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_date_arith" ->
      """SELECT o_orderkey,
        | CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2m,
        | last_day(o_orderdate) AS month_end,
        | CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS plus_45d,
        | CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
        | CAST(EXTRACT(week FROM o_orderdate) AS INT) AS wk
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_case" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'neg'
        |      WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), '<bldg>') AS seg,
        | greatest(c_acctbal, 0.0) AS bal_pos
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
