package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dq_checks must DETECT violations, not just count zeros on clean data:
  * a synthetic corrupted mini-warehouse plants one violation per
  * constraint class and the report has to find exactly them. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("dq_checks: planted violations are each detected exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    // customer 1,2 — order 3 references 99 (FK violation) and order 4
    // has a NULL custkey (null-keys violation + FK violation: a NULL FK
    // can never match, so referential integrity counts it too)
    Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    Seq(
      (1L, Option(1L), 10.0), (2L, Option(2L), 20.0),
      (3L, Option(99L), 30.0),                  // orphan custkey
      (4L, Option.empty[Long], -5.0))           // null key + negative price
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, "p")).toDF("p_partkey", "p_name")
      .write.parquet(s"$dir/part.parquet")
    Seq(
      (1L, 1L, 1L, 5.0),   // clean
      (1L, 1L, 1L, 6.0),   // duplicate (orderkey, linenumber)
      (99L, 1L, 2L, 7.0),  // orphan orderkey
      (1L, 77L, 3L, 8.0),  // orphan partkey
      (2L, 1L, 1L, 99.0))  // quantity out of range
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")

    val got = Quality.queries("dq_checks")(spark, dir).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"))).toMap
    assert(got("lineitem_fk_orders") == (5L, 1L))
    assert(got("lineitem_fk_part") == (5L, 1L))
    assert(got("orders_fk_customer") == (4L, 2L)) // orphan + null FK
    assert(got("lineitem_qty_range") == (5L, 1L))
    assert(got("orders_price_positive") == (4L, 1L))
    assert(got("lineitem_pk_unique") == (5L, 1L))
    assert(got("orders_null_keys") == (4L, 1L))
  }

  test("dq_checks: generated data is referentially clean; the PK check finds real dups") {
    val got = Quality.queries("dq_checks")(spark, sf0001).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations"))
      .toMap
    for (k <- Seq("lineitem_fk_orders", "lineitem_fk_part",
        "orders_fk_customer", "lineitem_qty_range",
        "orders_price_positive", "orders_null_keys"))
      assert(got(k) == 0L, s"$k: ${got(k)}")
    // the generator does NOT make (orderkey, linenumber) unique — the
    // report must say so rather than flatter the data
    val li = graft.Tables.lineitem(spark, sf0001)
    val expectDups = li.count() -
      li.select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(got("lineitem_pk_unique") == expectDups)
  }
}
