package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CustomFnSpec extends SparkSpec {
  import spark.implicits._

  test("hamming64 expression equals bit_count(xor) and survives codegen") {
    val df = Seq((0L, -1L), (5L, 6L), (Long.MaxValue, Long.MinValue), (42L, 42L))
      .toDF("a", "b")
    val got = df.select(
      HammingDistance.hamming64($"a", $"b").as("h"),
      bit_count($"a".bitwiseXOR($"b")).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    assert(got(0).getInt(0) == 64 && got(3).getInt(0) == 0)
  }

  test("hamming64 registers as a SQL function") {
    HammingDistance.register(spark)
    val r = spark.sql("SELECT hamming64(CAST(5 AS BIGINT), CAST(6 AS BIGINT))")
    assert(r.head.getInt(0) == 2)
  }

  test("hamming64 null semantics") {
    val df = Seq((Some(1L), None: Option[Long]), (Some(1L), Some(3L))).toDF("a", "b")
    val got = df.select(HammingDistance.hamming64($"a", $"b")).collect()
    assert(got(0).isNullAt(0) && got(1).getInt(0) == 1)
  }

  test("ProductAgg: null-skipping, empty group null, SQL registration") {
    val df = Seq(("g1", Some(2.0)), ("g1", Some(3.0)), ("g1", None),
      ("g2", None): (String, Option[Double])).toDF("g", "x")
    val out = df.groupBy($"g").agg(ProductAgg.product_agg($"x").as("p"))
      .orderBy($"g").collect()
    assert(out(0).getDouble(1) == 6.0) // null skipped
    assert(out(1).isNullAt(1))         // all-null group → null
    ProductAgg.register(spark)
    df.createOrReplaceTempView("prodagg_t")
    val viaSql = spark.sql(
      "SELECT product_agg(x) FROM prodagg_t WHERE g = 'g1'").head.getDouble(0)
    assert(viaSql == 6.0)
  }

  test("SecondMax aggregator: distinct semantics, single-value groups → null") {
    val df = Seq(("g1", 5.0), ("g1", 9.0), ("g1", 9.0), ("g1", 2.0), ("g2", 1.0))
      .toDF("g", "x")
    val sm = udaf(Custom.SecondMax)
    val out = df.groupBy($"g").agg(sm($"x").as("s")).orderBy($"g").collect()
    assert(out(0).getDouble(1) == 5.0) // distinct: 9,9 collapse; second is 5
    assert(out(1).isNullAt(1))         // one distinct value → no second max
  }

  test("ExtremumByOrd: seeded-random parity with a scalar reference across partitionings") {
    import graft.functions.ExtremumByOrd.{maxByOrd, minByOrd}
    val rnd = new scala.util.Random(0xC0FFEE)
    val rows = Seq.tabulate(500) { i =>
      val g = rnd.nextInt(7).toLong
      val v: java.lang.Long = if (rnd.nextInt(10) == 0) null else rnd.nextInt(1000).toLong
      val o1 = rnd.nextInt(5).toLong           // coarse key: real tie pressure
      val o2 = rnd.nextLong()                  // unique-ish tiebreak
      (g, v, o1, o2)
    }
    val expectMin = rows.filter(_._2 != null).groupBy(_._1).map { case (g, rs) =>
      g -> rs.minBy(r => (r._3, r._4))._2.longValue }
    val expectMax = rows.filter(_._2 != null).groupBy(_._1).map { case (g, rs) =>
      g -> rs.maxBy(r => (r._3, r._4))._2.longValue }
    for (parts <- Seq(1, 4, 13)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)), parts),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("g",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField("o1",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("o2",
            org.apache.spark.sql.types.LongType))))
      val got = df.groupBy(col("g"))
        .agg(minByOrd(col("v"), col("o1"), col("o2")).as("mn"),
          maxByOrd(col("v"), col("o1"), col("o2")).as("mx"))
        .collect().map(r => r.getAs[Long]("g") ->
          (r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toMap
      for ((g, mn) <- expectMin)
        assert(got(g)._1 == mn, s"parts=$parts g=$g min")
      for ((g, mx) <- expectMax)
        assert(got(g)._2 == mx, s"parts=$parts g=$g max")
    }
  }
}
