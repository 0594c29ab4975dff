package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar-replay checks for the Stats module: the fixed-point integer
  * results must agree with Spark's own floating-point estimators to
  * within quantization error. */
class StatsSpec extends SparkSpec {

  test("feature_corr: r2_ppm matches corr()^2 within 1 ppm; signs agree") {
    val rows = Stats.queries("feature_corr")(spark, sf0001).collect()
    assert(rows.length == 3)
    val li = graft.Tables.lineitem(spark, sf0001).select(
      col("l_quantity").as("quantity"),
      round(col("l_discount") * 100).as("discount"),
      round(col("l_tax") * 100).as("tax"))
    for (r <- rows) {
      val (x, y) = (r.getAs[String]("x_name"), r.getAs[String]("y_name"))
      val rFloat = li.agg(corr(col(x), col(y))).head().getDouble(0)
      val r2Ppm = r.getAs[Long]("r2_ppm")
      assert(math.abs(rFloat * rFloat * 1e6 - r2Ppm) <= 1.0,
        s"$x/$y: float ${rFloat * rFloat * 1e6} vs fixed $r2Ppm")
      assert(r.getAs[Int]("corr_sign") == math.signum(rFloat).toInt)
    }
  }

  test("feature_corr: moments survive a constant-shift sanity (corr(q,q)=1 analogue)") {
    // degenerate self-pair isn't emitted, but r² must be ≤ 1e6 for all
    val rows = Stats.queries("feature_corr")(spark, sf0001).collect()
    assert(rows.forall(r => r.getAs[Long]("r2_ppm") >= 0 &&
      r.getAs[Long]("r2_ppm") <= 1000000L))
  }

  test("token_entropy: micro-nat entropy matches double-precision H within 1e-4 nats") {
    val rows = Stats.queries("token_entropy")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val w = graft.Tables.documents(spark, sf0001)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .groupBy("lang").agg(
        sum("c").as("n"),
        sum(col("c") * log(col("c").cast("double"))).as("clnc"))
      .collect().map(r => r.getAs[String]("lang") ->
        (math.log(r.getAs[Long]("n").toDouble) -
          r.getAs[Double]("clnc") / r.getAs[Long]("n"))).toMap
    for (r <- rows) {
      val h = r.getAs[Long]("entropy_micronats") / 1e6
      val exact = w(r.getAs[String]("lang"))
      assert(math.abs(h - exact) < 1e-4, s"${r.getAs[String]("lang")}: $h vs $exact")
      // entropy is bounded by ln(vocab)
      assert(h >= 0 && h <= math.log(r.getAs[Long]("vocab").toDouble) + 1e-6)
    }
  }

  test("token_entropy: ttr_ppm is vocab/tokens in ppm") {
    val rows = Stats.queries("token_entropy")(spark, sf0001).collect()
    for (r <- rows) {
      val expect = r.getAs[Long]("vocab") * 1000000L / r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("ttr_ppm") == expect)
    }
  }

  test("feature_mi: micro-nat MI matches double-precision MI; information inequalities hold") {
    val r = Stats.queries("feature_mi")(spark, sf001).head()
    val grid = graft.Tables.customer(spark, sf001)
      .groupBy(col("c_mktsegment").as("x"), col("c_nationkey").as("y"))
      .agg(count(lit(1)).as("nxy")).collect()
      .map(g => (g.getAs[String]("x"), g.getAs[Int]("y"), g.getAs[Long]("nxy")))
    val n = grid.map(_._3).sum.toDouble
    val nx = grid.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
    val ny = grid.groupBy(_._2).map { case (k, g) => k -> g.map(_._3).sum }
    val mi = grid.map { case (x, y, c) =>
      c / n * math.log(c * n / (nx(x).toDouble * ny(y).toDouble)) }.sum
    val hx = -nx.values.map(c => c / n * math.log(c / n)).sum
    val hy = -ny.values.map(c => c / n * math.log(c / n)).sum
    assert(math.abs(r.getAs[Long]("mi_micronats") / 1e6 - mi) < 1e-4,
      s"MI ${r.getAs[Long]("mi_micronats") / 1e6} vs $mi")
    assert(math.abs(r.getAs[Long]("hx_micronats") / 1e6 - hx) < 1e-4)
    assert(math.abs(r.getAs[Long]("hy_micronats") / 1e6 - hy) < 1e-4)
    // 0 ≤ MI ≤ min(Hx, Hy), up to quantization
    assert(r.getAs[Long]("mi_micronats") >= -2L)
    assert(r.getAs[Long]("mi_micronats") <=
      math.min(r.getAs[Long]("hx_micronats"), r.getAs[Long]("hy_micronats")) + 2L)
  }

  test("event_mad: med2/mad4/outliers replay against a sorted-array median") {
    val rows = Stats.queries("event_mad")(spark, sf0001).collect()
    assert(rows.length == 5)
    val byType = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().groupBy(_.getAs[String]("event_type"))
    def med2(xs: Array[Long]): Long = {           // 2 × interpolated median
      val s = xs.sorted
      if (s.length % 2 == 1) 2 * s(s.length / 2)
      else s(s.length / 2 - 1) + s(s.length / 2)
    }
    for (r <- rows) {
      val cs = byType(r.getAs[String]("event_type")).map(_.getAs[Long]("c"))
      val m2 = med2(cs)
      assert(r.getAs[Long]("med2") == m2)
      val dev2 = cs.map(c => math.abs(2 * c - m2))
      val m4 = med2(dev2)
      assert(r.getAs[Long]("mad4") == m4)
      assert(r.getAs[Long]("n_outliers") == dev2.count(d => 2 * d > 3 * m4))
      assert(r.getAs[Long]("n") == cs.length)
    }
  }

  test("rfm_segments: scores in 1..4, census preserves customers and money") {
    val rows = Stats.queries("rfm_segments")(spark, sf001).collect()
    for (r <- rows; k <- Seq("r_q", "f_q", "m_q")) {
      val v = r.getAs[Int](k); assert(v >= 1 && v <= 4, s"$k=$v")
    }
    val o = graft.Tables.orders(spark, sf001)
    val nCust = o.select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    val totCents = o.select(
      sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("monetary_cents")).sum == totCents)
    // quartiling is near-balanced per axis: no quartile holds more than
    // half the customers (ties can skew, but not collapse, the split)
    for (k <- Seq("r_q", "f_q", "m_q")) {
      val perQ = rows.groupBy(_.getAs[Int](k))
        .map { case (_, rs) => rs.map(_.getAs[Long]("n_customers")).sum }
      assert(perQ.max <= nCust / 2, s"$k skew: $perQ")
    }
  }

  test("ab_test: double-precision Welch t² agrees with the integer identity") {
    val r = Stats.queries("ab_test")(spark, sf0001).head()
    // scalar replay: per-user purchase spend, variants via the shared
    // xorshift bucket, textbook double-precision Welch statistic
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
    val spend = ev.groupBy(_.getAs[Long]("user_id")).map { case (uid, rs) =>
      uid -> rs.filter(_.getAs[String]("event_type") == "purchase")
        .map(_.getAs[Long]("cents")).sum
    }
    def bucket(id: Long): Long = {
      val m = (id % 1000003L) * 2654435761L
      (m ^ (m >> 13)) % 1000000L
    }
    val (a, b) = spend.partition { case (uid, _) => bucket(uid) < 500000L }
    assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
    assert(r.getAs[Long]("mean_a_ucents") ==
      a.values.map(v => BigInt(v)).sum * 1000000 / a.size)
    val (ma, mb) = (a.values.sum.toDouble / a.size, b.values.sum.toDouble / b.size)
    def svar(xs: Iterable[Long], m: Double) =
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1.0)
    val t2 = (ma - mb) * (ma - mb) /
      (svar(a.values, ma) / a.size + svar(b.values, mb) / b.size)
    val t2ppm = r.getAs[Long]("t2_ppm").toDouble
    assert(math.abs(t2ppm / 1e6 - t2) < 1e-5 * math.max(1.0, t2),
      s"integer t2_ppm=$t2ppm vs double t2=$t2")
    assert(r.getAs[Int]("significant") == (if (t2 > 3.8416) 1 else 0))
  }

  test("ab_test: an empty variant yields zero rows, matching the oracle join") {
    import spark.implicits._
    // pick user ids that ALL hash to variant A via the shared bucket —
    // the conditional aggregation then produces NULL B-side moments and
    // must DROP the row (the oracle's A×B self-join emits none)
    def bucket(id: Long): Long = {
      val m = (id % 1000003L) * 2654435761L
      (m ^ (m >> 13)) % 1000000L
    }
    val aOnly = (1L to 500L).filter(bucket(_) < 500000L).take(5)
    assert(aOnly.size == 5)
    val dir = java.nio.file.Files.createTempDirectory("ab_empty").toString
    aOnly.zipWithIndex.map { case (uid, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"),
        uid, "purchase", 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    assert(Stats.queries("ab_test")(spark, dir).count() == 0L)
  }
}
