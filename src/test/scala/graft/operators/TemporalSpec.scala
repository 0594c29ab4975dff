package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural + replay checks for the Temporal module. */
class TemporalSpec extends SparkSpec {

  test("ts_seasonal: dow means and residual argmax replay from a scalar walk") {
    val rows = Temporal.queries("ts_seasonal")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // independent replay: collect the daily totals and re-derive
    val daily = graft.Tables.events(spark, sf0001)
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("day").agg(sum("c").as("total")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byDow = daily.groupBy { case (day, _) => day % 7 }
    val expect = byDow.toSeq.map { case (dow, ds) =>
      val n = ds.length.toLong
      val mean = ds.map(_._2).sum / n // positive totals: div == floor
      val (wd, resid) = ds.map { case (day, t) => (day, t - mean) }
        .minBy { case (day, r) => (-math.abs(r), day) }
      (dow, n, mean, wd, resid)
    }.sortBy(_._1)
    assert(rows.toSeq == expect)
    // dow partition: residuals within each dow sum to ~0 (truncation
    // leaves at most n_days-1 cents)
    rows.foreach { case (dow, n, mean, _, _) =>
      val tot = daily.filter(_._1 % 7 == dow).map(_._2).sum
      assert(tot / n == mean)
    }
  }

  test("ts_seasonal: refund-heavy (negative-total) days keep cross-engine div semantics") {
    // the mean is sign-explicit: -7 cents over 2 days must give -3
    // (truncation toward zero on the NEGATED positive), matching what
    // DuckDB computes with the same CASE — not floor's -4
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seas_fix").toString
    Seq( // two Thursdays (days 0 and 7 are dow 4... day%7: 0 and 7 -> 0)
      (1L, java.sql.Timestamp.valueOf("1970-01-01 10:00:00"), 1L, "refund", -0.05, "x"),
      (2L, java.sql.Timestamp.valueOf("1970-01-08 10:00:00"), 1L, "refund", -0.02, "x"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Temporal.queries("ts_seasonal")(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(2) == -3L, s"mean: ${rows.head}")
    // worst residual day: day0 resid -5-(-3) = -2, day7 resid +1 ->
    // |−2| > |1| -> worst_day 0
    assert(rows.head.getLong(3) == 0L && rows.head.getLong(4) == -2L)
  }

  test("ts_fill: dense grid, real gaps filled with 0 and carried forward") {
    val df = Temporal.queries("ts_fill")(spark, sf0001)
    val rows = df.collect()
    // dense axis: |types| × |hours| exactly
    val types = rows.map(_.getAs[String]("event_type")).distinct.length
    val hours = rows.map(_.getAs[java.sql.Timestamp]("h")).distinct.length
    assert(rows.length == types * hours)
    // sf0.001 has thousands of true gaps (verified 2 732 of 3 600 cells);
    // every gap must carry n=0, v_cents=0
    val gaps = rows.filter(_.getAs[Long]("n") == 0L)
    assert(gaps.length > 100)
    assert(gaps.forall(_.getAs[Long]("v_cents") == 0L))
    // forward fill: within a type (ordered by hour), ffill equals the
    // most recent non-gap hour's v_cents (null before the first one)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      var lastSeen: Option[Long] = None
      rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime).foreach { r =>
        if (r.getAs[Long]("n") > 0L) lastSeen = Some(r.getAs[Long]("v_cents"))
        val got = Option(r.getAs[java.lang.Long]("ffill_cents")).map(_.toLong)
        assert(got == lastSeen, s"ffill mismatch at $r")
      }
    }
  }

  test("ts_ohlc: min_by/max_by agg equals the window formulation") {
    val agg = Temporal.queries("ts_ohlc")(spark, sf0001)
    val ev = graft.Tables.events(spark, sf0001).select(
      col("event_type"), to_date(col("ts")).as("day"), col("ts"),
      col("event_id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
    val wA = Window.partitionBy("event_type", "day")
      .orderBy(col("ts").asc, col("event_id").asc)
    val wD = Window.partitionBy("event_type", "day")
      .orderBy(col("ts").desc, col("event_id").desc)
    val win = ev
      .withColumn("rnA", row_number().over(wA))
      .withColumn("rnD", row_number().over(wD))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rnA") === 1, col("c"))).as("open_cents"),
        max(when(col("rnD") === 1, col("c"))).as("close_cents"),
        max("c").as("high_cents"), min("c").as("low_cents"),
        sum("c").as("vol_cents"))
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
    // candle invariant
    assert(agg.filter(col("open_cents") > col("high_cents") ||
      col("close_cents") > col("high_cents") ||
      col("open_cents") < col("low_cents") ||
      col("close_cents") < col("low_cents")).isEmpty)
  }

  test("ts_ohlc: custom agg matches built-in min_by/max_by and avoids SortAggregate") {
    import graft.functions.ExtremumByOrd.{maxByOrd, minByOrd}
    val ev = graft.Tables.events(spark, sf0001).select(
      col("event_type"), to_date(col("ts")).as("day"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
    val key = struct(col("ts_us"), col("event_id"))
    val builtin = ev.groupBy("event_type", "day")
      .agg(min_by(col("c"), key).as("o"), max_by(col("c"), key).as("cl"))
    val custom = ev.groupBy("event_type", "day")
      .agg(minByOrd(col("c"), col("ts_us"), col("event_id")).as("o"),
        maxByOrd(col("c"), col("ts_us"), col("event_id")).as("cl"))
    assert(custom.exceptAll(builtin).isEmpty && builtin.exceptAll(custom).isEmpty)
    // physical shape: the TypedImperativeAggregate must run in
    // ObjectHashAggregate; the built-in struct form demotes to
    // SortAggregate (the regression this custom agg exists to avoid)
    val customPlan = custom.queryExecution.executedPlan.toString
    assert(customPlan.contains("ObjectHashAggregate"), customPlan)
    assert(!customPlan.contains("SortAggregate"), customPlan)
    val builtinPlan = builtin.queryExecution.executedPlan.toString
    assert(builtinPlan.contains("SortAggregate"), builtinPlan)
    // empty group ⇒ NULL; null ordering keys are skipped
    import spark.implicits._
    val edge = Seq((1L, Option(5L), Option(10L)), (1L, Option(7L), Option.empty[Long]))
      .toDF("g", "v", "k")
      .groupBy("g").agg(minByOrd(col("v"), col("k"), lit(0L)).as("m"))
      .head()
    assert(edge.getAs[Long]("m") == 5L)
  }

  test("window_median: rolling med2 replays from sorted 7-day frames") {
    val rows = Temporal.queries("window_median")(spark, sf0001).collect()
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.length % 2 == 1) 2 * s(s.length / 2)
      else s(s.length / 2 - 1) + s(s.length / 2)
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
      val ns = ordered.map(_.getAs[Long]("n")).toSeq
      ordered.zipWithIndex.foreach { case (r, i) =>
        val frame = ns.slice(math.max(0, i - 6), i + 1)
        assert(r.getAs[Long]("med2_7d") == med2(frame),
          s"row $i: ${r.getAs[Long]("med2_7d")} vs ${med2(frame)}")
      }
    }
  }

  test("ts_anomaly: spike census replays from the rolling-median series") {
    val rows = Temporal.queries("ts_anomaly")(spark, sf0001).collect()
    val marg = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")).collect()
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.length % 2 == 1) 2 * s(s.length / 2)
      else s(s.length / 2 - 1) + s(s.length / 2)
    }
    val byType = marg.groupBy(_.getAs[String]("event_type"))
    assert(rows.map(_.getAs[Long]("n_spikes")).sum > 0, "vacuous fixture")
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val ordered = byType(t)
        .sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
      val ns = ordered.map(_.getAs[Long]("n")).toSeq
      val series = ordered.zipWithIndex.map { case (row, i) =>
        val m2 = med2(ns.slice(math.max(0, i - 6), i + 1))
        val n = row.getAs[Long]("n")
        val devPpt = math.abs(n * 2 - m2) * 1000 / m2
        (row.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
          devPpt, math.abs(n * 2 - m2) * 8 > m2 * 2)
      }
      assert(r.getAs[Long]("n_days") == series.length)
      assert(r.getAs[Long]("n_spikes") == series.count(_._3))
      assert(r.getAs[Long]("worst_dev_ppt") == series.map(_._2).max)
      val worst = series.maxBy(p => (p._2, p._1))
      assert(r.getAs[java.sql.Date]("worst_day").toLocalDate.toEpochDay
        == worst._1)
    }
  }

  test("trend_slope: integer slope/r2 agree with double least squares") {
    val rows = Temporal.queries("trend_slope")(spark, sf0001).collect()
    assert(rows.length == 5)
    val m = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .collect().groupBy(_.getAs[String]("event_type"))
    for (r <- rows) {
      val pts = m(r.getAs[String]("event_type"))
        .map(p => (p.getAs[java.sql.Date]("day").toLocalDate.toEpochDay.toDouble,
          p.getAs[Long]("y").toDouble))
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val (sxx, syy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val gotSlope = r.getAs[Long]("slope_ppm") / 1e6
      assert(math.abs(gotSlope - slope) < 2e-6,
        s"${r.getAs[String]("event_type")}: $gotSlope vs $slope")
      assert(r.getAs[Int]("slope_sign") == math.signum(slope).toInt ||
        slope == 0.0)
      val r2 = math.pow(n * sxy - sx * sy, 2) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getAs[Long]("r2_ppm") / 1e6 - r2) < 2e-6)
    }
  }
}
