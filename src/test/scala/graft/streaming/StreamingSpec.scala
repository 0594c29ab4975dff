package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class EvP(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def batchEvents =
    Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")

  test("streaming tumbling agg equals the batch formulation") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    val q = EventStreams.tumbling(stream.toDF())
      .writeStream.format("memory").queryName("tumb")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumb")
      .orderBy($"wstart", $"event_type").collect().toSeq
    val batch = EventStreams.tumbling(batchEvents)
      .orderBy($"wstart", $"event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("watermark drops late data in append mode") {
    val stream = MemoryStream[Ev](spark)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, t: String, typ: String) =
      Ev(id, Timestamp.valueOf(t), 1L, typ, 1.0)
    try {
      stream.addData(ev(1, "2024-01-01 10:05:00", "a"), ev(2, "2024-01-01 10:50:00", "a"))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window
      stream.addData(ev(3, "2024-01-01 13:00:00", "a"))
      q.processAllAvailable()
      // this event is 2h late — behind the watermark — must be dropped
      stream.addData(ev(4, "2024-01-01 10:10:00", "a"))
      q.processAllAvailable()
      stream.addData(ev(5, "2024-01-01 15:00:00", "a"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late")
      .select(col("window.start").cast("string"), $"n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("2024-01-01 10:00:00") == 2L, s"late event not dropped: $rows")
  }

  test("streaming dedup within watermark") {
    val stream = MemoryStream[Ev](spark)
    val q = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, t: String) = Ev(id, Timestamp.valueOf(t), 1L, "x", 1.0)
    try {
      stream.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:01:00"),
        ev(2, "2024-01-01 10:02:00"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("dd").count() == 2)
  }

  test("stream_dedup: streaming dropDuplicates keeps the same first arrivals as batch") {
    // one partition + ts-ordered feed: "first encountered" in the
    // streaming dedup state store IS first-arrival. The batch min-struct
    // formulation must agree key-for-key and row-for-row.
    val stream = MemoryStream[Ev](1)(implicitly, spark.sqlContext)
    stream.addData(batchEvents.orderBy($"ts", $"event_id").as[Ev].collect().toIndexedSeq)
    val q = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates(Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("sdd")
      .outputMode(OutputMode.Update).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sdd")
      .select($"user_id", $"event_type", $"ts", $"event_id", $"value")
      .orderBy($"user_id", $"event_type").collect().toSeq
    val batch = EventStreams.firstArrival(batchEvents)
      .select($"user_id", $"event_type", $"first_ts".as("ts"),
        $"first_event_id".as("event_id"), $"first_value".as("value"))
      .orderBy($"user_id", $"event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("stream_topk: incremental windowed counts + snapshot rank equal batch top-k") {
    // the count is the streaming-stateful part (incremental per
    // (window, item)); the rank cut is applied on the emitted snapshot —
    // fed in two time-split batches to pin cross-batch state carry
    val evs = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[EvP].collect().sortBy(_.ts.getTime)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val stream = MemoryStream[EvP](spark)
    val counted = stream.toDF()
      .select(window($"ts", "1 hour").as("w"),
        expr("try_cast(regexp_extract(props, '(\\\\d+)', 1) AS BIGINT)")
          .as("item"))
      .filter($"item".isNotNull)
      .groupBy($"w", $"item").agg(count(lit(1)).as("n"))
    val q = counted.writeStream.format("memory").queryName("topk")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val ranked = spark.table("topk")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"w").orderBy($"n".desc, $"item")))
      .filter($"rnk" <= 3)
      .select($"w.start".as("wstart"), $"item", $"n",
        $"rnk".cast("int").as("rnk"))
      .orderBy($"wstart", $"rnk").collect().toSeq
    val batch = EventStreams.windowTopK(Tables.events(spark, sf0001))
      .orderBy($"wstart", $"rnk").collect().toSeq
    assert(ranked == batch)
  }

  test("stream_quantile: incremental histogram + snapshot readout equal batch") {
    // the (window, type, bin) count is the stateful part — bounded at
    // windows×types×bins, never event volume; the nearest-rank readout
    // runs on the emitted snapshot. Two time-split batches pin that the
    // second batch's counter increments land on carried state.
    val evs = batchEvents.as[Ev].collect().sortBy(_.ts.getTime)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val stream = MemoryStream[Ev](spark)
    val q = EventStreams.windowValueBins(stream.toDF())
      .writeStream.format("memory").queryName("qbins")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = EventStreams.quantileReadout(spark.table("qbins"))
      .orderBy($"wstart", $"event_type").collect().toSeq
    val batch = EventStreams.windowQuantile(Tables.events(spark, sf0001))
      .orderBy($"wstart", $"event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("stream_bitmap_distinct: incremental bitmap OR + popcount equal batch") {
    // bit_or is the stateful part — state bounded by windows×types×
    // (user domain / 32) longs, never event volume; exact where a
    // streaming sketch would estimate. Two time-split batches pin that
    // late users OR into carried bitmaps.
    val evs = batchEvents.as[Ev].collect().sortBy(_.ts.getTime)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val stream = MemoryStream[Ev](spark)
    val q = EventStreams.windowUserBitmaps(stream.toDF())
      .writeStream.format("memory").queryName("ubits")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = EventStreams.bitmapDistinctReadout(spark.table("ubits"))
      .orderBy($"wstart", $"event_type").collect().toSeq
    val batch = EventStreams
      .windowBitmapDistinct(Tables.events(spark, sf0001))
      .orderBy($"wstart", $"event_type").collect().toSeq
    assert(streamed == batch)
    // exactness: popcounts equal a plain windowed countDistinct
    val cd = Tables.events(spark, sf0001)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .select($"w.start".as("wstart"), $"event_type", $"n_users")
      .orderBy($"wstart", $"event_type").collect().toSeq
    assert(batch == cd)
  }

  test("stream_topk drops digit-free props instead of erroring under ANSI") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("props", StringType)))
    val rows = java.util.Arrays.asList(
      Row(Timestamp.valueOf("2024-01-01 10:05:00"), "item=42"),
      Row(Timestamp.valueOf("2024-01-01 10:06:00"), "no digits here"),
      Row(Timestamp.valueOf("2024-01-01 10:07:00"), "item=42"))
    val df = spark.createDataFrame(rows, schema)
    val out = EventStreams.windowTopK(df).collect()
    assert(out.length == 1 && out.head.getLong(1) == 42L &&
      out.head.getLong(2) == 2L)
  }

  test("session_trajectories carve the same sessions as session_window") {
    // two independent sessionizations (lag/cumsum vs Spark's
    // session_window state logic) must agree on every boundary
    val traj = EventStreams.sessionTrajectories(batchEvents)
      .select($"user_id", $"session_start", $"n_events")
      .orderBy($"user_id", $"session_start").collect().toSeq
    val sess = EventStreams.sessions(batchEvents)
      .select($"user_id", $"session_start", $"n_events")
      .orderBy($"user_id", $"session_start").collect().toSeq
    assert(traj == sess)
    // trajectories have exactly n_events - 1 separators
    EventStreams.sessionTrajectories(batchEvents).collect().foreach { r =>
      val (n, t) = (r.getAs[Long]("n_events"), r.getAs[String]("trajectory"))
      assert(t.count(_ == '>') == n - 1, s"$n vs $t")
    }
  }

  test("event_outliers: flags match a scalar re-derivation of the 3-sigma rule") {
    val rows = EventStreams.queries("event_outliers")(spark, sf0001).collect()
    val raw = batchEvents.select($"event_type", $"value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val ws = raw(r.getString(0))
      val (n, s, q) = (ws.length.toLong, ws.sum, ws.map(x => x * x).sum)
      val expect = ws.count { w =>
        val dev = n.toDouble * w.toDouble - s.toDouble
        dev * dev > 9.0 * (n.toDouble * q.toDouble - s.toDouble * s.toDouble)
      }
      assert(r.getLong(1) == n && r.getLong(2) == expect.toLong, s"${r.getString(0)}")
    }
  }

  test("stream-static join: live events flagged against batch-trained stats") {
    // the streaming twin of event_outliers: moments are trained in
    // batch (the static side, broadcastable), and the live stream is
    // scored row-by-row via a stream-static join — the standard
    // "anomaly-detect against a trained profile" deployment shape.
    val w = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val stats = batchEvents.select($"event_type", w.as("w"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"w").as("sw"),
        sum($"w" * $"w").as("qw"))
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    val dev = d2($"n") * d2(w) - d2($"sw")
    val rhs = lit(9.0) * (d2($"n") * d2($"qw") - d2($"sw") * d2($"sw"))
    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    val q = stream.toDF()
      .join(stats, "event_type") // stream-static equi join
      .withColumn("outlier", dev * dev > rhs)
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssj")
      .groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum(when($"outlier", 1L).otherwise(0L)).as("n_outliers"))
      .orderBy($"event_type").collect().toSeq
    val batch = EventStreams.queries("event_outliers")(spark, sf0001)
      .collect().toSeq
    assert(streamed == batch)
  }

  test("event_funnel: stage counts are monotone and match a scalar replay") {
    val r = EventStreams.queries("event_funnel")(spark, sf0001).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v $c $p")
    // scalar replay of the ordered-stage semantics
    val byUser = batchEvents.select($"user_id", $"event_type", $"ts").collect()
      .map(r0 => (r0.getLong(0), r0.getString(1), r0.getTimestamp(2)))
      .groupBy(_._1)
    var (ev, ec, ep) = (0L, 0L, 0L)
    byUser.values.foreach { rows =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        ev += 1
        val t1 = views.min
        val clicks = rows.filter(x => x._2 == "click" && x._3.after(t1)).map(_._3)
        if (clicks.nonEmpty) {
          ec += 1
          val t2 = clicks.min
          if (rows.exists(x => x._2 == "purchase" && x._3.after(t2))) ep += 1
        }
      }
    }
    assert((v, c, p) == ((ev, ec, ep)))
  }

  test("custom state: flatMapGroupsWithState running per-user counts") {
    val stream = MemoryStream[Ev](spark)
    val counted = stream.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator((uid, n))
      }
    val q = counted.toDF("user_id", "running_n")
      .writeStream.format("memory").queryName("st")
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, uid: Long) =
      Ev(id, Timestamp.valueOf("2024-01-01 10:00:00"), uid, "x", 1.0)
    try {
      stream.addData(ev(1, 7), ev(2, 7), ev(3, 8))
      q.processAllAvailable()
      stream.addData(ev(4, 7))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("st").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((7L, 2L), (8L, 1L), (7L, 3L)))
  }

  test("streaming parquet file sink with checkpoint") {
    val stream = MemoryStream[Ev](spark)
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = stream.toDF()
      .withWatermark("ts", "1 minute")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, t: String) = Ev(id, Timestamp.valueOf(t), 1L, "x", 1.0)
    try {
      stream.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      stream.addData(ev(3, "2024-01-01 10:10:00"))
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.parquet(outDir)
    assert(written.count() == 3)
    assert(written.columns.sorted.toSeq ==
      Seq("event_id", "event_type", "ts", "user_id", "value"))
  }

  test("stream-stream interval join with watermarks") {
    val purchases = MemoryStream[Ev](spark)
    val errors = MemoryStream[Ev](spark)
    val p = purchases.toDF().withWatermark("ts", "10 minutes")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value".as("p_value"))
    val e = errors.toDF().withWatermark("ts", "10 minutes")
      .select($"user_id".as("e_user"), $"ts".as("e_ts"), $"event_id".as("e_id"))
    // errors within 5 minutes AFTER a purchase by the same user
    val joined = p.join(e,
      $"p_user" === $"e_user" && $"e_ts" >= $"p_ts" &&
        $"e_ts" <= $"p_ts" + expr("INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, t: String, uid: Long) =
      Ev(id, Timestamp.valueOf(t), uid, "x", 1.0)
    try {
      purchases.addData(ev(1, "2024-01-01 10:00:00", 7))
      errors.addData(ev(100, "2024-01-01 10:03:00", 7),  // within window
        ev(101, "2024-01-01 10:09:00", 7),               // outside window
        ev(102, "2024-01-01 10:03:00", 8))               // other user
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssj").select($"e_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(100L))
  }

  test("foreachBatch sink: custom merge logic per micro-batch") {
    val stream = MemoryStream[Ev](spark)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (batchId, rows)
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized { seen += ((id, batch.count())) }
        () // custom sinks (upsert/merge) would go here
      }
      .outputMode(OutputMode.Append).start()
    def ev(id: Long) = Ev(id, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "x", 1.0)
    try {
      stream.addData(ev(1), ev(2)); q.processAllAvailable()
      stream.addData(ev(3)); q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._2).sum == 3 && seen.size >= 2)
  }

  test("incremental MinHash index equals batch banding, pair-for-pair") {
    // stream the near-dup corpus in three micro-batches through the
    // foreachBatch indexer; the union of per-batch candidates (new-vs-
    // index + new-vs-new) must equal one-shot banding of the full corpus
    val docs = graft.dedup.Dedup.docsWithNearDups(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    val stream = MemoryStream[(Long, String)](spark)
    val q = MinHashIndex.start(stream.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/pairs", s"$dir/chk")
    try docs.grouped(docs.length / 3 + 1).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/pairs").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.dedup.Dedup.docsWithNearDups(spark, sf0001)
      .select($"doc_id", $"text")
    val batch = MinHashIndex.withinPairs(MinHashIndex.postings(full))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture near-dups must collide in some band")
    // the index table holds every posting exactly once
    assert(spark.read.parquet(s"$dir/index").count() ==
      MinHashIndex.postings(full).count())
  }

  test("MinHash index micro-batch retry is idempotent (foreachBatch at-least-once)") {
    // foreachBatch delivers each batch AT LEAST once; the sink must make
    // retries idempotent. Simulate the worst retry states directly
    // against processBatch: (a) retry after a COMPLETE first attempt,
    // (b) retry after a PARTIAL write (postings landed without their
    // _SUCCESS marker — the probe must not pair the batch against its
    // own half-written postings). Final state must equal one clean run.
    val docs = graft.dedup.Dedup.docsWithNearDups(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val chunks = docs.grouped(docs.length / 2 + 1).toSeq
    def runAll(dir: String)(replay: (Long, org.apache.spark.sql.DataFrame) => Unit): Unit =
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val df = chunk.toIndexedSeq.toDF("doc_id", "text")
        MinHashIndex.processBatch(df, i.toLong,
          s"$dir/index", s"$dir/pairs", MinHashIndex.postings(_))
        replay(i.toLong, df)
      }
    def state(dir: String): (Set[(Long, Long)], Long) = (
      spark.read.parquet(s"$dir/pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      spark.read.parquet(s"$dir/index").count())
    val clean = java.nio.file.Files.createTempDirectory("mhclean").toString
    runAll(clean)((_, _) => ())
    val retried = java.nio.file.Files.createTempDirectory("mhretry").toString
    runAll(retried) { (id, df) =>
      if (id == 0)  // (a) full duplicate delivery of batch 0
        MinHashIndex.processBatch(df, id,
          s"$retried/index", s"$retried/pairs", MinHashIndex.postings(_))
      if (id == 1) { // (b) partial write: drop batch 1's _SUCCESS, retry
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
          s"$retried/index/batch=1/_SUCCESS"))
        MinHashIndex.processBatch(df, id,
          s"$retried/index", s"$retried/pairs", MinHashIndex.postings(_))
      }
    }
    assert(state(retried) == state(clean))
    assert(state(clean)._1.nonEmpty)
  }

  test("incremental SimHash index: the same indexer generalizes, stream equals batch") {
    val docs = graft.dedup.Dedup.docsWithNearDups(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val dir = java.nio.file.Files.createTempDirectory("shidx").toString
    val stream = MemoryStream[(Long, String)](spark)
    val q = MinHashIndex.start(stream.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/pairs", s"$dir/chk",
      banding = MinHashIndex.simhashPostings)
    try docs.grouped(docs.length / 3 + 1).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/pairs").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = MinHashIndex.withinPairs(MinHashIndex.simhashPostings(
      graft.dedup.Dedup.docsWithNearDups(spark, sf0001)
        .select($"doc_id", $"text")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("session_window boundary: events exactly one gap apart") {
    // Pins Spark's boundary semantics (measured, Spark 4.1) so the DuckDB
    // oracle's lag-comparison operator provably matches: an event at
    // EXACTLY prev_ts + gap still MERGES into the session (Spark merges
    // when next_start <= prev_end), so the oracle must use
    // `ts - lag(ts) <= gap` — which it does. One microsecond beyond the
    // gap starts a new session.
    val merged = EventStreams.sessions(Seq(
      Ev(1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.0),
      Ev(2L, Timestamp.valueOf("2024-01-01 00:10:00"), 7L, "click", 1.0))
      .toDF()).collect().toSeq
    assert(merged.size == 1, s"expected 1 merged session, got $merged")
    assert(merged.head.getTimestamp(1) == Timestamp.valueOf("2024-01-01 00:20:00"))
    val split = EventStreams.sessions(Seq(
      Ev(1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.0),
      Ev(2L, Timestamp.valueOf("2024-01-01 00:10:00.000001"), 7L, "click", 1.0))
      .toDF()).orderBy($"session_start").collect().toSeq
    assert(split.size == 2, s"expected 2 sessions, got $split")
  }

  test("streaming session windows equal batch sessionization") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    val q = EventStreams.sessions(stream.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess")
      .orderBy($"user_id", $"session_start").collect().toSeq
    val batch = EventStreams.sessions(batchEvents)
      .orderBy($"user_id", $"session_start").collect().toSeq
    assert(streamed == batch)
  }

  test("temporal_drift: scalar replay of the per-day TV arithmetic agrees") {
    val raw = batchEvents
      .select(to_date($"ts").as("day"), $"event_type", $"value").collect()
      .map(r => (r.getDate(0).toString,
        r.getString(1) + "|" +
          math.min(math.floor(r.getDouble(2) / 125.0).toLong, 3L)))
    val nTot = raw.length.toLong
    val nB = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byDay = raw.groupBy(_._1)
    val got = EventStreams.queries("temporal_drift")(spark, sf0001).collect()
    assert(got.map(_.getDate(0).toString).toSeq == byDay.keys.toSeq.sorted)
    got.foreach { r =>
      val (day, nEv, tvPpm, topB, topDev) = (r.getDate(0).toString,
        r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))
      val evs = byDay(day)
      assert(nEv == evs.length.toLong)
      val nDb = evs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // full grid: buckets the day never hit still contribute n_b·n_d
      val devs = nB.map { case (b, nb) =>
        b -> math.abs(nDb.getOrElse(b, 0L) * nTot - nb * nEv)
      }
      assert(tvPpm == devs.values.sum * 1000000L / (2 * nTot * nEv), day)
      val best = devs.toSeq.sortBy { case (b, dv) => (-dv, b) }.head
      assert((topB, topDev) == best, s"$day worst bucket")
      assert(tvPpm >= 0 && tvPpm <= 1000000L)
    }
  }

  test("temporal_decay: scalar replay of the bit-shift decay weights agrees") {
    val anchor = java.time.LocalDate.parse("2024-01-31")
    val raw = batchEvents
      .select(to_date($"ts").as("day"), $"event_type", $"value").collect()
      .map { r =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(
          r.getDate(0).toLocalDate, anchor)
        val w = 1024L >> math.min(age / 7, 10L).toInt
        val cents = BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLong
        (r.getString(1), w, cents)
      }
    val got = EventStreams.queries("temporal_decay")(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val evs = raw.filter(_._1 == r.getString(0))
      val (wn, wc) = (evs.map(_._2).sum, evs.map(e => e._2 * e._3).sum)
      assert(r.getLong(1) == evs.length.toLong, "n_events")
      assert(r.getLong(2) == wn, "decayed_n")
      assert(r.getLong(3) == wc, "decayed_cents")
      assert(r.getLong(4) == wc / wn, "decayed_avg_cents")
      // decay is real: weighted mass strictly below unweighted max-weight
      assert(wn < 1024L * evs.length)
    }
  }

  test("scd2_history: islands collapse, intervals chain, one current row per user") {
    val rows = EventStreams.queries("scd2_history")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5),
        r.getLong(6)))
    assert(rows.nonEmpty)
    val nEvents = batchEvents.count()
    assert(rows.map(_._7).sum == nEvents, "every log record owned by a version")
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val ordered = vs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq,
        s"user $user versions not dense")
      assert(ordered.count(_._6) == 1 && ordered.last._6,
        s"user $user: exactly the last version is current")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, s"user $user: uncollapsed duplicate state")
          assert(a._5.contains(b._4),
            s"user $user: valid_to must chain to the next valid_from")
          assert(a._4.before(b._4), s"user $user: intervals out of order")
        case _ => ()
      }
      assert(ordered.last._5.isEmpty, "current version must be open-ended")
    }
  }

  test("feature_zscore: scalar replay of the exact-moment IEEE tree agrees bitwise") {
    val raw = batchEvents.select($"event_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDouble(2))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLong))
    val stats = raw.groupBy(_._2).view.mapValues { es =>
      val ws = es.map(_._3)
      (ws.length.toLong, ws.sum, ws.map(w => w * w).sum)
    }.toMap
    val got = EventStreams.queries("feature_zscore")(spark, sf0001).collect()
    assert(got.length == raw.length)
    got.foreach { r =>
      val (n, sw, qw) = stats(r.getString(1))
      val w = raw.find(_._1 == r.getLong(0)).get._3
      val expect = (n.toDouble * w.toDouble - sw.toDouble) /
        math.sqrt(n.toDouble * qw.toDouble - sw.toDouble * sw.toDouble)
      assert(r.getDouble(2) == expect, s"event ${r.getLong(0)}: bitwise mismatch")
    }
    // standardization sanity: per-type z-sums vanish up to truncation
    got.groupBy(_.getString(1)).values.foreach { g =>
      assert(math.abs(g.map(_.getDouble(2)).sum) < 1e-6 * g.size)
    }
  }

  test("cohort_retention: age-0 cell equals cohort size, replay agrees") {
    val raw = batchEvents.select($"user_id", to_date($"ts").as("d")).collect()
      .map(r => (r.getLong(0), java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse("2024-01-01"), r.getDate(1).toLocalDate) / 7))
    val cohort = raw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = raw.map { case (u, wk) => (cohort(u), wk - cohort(u), u) }
      .distinct.groupBy(c => (c._1, c._2)).view.mapValues(_.length.toLong).toMap
    val got = EventStreams.queries("cohort_retention")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == cells && got.nonEmpty)
    // every cohort's age-0 cell is the whole cohort (first week counts)
    cohort.values.toSet[Long].foreach { cw =>
      assert(got((cw, 0L)) == cohort.count(_._2 == cw).toLong)
    }
  }

  test("streaming last-touch attribution equals the batch query across micro-batches") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[AttrEvent].collect()
      .sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
    // two time-split micro-batches: the second half's purchases depend on
    // state built in the first — the cross-batch carry under test
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val stream = MemoryStream[AttrEvent](spark)
    val q = AttributionStream.attributionStream(stream.toDS())
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("attr").groupBy(col("attributed_type"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
      .collect().map(r => r.getAs[String]("attributed_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_cents"))).toMap
    val batch = graft.operators.Mining
      .queries("attribution_last_touch")(spark, sf0001)
      .collect().map(r => r.getAs[String]("attributed_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_cents"))).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // per-purchase granularity too: every purchase event got exactly one hit
    val nPurchases = evs.count(_.event_type == "purchase")
    assert(spark.table("attr").count() == nPurchases)
  }
}
