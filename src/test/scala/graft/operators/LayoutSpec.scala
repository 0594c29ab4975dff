package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class LayoutSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("bucketed join runs with zero exchanges; values equal the plain join") {
    val out = Layout.queries("join_bucketed")(spark, sf0001)
    val plan = executed(out)
    // the ingest write paid the only shuffle; the join itself is
    // co-located. The final groupBy/orderBy MAY shuffle — assert that no
    // exchange repartitions on the JOIN keys and both scans read
    // bucketed. (String-level: AQE wraps the join in query stages whose
    // subtrees TreeNode.collect does not descend into.)
    val ps = plan.toString
    assert(ps.contains("SortMergeJoin"), s"expected a SortMergeJoin:\n$ps")
    assert(!ps.contains("Exchange hashpartitioning(o_custkey") &&
      !ps.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join should not shuffle either side:\n$ps")
    assert(ps.split("Bucketed: true").length >= 3, // both scans bucketed
      s"expected two bucketed scans:\n$ps")

    // same values as the unbucketed formulation
    val plain = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("c_mktsegment"))
      .collect().toSeq
    assert(out.collect().toSeq == plain)
  }

  test("bucket pruning: a point predicate on the bucket key scans 1 of 8 buckets") {
    val (ordT, _) = Layout.bucketedOrdersCustomer(spark, sf0001)
    val someKey = spark.table(ordT).select(col("o_custkey")).head.getLong(0)
    // DisableUnnecessaryBucketedScan turns bucketed reading off for a
    // bare filter (no operator wants the hash distribution) — but that
    // also forfeits bucket PRUNING, which is exactly what a point lookup
    // on the bucket key wants. Pin the scan to bucketed for this test.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val q = spark.table(ordT).filter(col("o_custkey") === someKey)
      val plan = executed(q)
      assert(plan.toString.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning in:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("zvalue: bit interleave is exact and order-embeds both dimensions") {
    val df = spark.createDataFrame(Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (65535L, 65535L)
    )).toDF("x", "y")
    val got = df.select(Layout.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave x at even bits, y at odd: z(1,0)=1, z(0,1)=2, z(1,1)=3,
    // z(2,3) = (x bits 10 → 0b100) | (y bits 11 → 0b1010) = 0b1110 = 14
    assert(got == Seq(0L, 1L, 2L, 3L, 14L, (1L << 32) - 1))
  }

  test("z-sorted layout prunes 2-D box queries that random layout cannot") {
    val orders = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536)).as("x"),
        pmod(floor(col("o_totalprice")), lit(65536)).as("y"))
      .withColumn("z", Layout.zvalue(col("x"), col("y")))
    val nFiles = 8
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft_random").toString
    orders.repartitionByRange(nFiles, col("z")).write.mode("overwrite").parquet(zDir)
    orders.repartition(nFiles).write.mode("overwrite").parquet(rDir)

    // box predicate on BOTH dimensions (~1/16 of each axis)
    val (xLo, xHi, yLo, yHi) = (0L, 24L, 0L, 9999L)
    def box(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
    def filesTouched(dir: String): Int =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .count(f => box(spark.read.parquet(f.getPath)).limit(1).count() > 0)

    val matches = box(spark.read.parquet(zDir)).count()
    assert(matches > 0, "empty box — test data drifted")
    assert(box(spark.read.parquet(rDir)).count() == matches)
    val zTouched = filesTouched(zDir)
    val rTouched = filesTouched(rDir)
    // random layout spreads the box everywhere; z-clustering confines it
    assert(zTouched < rTouched,
      s"z-order should touch fewer files: z=$zTouched random=$rTouched")
    assert(zTouched <= nFiles / 2, s"weak clustering: z=$zTouched of $nFiles")
  }

  test("HLL sketch merge: shard-union == direct, partitioning-independent, within error") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0)
    def mergedEstimate(parts: Int): Long =
      li.repartition(parts)
        .withColumn("shard", pmod(col("l_orderkey"), lit(8)))
        .groupBy(col("shard"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .head.getLong(0)
    val direct = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .head.getLong(0)
    val m4 = mergedEstimate(4)
    val m32 = mergedEstimate(32)
    // register-max semantics: same registers regardless of partitioning
    // or shard split — merge must be lossless
    assert(m4 == m32, s"partitioning-dependent estimate: $m4 vs $m32")
    assert(m4 == direct, s"shard merge lost information: $m4 vs direct $direct")
    // lgConfigK=12 default → relative error ~1.6%/sqrt bound; allow 5%
    assert(math.abs(m4 - exact).toDouble / exact < 0.05,
      s"estimate $m4 vs exact $exact")
  }

  test("approx percentile cutoff tracks the exact p25 per lang") {
    val exact = graft.text.TextAnalysis
      .queries("text_quality_filter")(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = graft.text.TextAnalysis
      .queries("text_quality_filter_approx")(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // percentile() INTERPOLATES between order statistics; the fixed-grid
    // histogram cutoff is a bin lower edge ≤ one bin width (1e-4) away —
    // so a few docs between the two cutoffs legitimately flip. Allow 2%,
    // never a gross drift.
    val sym = (exact diff approx) ++ (approx diff exact)
    assert(sym.size <= math.max(2, exact.size / 50),
      s"approx filter drifted: |exact|=${exact.size} |approx|=${approx.size} sym=${sym.size}")
  }

  test("quantile_hist: bins bracket the nearest-rank exact percentiles; histograms merge") {
    val rows = RelationalQueries.queries("quantile_hist")(spark, sf0001).collect()
    val vals = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet == vals.keySet)
    rows.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val sorted = vals(t).map(_._2).sorted
      assert(n == sorted.length.toLong)
      val ps = Seq(25 -> r.getLong(2), 50 -> r.getLong(3), 90 -> r.getLong(4))
      ps.foreach { case (q, lo) =>
        // the first bin with cum·100 ≥ n·q contains the nearest-rank
        // element, so the true percentile sits inside [lo, lo+width)
        val exact = sorted(math.ceil(n.toDouble * q / 100).toInt - 1)
        assert(lo <= exact && exact < lo + 10,
          s"$t p$q: exact $exact outside [$lo, ${lo + 10})")
      }
      assert(ps(0)._2 <= ps(1)._2 && ps(1)._2 <= ps(2)._2)
    }
    // linearity: per-shard histograms sum to the corpus histogram (the
    // property that lets shards/days merge without re-reading rows)
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        (floor(col("value") / 10).cast("long") * 10).as("bin_lo"))
      .groupBy(col("event_type"), col("bin_lo")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = graft.Tables.events(spark, sf0001)
    val (ha, hb) = (hist(ev.filter(col("event_id") % 2 === 0)),
      hist(ev.filter(col("event_id") % 2 =!= 0)))
    val whole = hist(ev)
    assert(whole.keySet == (ha.keySet ++ hb.keySet))
    whole.foreach { case (k, v) =>
      assert(v == ha.getOrElse(k, 0L) + hb.getOrElse(k, 0L), s"$k")
    }
  }

  test("join_dpp: runtime dynamic pruning reads only the dim-selected partitions") {
    val out = Layout.queries("join_dpp")(spark, sf0001)
    val rows = out.collect()
    // one quarter: exactly the three 1996-Q1 months, nothing else
    assert(rows.map(_.getString(0)).toSeq == Seq("1996-01", "1996-02", "1996-03"))
    // the executed fact scan must carry the runtime pruning subquery on
    // the partition column — NOT a full read filtered later
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP subquery in:\n${plan.take(3000)}")
    // and values equal the direct predicate on the raw parquet
    val want = graft.Tables.lineitem(spark, sf0001)
      .withColumn("ym", date_format(col("l_shipdate"), "yyyy-MM"))
      .filter(col("ym").isin("1996-01", "1996-02", "1996-03"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("ym")).collect().toSeq
    assert(rows.toSeq == want)
  }

  test("layout_compact: per-month files collapse 8 -> 1, data round-trips") {
    // the census query must be green first (it builds both tables)
    val census = Layout.queries("layout_compact")(spark, sf0001).collect()
    assert(census.nonEmpty)
    def filesPerPartition(table: String): Map[String, Int] = {
      val loc = spark.sql(s"DESCRIBE FORMATTED $table").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val dir = new java.io.File(new java.net.URI(loc))
      dir.listFiles().filter(_.getName.startsWith("ym=")).map { p =>
        p.getName -> p.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    }
    val before = filesPerPartition(Layout.monthPartitionedLineitem(spark, sf0001))
    val after = filesPerPartition(Layout.compactedLineitem(spark, sf0001))
    assert(before.keySet == after.keySet)
    assert(before.values.max > 1, s"ingest wrote no small files: $before")
    assert(after.values.forall(_ == 1), s"compaction left multiple files: $after")
    // byte-level data equality across the rewrite
    val a = spark.table(Layout.monthPartitionedLineitem(spark, sf0001))
    val b = spark.table(Layout.compactedLineitem(spark, sf0001))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("agg_bitmap_distinct: popcount NDV equals countDistinct; bitmaps OR-merge") {
    val got = RelationalQueries.queries("agg_bitmap_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = graft.Tables.events(spark, sf0001)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // merge property: OR of two disjoint halves' bitmaps == the whole's
    // (the shard/day rollup identity — exact, unlike HLL's estimate)
    def bitmaps(f: org.apache.spark.sql.Column) =
      graft.Tables.events(spark, sf0001).filter(f)
        .groupBy(col("event_type"), expr("user_id div 32").as("bkt"))
        .agg(expr("bit_or(shiftleft(1L, int(user_id % 32)))").as("bits"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (ha, hb) = (bitmaps(col("event_id") % 2 === 0),
      bitmaps(col("event_id") % 2 =!= 0))
    val whole = bitmaps(lit(true))
    assert(whole.keySet == (ha.keySet ++ hb.keySet))
    whole.foreach { case (k, bits) =>
      assert(bits == (ha.getOrElse(k, 0L) | hb.getOrElse(k, 0L)), s"$k") }
  }

  test("agg_mode: scalar replay with the explicit (count desc, value asc) ties") {
    val got = RelationalQueries.queries("agg_mode")(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val counts = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"), col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = counts.groupBy(_._1._1).map { case (st, m) =>
      val (k, n) = m.minBy { case ((_, p), n) => (-n, p) }
      st -> (k._2, n)
    }
    assert(got == want)
  }

  test("quantile_exact: two-pass pick equals the sorted-order statistic") {
    val rows =
      RelationalQueries.queries("quantile_exact")(spark, sf0001).collect()
    val cents = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.map(_.getString(0)).toSet == cents.keySet)
    rows.foreach { r =>
      val t = r.getString(0)
      val cs = cents(t)
      val n = cs.length.toLong
      // nearest-rank definition straight off the fully sorted values —
      // the thing the two-pass plan must reproduce without ever sorting
      // more than one bin
      def nr(q: Int): Long = cs((((n * q + 99) / 100) - 1).toInt)
      assert(r.getLong(1) == n, t)
      assert(r.getLong(2) == nr(50), s"$t p50")
      assert(r.getLong(3) == nr(90), s"$t p90")
    }
  }

  test("winsorize: scalar replay of edges + clamp; clip mass stays within grid slack") {
    val rows = RelationalQueries.queries("winsorize")(spark, sf0001).collect()
    val cents = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.map(_.getString(0)).toSet == cents.keySet)
    rows.foreach { r =>
      val t = r.getString(0)
      val cs = cents(t)
      val n = cs.length.toLong
      // nearest-rank edges on the 100-cent grid, exactly as the query
      val hist = cs.groupBy(c => c / 100 * 100).view.mapValues(_.length.toLong)
        .toMap.toSeq.sortBy(_._1)
      def edge(q: Int): Long = {
        var cum = 0L
        hist.collectFirst {
          case (lo, cnt) if { cum += cnt; cum * 100 >= n * q } => lo
        }.get
      }
      val (lo, hi) = (edge(5), edge(95))
      assert(r.getLong(1) == n && r.getLong(2) == lo && r.getLong(3) == hi, t)
      assert(r.getLong(4) == cs.count(_ < lo).toLong, s"$t n_clip_lo")
      assert(r.getLong(5) == cs.count(_ > hi).toLong, s"$t n_clip_hi")
      val wins = cs.map(c => math.min(math.max(c, lo), hi))
      assert(r.getLong(6) == wins.sum && r.getLong(7) == wins.sum / n, t)
      // nearest-rank on a grid clips at most q% + one bin's worth of mass
      val binMass = hist.map(_._2).max
      assert(r.getLong(4) <= n * 5 / 100 + binMass, s"$t lo clip mass")
      assert(r.getLong(5) <= n * 5 / 100 + binMass, s"$t hi clip mass")
    }
  }
}
