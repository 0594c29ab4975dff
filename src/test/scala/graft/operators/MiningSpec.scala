package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {

  test("basket_pairs: scalar replay of cap + pair counts + support agrees") {
    val got = Mining.queries("basket_pairs")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val items = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = collection.mutable.Map.empty[(Long, Long), Long]
    items.groupBy(_._1).values.foreach { basket =>
      val capped = basket.map(_._2).sorted.take(8)
      for (i <- capped.indices; j <- i + 1 until capped.length)
        counts((capped(i), capped(j))) =
          counts.getOrElse((capped(i), capped(j)), 0L) + 1L
    }
    val expect = counts.filter(_._2 >= 2).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("graph_triangles: brute-force census agrees and orientation bounds fanout") {
    val r = Mining.queries("graph_triangles")(spark, sf0001).head()
    val edges = Mining.pairsCached(spark, sf0001)
      .select(col("part_a"), col("part_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edgeSet = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // brute-force triangles over the (small) sf0.001 edge set
    val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var tri = 0L
    for ((a, b) <- edges; c <- adj(a) if c > b && adj(b).contains(c)) tri += 1
    assert(r.getLong(0) == nodes.length.toLong, "n_nodes")
    assert(r.getLong(1) == edges.length.toLong, "n_edges")
    assert(r.getLong(3) == tri, s"n_triangles: got ${r.getLong(3)}, want $tri")
    assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2), "closure_ppm")

    // the degree-orientation guarantee: if outdeg(v) = t, every
    // out-neighbor has degree >= deg(v) >= t, so t <= sqrt(2|E|) —
    // replay the orientation and assert the hub bound held
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val outdeg = edges.groupBy { case (u, v) =>
      if (deg(u) < deg(v) || (deg(u) == deg(v) && u < v)) u else v
    }.view.mapValues(_.length).toMap
    val bound = math.sqrt(2.0 * edges.length)
    assert(outdeg.values.max <= bound,
      s"orientation failed to bound fanout: ${outdeg.values.max} > $bound")
    val wedges = outdeg.values.map(t => t.toLong * (t - 1) / 2).sum
    assert(r.getLong(2) == wedges, "n_wedges")
    graft.operators.Mining.clearCache()
  }

  test("graph_pagerank: scalar replay of both fixed-point iterations agrees") {
    val got = Mining.queries("graph_pagerank")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Mining.pairsCached(spark, sf0001)
      .select(col("part_a"), col("part_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val ed = e.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
    val od = ed.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = od.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 2) {
      val in = collection.mutable.Map.empty[Long, Long]
      ed.foreach { case (src, dst) =>
        in(dst) = in.getOrElse(dst, 0L) + rank(src) / od(src)
      }
      rank = od.keys.map(n =>
        n -> (150000L + 850000L * in.getOrElse(n, 0L) / 1000000L)).toMap
    }
    assert(got == rank && got.nonEmpty)
    // damping leaks mass through truncation, never creates it
    assert(got.values.sum <= 1000000L * got.size)
    assert(got.values.min >= 150000L)
    graft.operators.Mining.clearCache()
  }

  // ---- pageRankConverged (round-13): the delta-based production path
  // behind the fixed-unroll oracle query -------------------------------

  /** Brute reference for the integer micro-unit damped power step. */
  private def brutePr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val od = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = od.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (src, dst) =>
        in(dst) = in.getOrElse(dst, 0L) + rank(src) / od(src)
      }
      rank = od.keys.map(n =>
        n -> (150000L + 850000L * in.getOrElse(n, 0L) / 1000000L)).toMap
    }
    rank
  }

  private def edgesDf(edges: Seq[(Long, Long)]) =
    spark.createDataFrame(edges).toDF("src", "dst")

  test("pageRankConverged: early exit binds on a fast-converging fixture") {
    // K3 (both directions): perfectly symmetric — every node keeps rank
    // 10^6 after round 1, so delta hits 0 immediately and the loop
    // exits WAY before the cap, even at eps = 0
    val k3 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
    val (ranks, iters, delta) =
      Mining.pageRankConverged(edgesDf(k3), epsMicro = 0L, maxIters = 10)
    assert(iters == 1, s"early exit should bind at round 1, ran $iters")
    assert(delta == 0L)
    assert(ranks.collect().map(_.getLong(1)).toSeq == Seq.fill(3)(1000000L))
  }

  test("pageRankConverged: the cap binds on a slow-converging fixture") {
    // star (hub 0, leaves 1..4, both directions): rank mass oscillates
    // hub<->leaves and decays only ~0.85^2 per two rounds — at eps = 0
    // it is still moving after 4 rounds, so the cap must bind
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val (ranks, iters, delta) =
      Mining.pageRankConverged(edgesDf(star), epsMicro = 0L, maxIters = 4)
    assert(iters == 4, s"cap should bind, ran $iters")
    assert(delta > 0L, "still moving at the cap")
    // iterate-k agreement: capped run == brute reference at k rounds
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brutePr(star, 4))
  }

  test("pageRankConverged: converged ranks are a fixed point of the step") {
    // asymmetric graph that DOES settle: eps large enough to bind before
    // the cap; one more brute round from the converged vector must move
    // no node by more than eps
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val eps = 2000L
    val (ranks, iters, delta) =
      Mining.pageRankConverged(edgesDf(star), epsMicro = eps, maxIters = 50)
    assert(iters < 50, s"eps exit should bind before the cap, ran $iters")
    assert(delta <= eps)
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = brutePr(star, iters)
    assert(got == again, "converged vector must equal brute at the same round")
  }

  test("covisitation: scalar replay of gap islands + capped pair counts agrees") {
    val got = Mining.queries("covisitation")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
        col("event_id"),
        expr("try_cast(regexp_extract(props, '(\\\\d+)', 1) AS BIGINT)")
          .as("item"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = collection.mutable.Map.empty[(Long, Long), Long]
    var multiSession = false
    ev.groupBy(_._1).values.foreach { rows =>
      // replay the islands: sort by (ts, event_id), split on gap > 30 min
      val ordered = rows.sortBy(r => (r._2, r._3))
      val sessions = collection.mutable.ArrayBuffer(
        collection.mutable.ArrayBuffer.empty[Long])
      var prev = Long.MinValue
      ordered.foreach { r =>
        if (prev != Long.MinValue && r._2 - prev > 1800L)
          sessions += collection.mutable.ArrayBuffer.empty[Long]
        sessions.last += r._4
        prev = r._2
      }
      if (sessions.length > 1) multiSession = true
      sessions.foreach { items =>
        val capped = items.distinct.sorted.take(8)
        for (i <- capped.indices; j <- i + 1 until capped.length)
          counts((capped(i), capped(j))) =
            counts.getOrElse((capped(i), capped(j)), 0L) + 1L
      }
    }
    assert(multiSession, "fixture must actually split a user into sessions")
    val expect = counts.filter(_._2 >= 2).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("the per-basket cap bounds fanout: no basket contributes more than C(8,2)") {
    // replay the pre-cap pipeline and assert the biggest basket's pair
    // contribution is exactly C(min(B, 8), 2) — the straggler bound
    val sizes = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey")).count().collect().map(_.getLong(1))
    assert(sizes.exists(_ > 8), "fixture must contain a cap-binding basket")
    val maxPairs = sizes.map(b => math.min(b, 8L)).map(b => b * (b - 1) / 2).max
    assert(maxPairs <= 28, s"cap failed: $maxPairs pairs from one basket")
  }

  test("assoc_rules: conf/lift replay from the row's own counts; determinism") {
    val rows = Mining.queries("assoc_rules")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // N = capped-basket census, recomputed independently
    val it = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nBaskets = it.select("l_orderkey").distinct().count()
    for (r <- rows) {
      val (np, na, nc) = (r.getAs[Long]("n_pair"), r.getAs[Long]("n_ante"),
        r.getAs[Long]("n_cons"))
      assert(r.getAs[Long]("conf_ppm") == np * 1000000L / na)
      assert(r.getAs[Long]("conf_ppm") <= 1000000L)
      assert(np <= na && np <= nc)
      val lift = (BigInt(np) * nBaskets * 1000000) / (BigInt(na) * nc)
      assert(BigInt(r.getAs[Long]("lift_ppm")) == lift,
        s"lift mismatch for ${r.getAs[Long]("antecedent")}->${r.getAs[Long]("consequent")}")
    }
    // full integer ordering => stable top-20 under re-run
    val again = Mining.queries("assoc_rules")(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("attribution_last_touch: scalar replay of the per-user walk") {
    val got = Mining.queries("attribution_last_touch")(spark, sf0001)
      .collect().map(r => r.getAs[String]("attributed_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_cents"))).toMap
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
    val replay = scala.collection.mutable.Map[String, (Long, Long)]()
    ev.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      var lastSrc: String = "direct"
      rs.sortBy(r => { val t = r.getAs[java.sql.Timestamp]("ts")
          (t.getTime, t.getNanos, r.getAs[Long]("event_id")) }).foreach { r =>
        val t = r.getAs[String]("event_type")
        if (t == "purchase") {
          val (n, c) = replay.getOrElse(lastSrc, (0L, 0L))
          replay(lastSrc) = (n + 1, c + r.getAs[Long]("cents"))
        } else lastSrc = t
      }
    }
    assert(got == replay.toMap, s"got=$got replay=$replay")
  }

  test("event_paths: trigram census replay from a scalar session walk") {
    val got = Mining.queries("event_paths")(spark, sf0001).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n"))
    assert(got.nonEmpty && got.length <= 20)
    // replay: sessionize per user at 1800s gaps, slide a 3-window
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
        col("event_id"), col("event_type")).collect()
    val counts = scala.collection.mutable.Map[String, Long]()
    ev.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("ts_s"), r.getAs[Long]("event_id")))
      var sessions = List[List[String]]()
      var cur = List[String]()
      var prev = Long.MinValue
      for (r <- sorted) {
        val t = r.getAs[Long]("ts_s")
        if (prev != Long.MinValue && t - prev > 1800L) {
          sessions ::= cur.reverse; cur = Nil
        }
        cur ::= r.getAs[String]("event_type"); prev = t
      }
      sessions ::= cur.reverse
      for (sess <- sessions; tri <- sess.sliding(3) if tri.length == 3) {
        val k = tri.mkString(">")
        counts(k) = counts.getOrElse(k, 0L) + 1
      }
    }
    val expectTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(got.length)
    assert(got.toSeq == expectTop, s"got=${got.toSeq}\nexp=$expectTop")
  }

  test("attribution_linear: scalar per-user walk replay + conservation bound") {
    val got = Mining.queries("attribution_linear")(spark, sf0001)
      .collect().map(r => r.getAs[String]("attributed_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("credit_ucents"))).toMap
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
    // the quadratic walk the suffix-sum formulation avoids: on each
    // purchase, add cents·10⁶ div k to every preceding touch
    val credit = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val nTouch = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    var directN = 0L; var directC = 0L
    var totalUcents = 0L; var maxLoss = 0L
    ev.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val touches = scala.collection.mutable.ArrayBuffer[String]()
      rs.sortBy(r => { val t = r.getAs[java.sql.Timestamp]("ts")
          (t.getTime, t.getNanos, r.getAs[Long]("event_id")) }).foreach { r =>
        if (r.getAs[String]("event_type") == "purchase") {
          val uc = r.getAs[Long]("cents") * 1000000L
          totalUcents += uc
          if (touches.isEmpty) { directN += 1; directC += uc }
          else {
            val share = uc / touches.length
            touches.foreach(t => credit(t) += share)
            maxLoss += touches.length // truncation < 1 ucent per touch
          }
        } else {
          nTouch(r.getAs[String]("event_type")) += 1
          touches += r.getAs[String]("event_type")
        }
      }
    }
    for ((t, (n, c)) <- got if t != "direct") {
      assert(n == nTouch(t), s"$t n_events")
      assert(c == credit(t), s"$t credit")
    }
    if (directN > 0) assert(got("direct") == ((directN, directC)), "direct bucket")
    else assert(!got.contains("direct"), "phantom direct bucket")
    // conservation: credited mass + truncation loss recovers the total
    val credited = got.values.map(_._2).sum
    assert(credited <= totalUcents && totalUcents - credited < maxLoss.max(1L),
      s"credited=$credited total=$totalUcents loss bound=$maxLoss")
  }

  test("attribution_linear: negative cents (refund) truncate toward zero") {
    import spark.implicits._
    // a -0.01 refund split across 3 touches forces the rounding-mode
    // divergence: trunc-toward-zero gives -333333 per touch, floor
    // gives -333334 — the sign-explicit form must yield the former on
    // BOTH engines (the oracle SQL mirrors the same CASE)
    val dir = java.nio.file.Files.createTempDirectory("attr_neg").toString
    def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")
    Seq(
      (1L, t(1), 1L, "view", 0.0, ""),
      (2L, t(2), 1L, "click", 0.0, ""),
      (3L, t(3), 1L, "view", 0.0, ""),
      (4L, t(4), 1L, "purchase", -0.01, ""),   // refund, k = 3
      (5L, t(1), 2L, "purchase", -1.00, ""))   // zero-touch refund
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Mining.queries("attribution_linear")(spark, dir)
      .collect().map(r => r.getAs[String]("attributed_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("credit_ucents"))).toMap
    assert(got("view") == ((2L, -666666L)), s"view: ${got.get("view")}")
    assert(got("click") == ((1L, -333333L)), s"click: ${got.get("click")}")
    assert(got("direct") == ((1L, -100000000L)), s"direct: ${got.get("direct")}")
  }
}
