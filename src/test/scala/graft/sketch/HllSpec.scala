package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {

  private def synth(groups: Map[String, Int]): DataFrame = {
    // group g sees user ids offset*1000+1 .. +n, each id twice (real
    // streams repeat values; the sketch must not double-count)
    val rows = groups.toSeq.sortBy(_._1).zipWithIndex.flatMap {
      case ((g, n), off) =>
        (1 to n).flatMap(i => Seq((g, (off * 1000 + i).toLong),
          (g, (off * 1000 + i).toLong)))
    }
    spark.createDataFrame(rows).toDF("grp", "user_id")
  }

  private def est(df: DataFrame): Map[String, (Long, Long, Long)] =
    Hll.estimate(Hll.regRho(df, col("user_id")), "grp").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("raw regime: estimates track exact within HLL error at m=32") {
    // 1.04/sqrt(32) ~ 18% standard error; assert 3 sigma
    val groups = Map("a" -> 150, "b" -> 400, "c" -> 1000)
    est(synth(groups)).foreach { case (g, (_, _, e)) =>
      val n = groups(g).toDouble
      assert(math.abs(e - n) / n < 0.55, s"$g: est $e vs exact $n")
    }
  }

  test("small range: linear counting branch engages and is tighter") {
    val groups = Map("s" -> 12)
    val (v, raw, e) = est(synth(groups))("s")
    assert(v > 0 && raw <= 80, "expected the LC branch to engage")
    assert(math.abs(e - 12.0) / 12.0 < 0.5, s"LC est $e vs 12")
  }

  test("duplicates never move the estimate (distinct semantics)") {
    val once = spark.createDataFrame(
      (1 to 300).map(i => ("g", i.toLong))).toDF("grp", "user_id")
    val thrice = once.union(once).union(once)
    assert(est(once) == est(thrice))
  }

  test("registers max-merge: partitioning-independent, shards combine losslessly") {
    val df = synth(Map("a" -> 500, "b" -> 50))
    assert(est(df) == est(df.repartition(7)))
    // shard-merge identity: max over per-shard register maxes == whole
    val regs = Hll.regRho(df, col("user_id"))
    val whole = regs.groupBy(col("grp"), col("reg"))
      .agg(max(col("rho")).as("mj")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shards = Seq(regs.filter(col("user_id") % 2 === 0),
      regs.filter(col("user_id") % 2 =!= 0))
      .map(_.groupBy(col("grp"), col("reg"))
        .agg(max(col("rho")).as("mj")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap)
    val merged = (shards(0).keySet ++ shards(1).keySet).map { k =>
      k -> math.max(shards(0).getOrElse(k, 0L), shards(1).getOrElse(k, 0L))
    }.toMap
    assert(merged == whole)
  }

  test("intersect: union-by-register-max equals the sketch of the unioned data") {
    // A = 1..100, B = 51..150 (overlap 50), C = 201..300 (disjoint)
    def users(g: String, r: Range): Seq[(String, Long)] =
      r.map(i => (g, i.toLong))
    val df = spark.createDataFrame(
      users("A", 1 to 100) ++ users("B", 51 to 150) ++ users("C", 201 to 300))
      .toDF("event_type", "user_id")
    val regs = Hll.regRho(df, col("user_id"))
      .groupBy(col("event_type"), col("reg"))
      .agg(max(col("rho")).as("mj")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // merged(A,B) register-max == registers of the concatenated A∪B data
    def merged(x: String, y: String) =
      (regs.keySet.filter(k => k._1 == x || k._1 == y).map(_._2)).map { reg =>
        reg -> math.max(regs.getOrElse((x, reg), 0L), regs.getOrElse((y, reg), 0L))
      }.toMap
    val abData = spark.createDataFrame(
      (users("U", 1 to 100) ++ users("U", 51 to 150))).toDF("event_type", "user_id")
    val abRegs = Hll.regRho(abData, col("user_id"))
      .groupBy(col("event_type"), col("reg"))
      .agg(max(col("rho")).as("mj")).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(merged("A", "B") == abRegs,
      "register-max merge must equal the union sketch bit-for-bit")
    // inclusion-exclusion sanity on the planted overlaps (the end-to-end
    // pair query is oracle-checked by the driver; here the algebra is
    // asserted directly): the 50%-overlap pair must estimate well above
    // the disjoint pair, and near the true 50
    def estOf(rs: Map[Long, Long]): Long = {
      val touched = rs.size
      val s = rs.values.map(m => 1L << (20 - m).toInt).sum +
        (32L - touched) * 1048576L
      val raw = (697000L * 1024L * 1048576L) / (1000000L * s)
      if (touched < 32 && raw <= 80)
        Seq(111, 89, 76, 67, 59, 54, 49, 44, 41, 37, 34, 31, 29, 26, 24, 22,
          20, 18, 17, 15, 13, 12, 11, 9, 8, 7, 5, 4, 3, 2, 1, 0)(31 - touched)
      else raw
    }
    def single(g: String) = estOf(
      regs.collect { case ((gg, reg), mj) if gg == g => reg -> mj })
    val interAB = single("A") + single("B") - estOf(merged("A", "B"))
    val interAC = single("A") + single("C") - estOf(merged("A", "C"))
    assert(interAB > interAC,
      s"50%-overlap pair ($interAB) must estimate above the disjoint pair ($interAC)")
    assert(math.abs(interAB - 50.0) / 50.0 < 1.0,
      s"overlap estimate $interAB vs true 50 (3-sigma-ish at m=32)")
  }

  test("h == 0 edge: the rho cap engages instead of crashing") {
    // user_id = P1 folds to 0 -> h = 0 -> w = 0 -> rho = cap
    val df = spark.createDataFrame(Seq(("z", Hll.P1), ("z", 5L)))
      .toDF("grp", "user_id")
    val regs = Hll.regRho(df, col("user_id"))
      .select(col("user_id"), col("reg"), col("rho")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(regs(Hll.P1) == ((0L, 20L)))
  }

  test("keys beyond the old 1e6 fold stay distinguishable (domain cap widened)") {
    // 5000 sequential ids ABOVE 1e6: under the old % 1000003 fold these
    // collapsed onto the same ~1e6 residue ring as ids below it; the
    // widened moduli must keep the estimate tracking exact
    val df = spark.createDataFrame(
      (1 to 5000).map(i => ("big", 1000003L * 3 + i.toLong)))
      .toDF("grp", "user_id")
    val (_, _, e) = est(df)("big")
    assert(math.abs(e - 5000.0) / 5000.0 < 0.55, s"est $e vs 5000")
  }

  test("size hint: keys past 2^31 stay distinguishable under the wide mix") {
    // 400 users, each contributing {u, u+P1} — 800 true distinct keys
    // spanning a > 2^31 domain. The folded narrow mix aliases every
    // pair (u ≡ u+P1 mod P1) and must read ~400; the two-word mix the
    // size hint selects must read ~800. Bounds are the suite's 3-sigma
    // convention at m=32 (±55%), with the wide>narrow gap asserted
    // directly (the aliasing itself).
    val rows = (1 to 400).map(i => ("w", 7919L * i))
      .flatMap { case (g, u) => Seq((g, u), (g, u + Hll.P1)) }
    val df = spark.createDataFrame(rows).toDF("grp", "user_id")
    def estWith(dom: Long): Long =
      Hll.estimate(Hll.regRho(df, col("user_id"), expectedDomain = dom), "grp")
        .collect().head.getLong(3)
    val wide = estWith(1L << 42)
    val narrow = estWith(1L << 20)
    assert(math.abs(wide - 800.0) / 800.0 < 0.55,
      s"wide-mix est $wide vs 800 true keys")
    assert(math.abs(narrow - 400.0) / 400.0 < 0.55,
      s"narrow-mix est $narrow should collapse to ~400 aliased keys")
    assert(wide > narrow, s"wide $wide must resolve what narrow $narrow aliases")
  }

  test("sketch_hll_wide on the corpus tracks the doubled exact count") {
    val out = Hll.queries("sketch_hll_wide")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, e) = (r.getLong(1), r.getLong(4))
      assert(math.abs(e - exact.toDouble) / exact < 0.55,
        s"${r.getString(0)}: $e vs $exact")
    }
  }

  test("sketch_hll on the corpus matches a scalar replay of the mix") {
    val out = Hll.queries("sketch_hll")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, e) = (r.getLong(1), r.getLong(4))
      assert(math.abs(e - exact.toDouble) / exact < 0.55,
        s"${r.getString(0)}: $e vs $exact")
    }
  }

  test("size hint past 2^62 fails loudly (mixWide key-domain ceiling)") {
    val df = spark.createDataFrame(Seq(Tuple1(1L), Tuple1(2L))).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Hll.regRho(df, col("id"), expectedDomain = (1L << 62) + 1)
    }
    assert(e.getMessage.contains("2^62"), e.getMessage)
    // the boundary itself is legal, and the variant switch is visible
    Hll.regRho(df, col("id"), expectedDomain = 1L << 62)
    assert(Hll.mixVariant(1L << 20) == "narrow")
    assert(Hll.mixVariant(1L << 42) == "wide")
  }
}
