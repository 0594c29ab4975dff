package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine expression matches hand computation") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.6f, 0.8f))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 0.6) < 1e-6)
    val self = df.select(Similarity.cosine(col("a"), col("a"))).head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("cosineFast (native codegen expr) is bit-identical to the HOF spec") {
    val e = Similarity.embWithNearDups(spark, sf0001).limit(30)
    val a = e.select(col("vec_id").as("ia"), col("emb").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("emb").as("eb"))
    val rows = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(Similarity.cosine(col("ea"), col("eb")).as("spec"),
        Similarity.cosineFast(col("ea"), col("eb")).as("fast"))
      .collect()
    assert(rows.length == 30 * 29 / 2)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact ==
  }

  test("quantizeI8: parity with the HOF spec, exact tie/zero/range edges") {
    // corpus parity vs the interpreted Column form (Spark round(col, 0)
    // is BigDecimal HALF_UP = away from zero on exact decimals; the
    // corpus has no binary-representable .5 ties, so forms must agree)
    val e = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val specScale = array_max(transform(col("emb"), x => abs(x)))
    val spec = e.select(col("vec_id"), specScale.as("s"),
      when(specScale === 0.0, transform(col("emb"), _ => lit(0)))
        .otherwise(transform(col("emb"),
          x => round(x * 127.0 / specScale).cast("int"))).as("q"))
    val fast = e.select(col("vec_id"),
      QuantExprs.quantizeI8(col("emb")).as("qq"))
      .select(col("vec_id"), col("qq.scale").as("fs"), col("qq.qvec").as("fq"),
        col("qq.dim").as("fd"))
    val joined = spec.join(fast, Seq("vec_id"))
    assert(joined.filter(col("s") =!= col("fs") ||
      col("q") =!= col("fq") || col("fd") =!= size(col("q"))).count() == 0L)

    // roundAway mirrors C/DuckDB round(double): ties away from zero,
    // detected exactly (no |x|+0.5 half-ulp artifact)
    assert(QuantizeI8Expr.roundAway(2.5) == 3.0)
    assert(QuantizeI8Expr.roundAway(-2.5) == -3.0)
    assert(QuantizeI8Expr.roundAway(0.49999999999999994) == 0.0)
    assert(QuantizeI8Expr.roundAway(-0.49999999999999994) == -0.0)

    // crafted vectors: exact .5 tie, zero vector, max-abs lands on ±127
    val crafted = Seq(
      (1L, Seq(127.0, 2.5, -2.5)),   // scale 127: q = (127, 3, -3)
      (2L, Seq(0.0, 0.0)),           // zero vector -> zeros, scale 0
      (3L, Seq(-64.0, 32.0))         // max |x| negative -> q0 = -127
    ).toDF("vec_id", "emb")
    val rows = crafted.select(col("vec_id"),
      QuantExprs.quantizeI8(col("emb")).as("q")).orderBy(col("vec_id"))
      .select(col("q.scale"), col("q.qvec")).collect()
    assert(rows(0).getDouble(0) == 127.0)
    assert(rows(0).getSeq[Int](1) == Seq(127, 3, -3))
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getSeq[Int](1) == Seq(0, 0))
    assert(rows(2).getSeq[Int](1) == Seq(-127, 64))
  }

  test("dense kernels refuse corpus-scale driver materialization") {
    val big = spark.range(0, VectorKernels.maxBroadcastRows + 1L)
      .select(col("id").as("vec_id"), array(lit(1.0), lit(2.0)).as("emb"))
    val ex = intercept[IllegalArgumentException] {
      VectorKernels.cosinePairs(big, 0.9)
    }
    assert(ex.getMessage.contains("LSH"))
  }

  test("brute-force knn returns 3 ranked neighbors per query") {
    val out = Similarity.queries("knn_brute")(spark, sf0001).collect()
    assert(out.length == 15) // 5 queries × 3
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
      // cosine non-increasing with rank
      val cos = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k search: recall@1 = 1 on planted near-dups, cosines exact") {
    val e = Similarity.embWithNearDups(spark, sf0001)
    // exact top-3 over the SAME corpus (dense kernel; same tiebreak)
    val exact = VectorKernels.topK(e, (0L until 5L).toSet, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // the float/adaptive production path (the driver's knn_lsh entry is
    // now the integer-grid FixedPointAnn.knnLshFp; this spec pins the
    // recall contract of the adaptive variant it mirrors)
    val lsh = Similarity.knnLsh(Similarity.embWithNearDupsCached(spark, sf0001),
      maxQid = 5, k = 3, n = Similarity.embWithNearDupsCount(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // rank 1 is the planted near-dup at cos ≈ 0.996: the srpParams miss
    // bound (≤ 1e-8 at τ=0.99) makes finding it effectively certain
    val exactR1 = exact.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    val lshR1 = lsh.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    assert(lshR1 == exactR1, s"rank-1 recall broken: $lshR1 vs $exactR1")
    // any (qid, nid) both return must carry the identical 6-dp cosine —
    // LSH only prunes candidates, it never approximates the score
    val exactCos = exact.map(t => (t._1, t._2) -> t._4).toMap
    lsh.foreach { case (q, n, _, c) =>
      exactCos.get((q, n)).foreach(ec => assert(ec == c, s"cos drift ($q,$n)"))
    }
    // shape: at most k rows per query, ranks contiguous from 1
    lsh.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"ranks for $q")
    }
  }

  test("srpBands (native codegen expr) band 0 is bit-identical to srpKey spec") {
    val e = Similarity.embWithNearDups(spark, sf0001)
    val mismatches = e.select(
      Similarity.srpKey(col("emb"), 8).as("spec"),
      element_at(graft.dedup.SignatureExprs.srpBands(col("emb"), 1, 8), 1)
        .as("fast"))
      .filter(col("spec") =!= col("fast")).count()
    assert(mismatches == 0L)
    // bands are independent bit blocks: with 2×8 bands, band 0 still
    // equals the 8-plane spec key (planes 0..7 at bits 0..7)
    val m2 = e.select(Similarity.srpKey(col("emb"), 8).as("spec"),
      element_at(graft.dedup.SignatureExprs.srpBands(col("emb"), 2, 8), 1)
        .as("fast"))
      .filter(col("spec") =!= col("fast")).count()
    assert(m2 == 0L)
  }

  test("distributed embCosPairs equals the dense all-pairs kernel") {
    val e = Similarity.embWithNearDups(spark, sf0001)
    val dense = VectorKernels.cosinePairs(e, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dist = Similarity.embCosPairs(e, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(dist == dense) // same pairs AND bit-identical cos6 values
  }

  test("fpPruneDist: conservative tail bound, monotone in tau") {
    // tau = 1 ⇒ a true pair's fingerprints are identical: keep only d=0
    assert(Similarity.fpPruneDist(1.0) == 0)
    // the dedup_embcos config: threshold far above the τ-pair hamming
    // mean (64·acos(.99)/π ≈ 2.9) yet far below a junk pair's (~32)
    val h99 = Similarity.fpPruneDist(0.99)
    assert(h99 >= 10 && h99 <= 40, s"h99=$h99")
    // exact-tail check: P(Binom(64, p) > h) ≤ 1e-11 ≤ P(> h-1)
    val p = math.acos(0.99) / math.Pi
    def tail(h: Int): Double = {
      val logC = (k: Int) => (1 to k).map(i =>
        math.log(64.0 - i + 1) - math.log(i.toDouble)).sum
      ((h + 1) to 64).map(k => math.exp(
        logC(k) + k * math.log(p) + (64 - k) * math.log1p(-p))).sum
    }
    assert(tail(h99) <= 1e-11 && tail(h99 - 1) > 1e-11, s"h99=$h99")
    // lower tau ⇒ noisier fingerprints ⇒ looser (larger) threshold
    assert(Similarity.fpPruneDist(0.95) >= h99)
  }

  test("srpParams: bits scales with log2(n), bands bounds the miss rate") {
    val (bandsSmall, bitsSmall) = Similarity.srpParams(1000L, 0.99)
    assert(bitsSmall == 9 && bandsSmall == 18) // 2-doc bucket target
    // the sf0.01 query config (n = 400 augmented): the 8-bit floor binds
    val (bandsGate, bitsGate) = Similarity.srpParams(400L, 0.99)
    assert(bitsGate == 8 && bandsGate == 16)
    val (bandsBig, bitsBig) = Similarity.srpParams(100000L, 0.99)
    assert(bitsBig > bitsSmall)   // buckets stay small as n grows
    assert(bandsBig >= bandsSmall) // recall bound maintained
    // miss bound holds at the query's tau for both configs
    def miss(bands: Int, bits: Int): Double = {
      val p = 1.0 - math.acos(0.99) / math.Pi
      math.pow(1.0 - math.pow(p, bits), bands)
    }
    assert(miss(bandsSmall, bitsSmall) <= 1e-8)
    assert(miss(bandsBig, bitsBig) <= 1e-8)
    // low tau wants hundreds of bands (tau=0.8/bits=16 → ~712) — the cap
    // bounds per-row key fan-out in lshCandidates to MaxSrpBands
    for (tau <- Seq(0.8, 0.9, 0.95)) {
      val (bands, _) = Similarity.srpParams(100000L, tau)
      assert(bands <= Similarity.MaxSrpBands, s"tau=$tau bands=$bands")
    }
  }

  test("IVF knn: recall vs brute force, candidates only from probed cells") {
    val brute = Similarity.queries("knn_brute")(spark, sf0001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.knnIvf(Ivf.embFloat(spark, sf0001), (0L until 5L).toSet,
        k = 3, nlist = 16, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size == 15) // 5 queries × 3 (cells are never empty here)
    val recall = (ivf intersect brute).size.toDouble / brute.size
    // deterministic pipeline (fixed init, no RNG) → stable; random-uniform
    // vectors are a worst case for IVF, bound loosely
    assert(recall >= 0.4, s"IVF recall@3 = $recall")
  }

  test("IVF: cell-partitioned persisted layout prunes probes at file level") {
    // The Ivf scaladoc claims assign output "you'd persist
    // partitioned-by-cell so probes prune at the file level" — prove it.
    val e = Similarity.embWithNearDups(spark, sf0001)
    val sample = e.orderBy("vec_id").limit(256)
      .select("emb").as[Seq[Double]].collect().map(_.toArray)
    val model = Ivf.train(sample, 8, 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cells").toString
    graft.sources.Sources.writePartitioned(Ivf.assign(e, model), dir, "cell")

    val probed = Seq(0, 1)
    val back = spark.read.parquet(dir).filter(col("cell").isin(probed: _*))
    val expected = Ivf.assign(e, model).filter(col("cell").isin(probed: _*)).count()
    // collect() (not count()) so the metrics below belong to THIS plan
    assert(back.collect().length.toLong == expected)

    def filesUnder(cells: Seq[Int]): Int = cells.map { c =>
      val d = new java.io.File(s"$dir/cell=$c")
      if (d.exists()) d.listFiles().count(_.getName.endsWith(".parquet")) else 0
    }.sum
    val allCells = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName.stripPrefix("cell=").toInt).toSeq
    assert(allCells.size > probed.size, s"degenerate cell layout: $allCells")

    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = back.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail(s"no FileSourceScanExec in:\n$plan"))
    // the probe predicate landed in the partition filters, not a row filter
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    // file-level proof: the scan touched only the probed cells' files
    assert(scan.metrics("numFiles").value == filesUnder(probed).toLong,
      s"numFiles=${scan.metrics("numFiles").value} probedFiles=${filesUnder(probed)}")
    assert(filesUnder(probed) < filesUnder(allCells))
  }

  test("rolling hash is order-sensitive; fingerprint query deterministic") {
    val df = Seq("a b c", "c b a").toDF("text")
    val h = df.select(graft.text.TextAnalysis.rollingHash(col("text"))).collect()
    assert(h(0).getLong(0) != h(1).getLong(0))
    val fp1 = graft.text.TextAnalysis.queries("text_fingerprint")(spark, sf0001).collect()
    val fp2 = graft.text.TextAnalysis.queries("text_fingerprint")(spark, sf0001).collect()
    assert(fp1.toSeq == fp2.toSeq)
  }

  test("emb_hard_negatives: labels differ and top-1 matches the dense argmax") {
    val got = Similarity.queries("emb_hard_negatives")(spark, sf0001).collect()
    assert(got.length == 8)
    val embs = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (r <- got) {
      val (qid, qlabel) = (r.getAs[Long]("qid"), r.getAs[Int]("qlabel"))
      assert(r.getAs[Int]("nlabel") != qlabel, s"anchor $qid: label not hard")
      val q = embs.find(_._1 == qid).get
      val best = embs.filter(_._2 != qlabel)
        .map(e => (e._1, cos(q._3, e._3)))
        .maxBy { case (id, c) => (c, -id.toDouble) }
      assert(r.getAs[Long]("nid") == best._1,
        s"anchor $qid: got ${r.getAs[Long]("nid")} want ${best._1}")
      assert(math.abs(r.getAs[Double]("cos6") - best._2) < 1e-5)
    }
  }
}
