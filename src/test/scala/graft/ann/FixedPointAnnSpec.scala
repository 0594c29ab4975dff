package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedPointAnnSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference of the quantized corpus: vec_id → floor(x·2¹⁰). */
  private def quantizedRef(d: String): Map[Long, Array[Long]] =
    graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1024).toLong).toArray)
      .toMap

  private def sqDist(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def bruteSet(d: String): Set[(Long, Long)] =
    Similarity.queries("knn_brute")(spark, d)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("knn_ivf (fixed-point): dists exact vs plain-Scala replay; recall vs brute") {
    val q = quantizedRef(sf0001)
    val rows = FixedPointAnn.knnIvf(spark, sf0001).collect()
    assert(rows.length == 15) // 5 queries × 3
    rows.foreach { r =>
      val want = sqDist(q(r.getAs[Long]("qid")), q(r.getAs[Long]("nid")))
      assert(r.getAs[Long]("dist") == want, s"dist drift at $r")
    }
    // unit-norm corpus → L2 rank ≡ cosine rank; misses come only from
    // unprobed cells (4 of 16) and 2^-10 quantization near-ties
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = (got intersect bruteSet(sf0001)).size / 15.0
    assert(recall >= 0.4, s"IVF-fp recall@3 = $recall")
  }

  test("knn_pq (fixed-point): ADC+rescore exact; adc >= 0; recall vs brute") {
    val q = quantizedRef(sf0001)
    val rows = FixedPointAnn.knnPq(spark, sf0001).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val want = sqDist(q(r.getAs[Long]("qid")), q(r.getAs[Long]("nid")))
      assert(r.getAs[Long]("dist") == want, s"rescored dist drift at $r")
      assert(r.getAs[Long]("adc") >= 0L)
    }
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = (got intersect bruteSet(sf0001)).size / 15.0
    assert(recall >= 0.8, s"PQ-fp recall@3 = $recall")
  }

  test("knn_lsh (fixed-point): dists exact; candidates genuinely share a band") {
    val q = quantizedRef(sf0001)
    val rows = FixedPointAnn.knnLshFp(spark, sf0001).collect()
    assert(rows.nonEmpty, "LSH returned no rows at all")
    rows.foreach { r =>
      val want = sqDist(q(r.getAs[Long]("qid")), q(r.getAs[Long]("nid")))
      assert(r.getAs[Long]("dist") == want, s"dist drift at $r")
    }
    // candidate correctness: every returned neighbor must share ≥ 1 SRP
    // band key with its query — replay the banding with the SAME kernel
    // (this corpus plants no near-dups, so recall floors live with the
    // adaptive float path's spec in SimilaritySpec; what THIS query
    // guarantees is the exact bucketing + exact scoring replayed here)
    def keys(v: Array[Long]): Array[Long] =
      graft.dedup.SrpKernel.bandKeysFp(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        FixedPointAnn.LshBands, FixedPointAnn.LshBits).toLongArray()
    rows.foreach { r =>
      val kq = keys(q(r.getAs[Long]("qid")))
      val kn = keys(q(r.getAs[Long]("nid")))
      assert(kq.indices.exists(b => kq(b) == kn(b)),
        s"pair (${r.getAs[Long]("qid")}, ${r.getAs[Long]("nid")}) shares no band")
    }
    // shape: ≤ k rows per query, contiguous ranks, dist non-decreasing
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.length <= FixedPointAnn.TopK)
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length),
        s"ranks for $qid")
      val ds = sorted.map(_.getAs[Long]("dist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        s"dist not monotone for $qid")
    }
  }

  test("knn_ivfpq: recall vs brute; result ⊆ probed-cell candidates") {
    val rows = FixedPointAnn.knnIvfPq(spark, sf0001).collect()
    assert(rows.length == 15)
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = (got intersect bruteSet(sf0001)).size / 15.0
    assert(recall >= 0.4, s"IVF-PQ recall@3 = $recall")
    // structural: every returned neighbor sits in a cell its query
    // probed — replay the coarse model + probe ranking in plain Scala
    val q = quantizedRef(sf0001)
    val e = KMeans.quantized(spark, sf0001)
    val (assigned, coarse) = FixedPointAnn.lloydSub(e, 1, FixedPointAnn.Nlist)
    val cellOf = assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cents = coarse.select("cell", "qc").collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
    val probedOf = (0L until 5L).map { qid =>
      qid -> cents.map { case (c, qc) => (sqDist(q(qid), qc), c) }
        .sorted.take(FixedPointAnn.Nprobe).map(_._2).toSet
    }.toMap
    rows.foreach { r =>
      val (qid, nid) = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(probedOf(qid).contains(cellOf(nid)),
        s"neighbor $nid of $qid from unprobed cell ${cellOf(nid)}")
    }
  }

  test("ann_recall: metric agrees with an independent set computation; sane floors") {
    val r = FixedPointAnn.annRecall(spark, sf0001).collect().head
    val (k, nq, recallPpm, mrrSum) =
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(k == 3 && nq == 5)
    // independent recomputation — ground truth is the FIXED-POINT brute
    // (the metric's contract), replayed in plain Scala, not the float
    // knn_brute whose rounding can differ by a neighbor
    val q = quantizedRef(sf0001)
    val fpTruth = (0L until 5L).flatMap { qid =>
      q.toSeq.filter(_._1 != qid)
        .map { case (vid, v) => (sqDist(q(qid), v), vid) }
        .sorted.take(3).map { case (_, vid) => (qid, vid) }
    }.toSet
    val approx = FixedPointAnn.knnIvfPq(spark, sf0001).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("nid"))).toSet
    val hits = (approx intersect fpTruth).size
    assert(recallPpm == hits * 1000000L / 15L, s"recall $recallPpm vs $hits/15")
    assert(recallPpm >= 600000L, s"IVF-PQ recall@3 below floor: $recallPpm")
    // MRR sum is bounded by a perfect run (every true top-1 at rank 1)
    assert(mrrSum >= 0L && mrrSum <= nq * 1000000L)
  }

  test("determinism: results independent of input partitioning") {
    val a = FixedPointAnn.knnIvfPq(spark, sf0001).collect().toSeq
    val b = FixedPointAnn.knnIvfPq(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  test("IVF-PQ persisted layout: cell-partitioned codes prune at file level") {
    // the 100 TB claim: codes stored partitioned-by-cell, a probe reads
    // only its cells' files. Build the (vec_id, codes, cell) frame the
    // engine would persist, write partitioned, and prove the scan of two
    // probed cells touches exactly those cells' files.
    val e = KMeans.quantized(spark, sf0001)
    val (assigned, _) = FixedPointAnn.lloydSub(e, 1, FixedPointAnn.Nlist)
    val (codes, _) = FixedPointAnn.lloydSub(e, FixedPointAnn.M, FixedPointAnn.Kpq)
    val codesArr = codes.groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("cell")))),
        s => s.getField("cell")).as("codes"))
    val frame = assigned.select(col("vec_id"), col("cell")).join(codesArr, "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_cells").toString
    graft.sources.Sources.writePartitioned(frame, dir, "cell")

    val probed = Seq(0, 1)
    val back = spark.read.parquet(dir).filter(col("cell").isin(probed: _*))
    val expected = frame.filter(col("cell").isin(probed: _*)).count()
    assert(back.collect().length.toLong == expected)

    def filesUnder(cells: Seq[Int]): Int = cells.map { c =>
      val f = new java.io.File(s"$dir/cell=$c")
      if (f.exists()) f.listFiles().count(_.getName.endsWith(".parquet")) else 0
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
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    assert(scan.metrics("numFiles").value == filesUnder(probed).toLong,
      s"numFiles=${scan.metrics("numFiles").value} probedFiles=${filesUnder(probed)}")
    assert(filesUnder(probed) < filesUnder(allCells))
  }
}
