package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  private def corpus = KMeans.quantized(spark, sf0001)

  test("emb_kmeans partitions the whole corpus and is partitioning-independent") {
    val out = KMeans.queries("emb_kmeans")(spark, sf0001).collect()
    val total = graft.Tables.embeddings(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum == total, "every vector assigned exactly once")
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
    // fixed-point arithmetic is order-independent: an adversarial
    // repartition of the input must produce the identical result
    val shuffled = KMeans.iterate(corpus.repartition(7))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia_fp"))
      .orderBy(col("cell")).collect()
    assert(shuffled.toSeq == out.toSeq)
  }

  test("emb_prototypes: each prototype's distance bounds its cell's selection") {
    val protos = KMeans.queries("emb_prototypes")(spark, sf0001).collect()
    val all = KMeans.iterate(corpus).collect()
      .map(r => (r.getInt(3), r.getLong(2), r.getLong(0))) // (cell, dist, vec)
    protos.groupBy(_.getInt(1)).foreach { case (cell, rows) =>
      assert(rows.length == math.min(10, all.count(_._1 == cell)))
      val cut = rows.map(_.getLong(2)).max
      // nothing outside the selection is strictly closer than the cutoff
      val closerOutside = all.filter(_._1 == cell)
        .filterNot(a => rows.exists(_.getLong(0) == a._3))
        .count(_._2 < cut)
      assert(closerOutside == 0, s"cell $cell")
    }
  }

  test("cluster_purity: masses reconcile and the mode dominates") {
    val rows = KMeans.queries("cluster_purity")(spark, sf0001).collect()
    val total = graft.Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total, "cell masses cover the corpus")
    // independent mode re-derivation: per cell, the reported majority
    // label must carry the true maximum count (ties -> lowest label)
    val labels = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hist = KMeans.iterate(corpus).collect()
      .map(r => (r.getInt(3), labels(r.getLong(0))))
      .groupBy(_._1).view.mapValues(_.groupBy(_._2).view.mapValues(_.length).toMap).toMap
    rows.foreach { r =>
      val (cell, n, maj, nMaj, purity) =
        (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4))
      val h = hist(cell)
      assert(h.values.sum.toLong == n)
      val best = h.toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert((best._1, best._2.toLong) == (maj, nMaj), s"cell $cell mode")
      assert(purity == nMaj.toDouble / n.toDouble)
    }
  }

  test("Lloyd monotonicity: iteration 2 inertia does not exceed iteration 1") {
    def inertia(iters: Int): Long =
      KMeans.iterate(corpus, iters).agg(sum(col("dist"))).head().getLong(0)
    val i1 = inertia(1)
    val i2 = inertia(2)
    // exact theory gives i2 <= i1; grid-truncated centroids can slip by
    // at most one grid cell per dimension per centroid — allow that slack
    assert(i2 <= i1 + 64, s"inertia rose: $i1 -> $i2")
  }
}
