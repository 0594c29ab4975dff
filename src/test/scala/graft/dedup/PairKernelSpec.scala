package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** Direct unit specs of the round-9 pair kernels against plain-Scala
  * references — the end-to-end guarantees live in the query oracles
  * (dedup_ngram, basket_pairs, dedup_simhash, multimodal_phash,
  * knn_lsh); these pin the kernel semantics in isolation so a kernel
  * regression is named at the kernel, not at a downstream hash
  * mismatch. */
class PairKernelSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  test("packedPairs equals the nested-loop reference and round-trips ids") {
    val cases = Seq(
      Seq.empty[Long], Seq(7L), Seq(1L, 5L), Seq(0L, 1L, 2L, 3L),
      (0L until 32L).toSeq, Seq(0L, PairKernel.MaxId))
    for (ids <- cases) {
      val got = Seq(Tuple1(ids)).toDF("ids")
        .select(explode(SignatureExprs.packedPairs(col("ids"))).as("pk"))
        .select(shiftrightunsigned(col("pk"), 31).as("a"),
          col("pk").bitwiseAND(lit((1L << 31) - 1)).as("b"))
        .as[(Long, Long)].collect().toSeq.sorted
      val want = (for {
        i <- ids.indices; j <- (i + 1) until ids.length
      } yield (ids(i), ids(j))).sorted
      assert(got == want, s"ids=$ids")
    }
  }

  test("packedPairs fails fast past the 31-bit id guard") {
    val e = intercept[org.apache.spark.SparkException] {
      Seq(Tuple1(Seq(1L, PairKernel.MaxId + 1)))
        .toDF("ids")
        .select(explode(SignatureExprs.packedPairs(col("ids"))))
        .collect()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ causes(x.getCause))
    assert(causes(e).exists(_.contains("packed_pairs")), causes(e).mkString)
  }

  test("packedPairs catches a mid-array out-of-range id (unsorted caller)") {
    // endpoint-only validation would miss this: v(0) and v(n-1) are in
    // range, the violation is in the middle of an UNSORTED array
    val e = intercept[org.apache.spark.SparkException] {
      Seq(Tuple1(Seq(1L, PairKernel.MaxId + 7, 5L)))
        .toDF("ids")
        .select(explode(SignatureExprs.packedPairs(col("ids"))))
        .collect()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ causes(x.getCause))
    assert(causes(e).exists(m =>
      m.contains("packed_pairs") && m.contains("at 1")), causes(e).mkString)
  }

  test("both pair kernels fail fast and NAMED on a hot bucket") {
    // past MaxBucketMembers the n(n-1)/2 allocation must not be
    // attempted — the error names the kernel and the upstream fix
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ causes(x.getCause))
    val hotIds = (0L to PairKernel.MaxBucketMembers.toLong).toSeq
    val e1 = intercept[org.apache.spark.SparkException] {
      Seq(Tuple1(hotIds)).toDF("ids")
        .select(explode(SignatureExprs.packedPairs(col("ids"))))
        .collect()
    }
    assert(causes(e1).exists(m =>
      m.contains("packed_pairs") && m.contains("MaxBucketMembers")),
      causes(e1).mkString)
    val hotMembers = hotIds.map(i => (i, 0L))
    val e2 = intercept[org.apache.spark.SparkException] {
      Seq(Tuple1(hotMembers)).toDF("ms")
        .select(explode(SignatureExprs.hammingPairs(col("ms"), 3)))
        .collect()
    }
    assert(causes(e2).exists(m =>
      m.contains("hamming_pairs") && m.contains("MaxBucketMembers")),
      causes(e2).mkString)
  }

  test("editPairs equals the levenshtein == 1 filter it replaced") {
    val members = Seq(
      (1L, "kitten"), (2L, "mitten"), (3L, "kitte"), (4L, "kittens"),
      (5L, "sitting"), (6L, "kitten"), (7L, ""), (8L, "a"), (9L, "b"))
    val got = Seq(Tuple1(members)).toDF("ms")
      .select(explode(SignatureExprs.editPairs(col("ms"))).as("p"))
      .select("p.a_id", "p.b_id")
      .as[(Long, Long)].collect().toSeq.sorted
    // reference: Spark's own levenshtein over the quadratic pair set
    val want = (for {
      i <- members.indices; j <- (i + 1) until members.length
    } yield (members(i), members(j)))
      .map { case ((ia, sa), (ib, sb)) => (ia, sa, ib, sb) }
      .toDF("a_id", "a_name", "b_id", "b_name")
      .filter(levenshtein(col("a_name"), col("b_name")) === 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == want)
    // identical strings (distance 0) must NOT pair
    assert(!got.contains((1L, 6L)))
  }

  test("editPairs never self-pairs duplicate ids") {
    // two rows with the SAME id but one-edit-apart strings: the
    // variant-join formulation filtered a_id < b_id, so the kernel must
    // not emit the (id, id) pair — only cross-id pairs survive
    val members = Seq((1L, "cat"), (1L, "cut"), (2L, "cot"))
    val got = Seq(Tuple1(members)).toDF("ms")
      .select(explode(SignatureExprs.editPairs(col("ms"))).as("p"))
      .select("p.a_id", "p.b_id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 2L), (1L, 2L)), s"got $got")
  }

  test("fpPackedPairs == packedPairs at maxDist 64; filters exactly at lower") {
    val members = Seq(
      (1L, 0x0L), (2L, 0x3L), (5L, 0xFFL), (9L, 0x1L),
      (11L, 0xFFFFFFFFFFFFFFFL), (12L, -1L))
    for (maxD <- Seq(0, 2, 6, 64)) {
      val got = Seq(Tuple1(members)).toDF("ms")
        .select(explode(SignatureExprs.fpPackedPairs(col("ms"), maxD)).as("pk"))
        .select(shiftrightunsigned(col("pk"), 31).as("a"),
          col("pk").bitwiseAND(lit((1L << 31) - 1)).as("b"))
        .as[(Long, Long)].collect().toSeq.sorted
      val want = (for {
        i <- members.indices; j <- (i + 1) until members.length
        if java.lang.Long.bitCount(members(i)._2 ^ members(j)._2) <= maxD
      } yield (members(i)._1, members(j)._1)).sorted
      assert(got == want, s"maxD=$maxD")
    }
    // same named fail-fasts as the sibling kernels
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ causes(x.getCause))
    val e1 = intercept[org.apache.spark.SparkException] {
      Seq(Tuple1(Seq((PairKernel.MaxId + 1, 0L), (PairKernel.MaxId + 2, 0L))))
        .toDF("ms")
        .select(explode(SignatureExprs.fpPackedPairs(col("ms"), 64)))
        .collect()
    }
    assert(causes(e1).exists(m =>
      m.contains("fp_packed_pairs") && m.contains("ids must be")),
      causes(e1).mkString)
    val e2 = intercept[org.apache.spark.SparkException] {
      Seq(Tuple1((0L to PairKernel.MaxBucketMembers.toLong).map(i => (i, 0L))))
        .toDF("ms")
        .select(explode(SignatureExprs.fpPackedPairs(col("ms"), 64)))
        .collect()
    }
    assert(causes(e2).exists(m =>
      m.contains("fp_packed_pairs") && m.contains("MaxBucketMembers")),
      causes(e2).mkString)
  }

  test("srpFp: scalar sign-matrix replay; offset planes disjoint from bands") {
    val emb = Array.tabulate(16)(i => math.sin(i * 1.7) + 0.3)
    for (off <- Seq(0, 64, 18 * 32)) {
      val got = Seq(Tuple1(emb.toSeq)).toDF("emb")
        .select(SignatureExprs.srpFp(col("emb"), off).as("fp"))
        .as[Long].head()
      val m = SrpKernel.signMatrix(off + 64, emb.length)
      var want = 0L
      for (j <- 0 until 64) {
        val proj = (0 until emb.length).map(i => emb(i) * m(off + j)(i)).sum
        if (proj > 0) want |= (1L << j)
      }
      assert(got == want, s"offset=$off")
    }
    // identity: fp at offset 0 == the 8×8-bit band keys re-packed —
    // bands and fp read the SAME deterministic plane matrix
    val fp0 = Seq(Tuple1(emb.toSeq)).toDF("emb")
      .select(SignatureExprs.srpFp(col("emb"), 0).as("fp")).as[Long].head()
    val bandKeys = Seq(Tuple1(emb.toSeq)).toDF("emb")
      .select(SignatureExprs.srpBands(col("emb"), 8, 8).as("ks"))
      .as[Seq[Long]].head()
    val repacked = bandKeys.zipWithIndex
      .map { case (k, b) => k << (8 * b) }.reduce(_ | _)
    assert(fp0 == repacked)
  }

  test("hammingPairs equals the explode + bit_count filter it replaced") {
    val members = Seq(
      (1L, 0x0L), (2L, 0x3L), (5L, 0xFFL), (9L, 0x1L),
      (11L, 0xFFFFFFFFFFFFFFFL), (12L, -1L))
    for (maxD <- Seq(0, 2, 6, 64)) {
      val got = Seq(Tuple1(members)).toDF("ms")
        .select(explode(SignatureExprs.hammingPairs(col("ms"), maxD)).as("p"))
        .select("p.id_a", "p.id_b", "p.dist")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val want = (for {
        i <- members.indices; j <- (i + 1) until members.length
        d = java.lang.Long.bitCount(members(i)._2 ^ members(j)._2)
        if d <= maxD
      } yield (members(i)._1, members(j)._1, d)).sorted
      assert(got == want, s"maxD=$maxD")
    }
  }
}
