package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EditNeighborsSpec extends SparkSpec {

  test("deletion blocking finds every edit-distance-1 pair kind, nothing else") {
    // one pair of each kind: substitution, insertion/deletion, and a
    // repeated-char case where two deletions coincide (dedup must not
    // double-emit); "dog" is within distance 1 of nothing here
    import spark.implicits._
    val df = Seq((1L, "cat"), (2L, "cut"), (3L, "cats"), (4L, "at"),
      (5L, "aab"), (6L, "ab"), (7L, "dog")).toDF("id", "s")
    val got = EditNeighbors.neighbors(df, "id", "s")
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // ground truth by brute force instead of hand-listing
    val names = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ai, as) <- names; (bi, bs) <- names
      if ai < bi && levenshteinScalar(as, bs) == 1
    } yield (ai, bi)).toSet
    assert(got.toSet == brute, s"got ${got.toSet}, want $brute")
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.toSet.contains((1L, 2L)), "substitution pair missed")
    assert(got.toSet.contains((1L, 3L)), "insertion pair missed")
    assert(got.toSet.contains((1L, 4L)), "deletion pair missed")
    assert(got.toSet.contains((5L, 6L)), "repeated-char pair missed")
    assert(!got.toSet.exists(p => p._1 == 7L || p._2 == 7L), "false positive")
  }

  test("blocked join equals the quadratic definition on real names") {
    import spark.implicits._
    val c = Tables.customer(spark, sf0001)
    val got = EditNeighbors.neighbors(c, "c_custkey", "c_name")
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val names = c.select($"c_custkey", $"c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ai, as) <- names; (bi, bs) <- names
      if ai < bi && levenshteinScalar(as, bs) == 1
    } yield (ai, bi)).toSet
    assert(got == brute && got.nonEmpty)

    // scale contract: candidates come from a hash join on the variant
    // key — no cartesian anywhere in the plan
    val plan = EditNeighbors.queries("word_neighbors")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking degenerated to all-pairs:\n${plan.take(1500)}")
  }

  test("structurally hot bucket: capped, deterministic, and it COMPLETES") {
    // 17000 distinct 1-char strings all share the "" deletion variant —
    // one bucket past MaxBucketMembers (16384), which used to abort the
    // job. The cap keeps the first maxVariantDf members by (id, s), so
    // the run completes and the output is exactly the pairs among the
    // 256 smallest ids (every two distinct 1-char strings are
    // levenshtein-1, and "" is their only shared variant).
    import spark.implicits._
    val n = PairKernel.MaxBucketMembers + 616 // > the old fail-fast bound
    val df = (1 to n).map(i =>
      (i.toLong, new String(Character.toChars(255 + i)))) // distinct BMP chars
      .toDF("id", "s")
    val got = EditNeighbors.neighbors(df, "id", "s")
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    val cap = EditNeighbors.maxVariantDf
    assert(got.length == cap * (cap - 1) / 2, s"got ${got.length} pairs")
    // first-N-by-id semantics: survivors are EXACTLY ids 1..cap
    assert(got.flatMap(p => Seq(p._1, p._2)).max == cap.toLong)
    assert(got.toSet == (for {
      a <- 1L to cap.toLong; b <- (a + 1) to cap.toLong
    } yield (a, b)).toSet)
  }

  test("a cap that binds keeps pairs reachable through non-hot variants") {
    // hub: 40 copies of "aa" (hot via every shared variant) next to a
    // genuine typo pair; with cap=4 the hub collapses but (cat, cut)
    // still pairs through their un-hot shared variant "ct"
    import spark.implicits._
    val hub = (1L to 40L).map(i => (i, "aa"))
    val df = (hub ++ Seq((101L, "cat"), (102L, "cut"))).toDF("id", "s")
    val got = EditNeighbors.neighbors(df, "id", "s", cap = 4)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got.contains((101L, 102L)), s"typo pair lost: $got")
    // identical hub strings are distance 0 — never pairs, capped or not
    assert(got == Set((101L, 102L)), s"unexpected pairs: $got")
  }

  /** Textbook DP Levenshtein — the independent ground truth. */
  private def levenshteinScalar(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
