package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects hamming64 + as-of strategy into a fresh session") {
    val base = TestSpark.spark // shared SparkContext
    // getOrCreate only applies extensions when building a NEW session:
    // clear the default so one is built (over the same SparkContext),
    // then restore for the other suites.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql("SELECT hamming64(CAST(7 AS BIGINT), CAST(0 AS BIGINT)) AS h")
      assert(r.head.getInt(0) == 3)
      val c = s.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(0.6d, 0.8d)) AS c")
      assert(math.abs(c.head.getDouble(0) - 0.6) < 1e-12)
      val d = s.sql(
        "SELECT dict_word_count('the cat and the hat', 'the', 'and') AS n")
      assert(d.head.getInt(0) == 3)
      // dictionary args must be literals — a column reference is rejected
      val ex = intercept[Exception] {
        s.sql("SELECT dict_word_count('a b', CAST(rand() AS STRING)) AS n")
          .collect()
      }
      assert(ex.getMessage.contains("string literals"))
      val rep = s.sql(
        "SELECT r.n_words, r.distinct_words, r.top_ngram_count FROM " +
          "(SELECT ngram_rep_stats('a b a b', 2) AS r)")
      val rr = rep.head
      assert(rr.getLong(0) == 4L && rr.getLong(1) == 2L && rr.getLong(2) == 2L)
      val wc = s.sql(
        "SELECT transform(word_counts('b a b'), p -> concat(p.w, ':', p.c)) AS x")
      assert(wc.head.getSeq[String](0) == Seq("a:1", "b:2"))
      val q = s.sql(
        "SELECT quantize_i8(array(2.0d, -1.0d, 0.5d)).qvec AS qv")
      assert(q.head.getSeq[Int](0) == Seq(127, -64, 32))
      val mbo = s.sql(
        """SELECT min_by_ord(v, o, i) AS first_v, max_by_ord(v, o, i) AS last_v
          |FROM VALUES (10L, 3L, 1L), (20L, 1L, 2L), (30L, 1L, 1L) AS t(v, o, i)
          |""".stripMargin).head
      assert(mbo.getLong(0) == 30L && mbo.getLong(1) == 10L)
      // wrong arity surfaces as the standard WRONG_NUM_ARGS analysis
      // error, not a raw IllegalArgumentException from the registry
      val arity = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT min_by_ord(1L, 2L) AS x").collect()
      }
      assert(arity.getCondition != null &&
        arity.getCondition.startsWith("WRONG_NUM_ARGS"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
