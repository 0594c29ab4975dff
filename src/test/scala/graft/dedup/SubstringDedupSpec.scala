package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {

  /** Quadratic reference: every L-gram string into a multiset, per-doc
    * union of duplicated [p, p+L) spans via a sweep — independent of the
    * Column tree and of the fingerprinting. */
  private def reference(texts: Map[Long, String], l: Int): Map[Long, Long] = {
    val grams = texts.toSeq.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      (0 to ws.length - l).map(p => (id, p, ws.slice(p, p + l).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dupByDoc = grams.filter(g => counts(g._3) > 1).groupBy(_._1)
    texts.map { case (id, _) =>
      val mass = dupByDoc.get(id).fold(0L) { gs =>
        val ps = gs.map(_._2).sorted
        var tot = 0L
        var start = ps.head
        var end = ps.head + l
        ps.drop(1).foreach { p =>
          if (p < end) end = math.max(end, p + l)
          else { tot += end - start; start = p; end = p + l }
        }
        tot + (end - start)
      }
      id -> mass
    }
  }

  test("dedup_substring matches the quadratic reference census") {
    val got = SubstringDedup.queries("dedup_substring")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val texts = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = reference(texts, SubstringDedup.L)
    assert(got.keySet == texts.keySet)
    got.foreach { case (id, (nTok, dup, ppm)) =>
      val words = texts(id).split(" ", -1).length.toLong
      assert(nTok == words)
      assert(dup == expect(id), s"doc $id: got $dup want ${expect(id)}")
      assert(ppm == dup * 1000000L / words)
      assert(dup <= nTok)
    }
    // the fixture corpus plants near-dup pairs: duplication must exist
    assert(got.values.map(_._2).sum > 0, "no duplicated span found at all")
  }

  test("near-dup fixture docs carry most of the duplicated mass") {
    // docs flagged by the n-gram near-dup pipeline should score high
    // substring-dup ppm; fully unique docs score 0 unless they repeat
    // a window internally (possible but rare at L=8)
    val census = SubstringDedup.queries("dedup_substring")(spark, sf0001)
      .filter(col("dup_ppm") > 0)
    assert(census.count() >= 2,
      "planted near-dups should surface at least one duplicated pair")
  }
}
