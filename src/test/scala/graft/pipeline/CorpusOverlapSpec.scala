package graft.pipeline

import graft.SparkSpec

class CorpusOverlapSpec extends SparkSpec {

  test("corpus_overlap reports exact pairwise shingle Jaccard on a planted fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("overlap_fix").toString
    // Shingle sets (3-gram):
    //   src x, doc 1: "a b c d"   -> {a b c, b c d}
    //   src y, doc 2: "a b c e"   -> {a b c, b c e}
    //   src y, doc 3: "b c d x"   -> {b c d, c d x}
    //   src z, doc 4: "p q r"     -> {p q r}
    // x = {abc, bcd} (2); y = {abc, bce, bcd, cdx} (4); z = {pqr} (1)
    // x∩y = {abc, bcd} = 2 -> J = 2/4, containment = 2/min(2,4) = 1
    // x∩z = y∩z = 0 -> pair absent (inner-join semantics)
    Seq(
      (1L, "a b c d", "en", "x", 7L),
      (2L, "a b c e", "en", "y", 7L),
      (3L, "b c d x", "en", "y", 7L),
      (4L, "p q r", "en", "z", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusOverlap.queries("corpus_overlap")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) == ("x", "y"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (2L, 4L, 2L))
    assert(r.getLong(5) == 500000L, "jaccard_ppm: 2/4")
    assert(r.getLong(6) == 1000000L, "containment_ppm: 2/min(2,4)")
  }

  test("corpus_overlap is symmetric-consistent on real data: n_inter <= min sizes") {
    val rows = CorpusOverlap.queries("corpus_overlap")(spark, sf0001).collect()
    rows.foreach { r =>
      val (na, nb, ni) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ni <= math.min(na, nb), s"$r")
      assert(r.getLong(6) <= 1000000L)
      assert(r.getString(0) < r.getString(1))
    }
  }
}
