package graft.tools

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ScaleUp must produce a corpus whose every query cost scales linearly:
  * keys unique, FK fan-outs exactly factor×, and NO cross-copy near-dup
  * structure (which would make pair-generating operators super-linear by
  * construction rather than by engine behavior). */
class ScaleUpSpec extends SparkSpec {

  private val factor = 3

  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_scaleup").toString
    ScaleUp.run(spark, sf0001, d, factor)
    d
  }

  private lazy val docStride: Long = Tables.documents(spark, sf0001)
    .agg(max(col("doc_id"))).head.getLong(0) + 1
  private lazy val vecStride: Long = Tables.embeddings(spark, sf0001)
    .agg(max(col("vec_id"))).head.getLong(0) + 1

  test("row counts scale by factor; scale-free dims stay fixed") {
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "documents", "embeddings", "events"))
      assert(Tables.table(spark, outDir, t).count() ==
        factor * Tables.table(spark, sf0001, t).count(), t)
    assert(Tables.nation(spark, outDir).count() ==
      Tables.nation(spark, sf0001).count())
    assert(Tables.region(spark, outDir).count() ==
      Tables.region(spark, sf0001).count())
  }

  test("keys stay unique; FK joins and the sales view scale exactly") {
    val li = Tables.lineitem(spark, outDir)
    val o = Tables.orders(spark, outDir)
    assert(o.select("o_orderkey").distinct().count() == o.count())
    // every lineitem FK resolves to exactly one order in ITS copy
    assert(li.join(o, li("l_orderkey") === o("o_orderkey")).count() == li.count())
    val c = Tables.customer(spark, outDir)
    assert(c.select("c_name").distinct().count() == c.count()) // EMF group key 1:1
    assert(Tables.salesView(spark, outDir).count() ==
      factor * Tables.salesView(spark, sf0001).count())
  }

  test("cross-copy documents share no 3-gram shingles") {
    val d = Tables.documents(spark, outDir)
      .select(col("doc_id"), graft.dedup.Dedup.shingles(col("text"), 3).as("sh"))
    def copy(k: Int) = d
      .filter(col("doc_id") >= k * docStride && col("doc_id") < (k + 1) * docStride)
      .select((col("doc_id") - k * docStride).as("base_id"), col("sh").as(s"sh$k"))
    val joined = copy(0).join(copy(1), "base_id").join(copy(2), "base_id")
    val maxJ = joined.select(greatest(
      size(array_intersect(col("sh0"), col("sh1"))),
      size(array_intersect(col("sh1"), col("sh2"))),
      size(array_intersect(col("sh0"), col("sh2")))).as("i"))
      .agg(max(col("i"))).head.getInt(0)
    assert(maxJ == 0, s"cross-copy shingle overlap: $maxJ")
  }

  test("cross-copy embeddings are far below the near-dup cosine threshold") {
    val e = Tables.embeddings(spark, outDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
    def copy(k: Int) = e
      .filter(col("vec_id") >= k * vecStride && col("vec_id") < (k + 1) * vecStride)
      .select((col("vec_id") - k * vecStride).as("base_id"), col("emb").as(s"e$k"))
    val joined = copy(0).join(copy(1), "base_id").join(copy(2), "base_id")
    val maxCos = joined.select(greatest(
      graft.ann.Similarity.cosineFast(col("e0"), col("e1")),
      graft.ann.Similarity.cosineFast(col("e1"), col("e2")),
      graft.ann.Similarity.cosineFast(col("e0"), col("e2"))).as("c"))
      .agg(max(col("c"))).head.getDouble(0)
    assert(maxCos < 0.99, s"cross-copy cosine too high: $maxCos")
  }

  test("near-dup pair count scales exactly linearly (no cross-copy pairs)") {
    val base = graft.dedup.Dedup.queriesNgramPairs(spark, sf0001).count()
    val scaled = graft.dedup.Dedup.queriesNgramPairs(spark, outDir).count()
    assert(scaled == factor * base, s"base=$base scaled=$scaled")
  }

  test("simhash pairs stay within-copy and near-linear (no shared-token drift)") {
    // word-multiset signatures are the sensitive case: if perturbation
    // tokens were shared across docs of a copy (the pre-fix behavior),
    // unrelated within-copy docs would drift toward each other in hamming
    // space and the pair count would grow super-linearly. The injective
    // word renaming re-rolls per-word hashes per copy, so counts are
    // hash-luck around the base value rather than exactly equal — assert
    // the structure (zero cross-copy pairs) and a linearity envelope.
    val base = graft.SparkEntry.queries("dedup_simhash")(spark, sf0001).count()
    val pairs = graft.SparkEntry.queries("dedup_simhash")(spark, outDir)
    // scaled doc space: base docs in [0, 3·ds), fixture near-dups shifted
    // by 3·ds — copy of any id is (id mod 3·ds) div ds
    def copyOf(c: org.apache.spark.sql.Column) =
      pmod(c, lit(factor * docStride)).divide(lit(docStride)).cast("int")
    val cross = pairs.filter(copyOf(col("id_a")) =!= copyOf(col("id_b"))).count()
    assert(cross == 0, s"cross-copy simhash pairs: $cross")
    val perCopy = pairs.groupBy(copyOf(col("id_a")).as("k")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCopy.keySet == (0 until factor).toSet, s"copies seen: $perCopy")
    for ((k, n) <- perCopy)
      assert(n >= base / 2 && n <= base * 2, s"copy $k: $n vs base $base")
  }
}
