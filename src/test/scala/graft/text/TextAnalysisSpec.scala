package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("text_quality_filter keeps ~75% of each language (p25 cutoff, small-sample discreteness)") {
    val total = graft.Tables.documents(spark, sf0001)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = TextAnalysis.queries("text_quality_filter")(spark, sf0001).cache()
    val kept = out.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == total.keySet)
    kept.foreach { case (lang, k) =>
      val frac = k.toDouble / total(lang)
      assert(frac >= 0.70 && frac < 1.0, s"$lang kept $frac")
    }
    // the filter is a per-lang threshold: survivors' min quality must be
    // strictly above the worst dropped doc's quality for the same lang
    val dropped = graft.Tables.documents(spark, sf0001)
      .join(out.select(col("doc_id")), Seq("doc_id"), "left_anti")
    assert(dropped.count() == total.values.sum - kept.values.sum)
    out.unpersist()
  }

  // r18: phrase_mining generates unigram+bigram postings in ONE in-row
  // explode (null w2 = unigram) — assert the rewrite reproduces the old
  // two-aggregate formulation exactly, and that forcing the share gate
  // open (materialized counts frame) changes nothing.
  test("phrase_mining: combined posting pass ≡ the two-aggregate form, gate-invariant") {
    val ws = split(col("text"), " ")
    val docs = graft.Tables.documents(spark, sf0001)
    val uni = docs.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val bi = docs
      .select(explode(zip_with(
        slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
    val old = bi
      .join(uni.select(col("w").as("w1"), col("n").as("n_w1")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n_w2")), "w2")
      .filter(col("n_ab") >= 8)
      .selectExpr("w1", "w2", "n_ab", "n_w1", "n_w2",
        """CAST((CAST(n_ab - 5 AS DECIMAL(38,0)) * 1000000000)
          | div (CAST(n_w1 AS DECIMAL(19,0)) * n_w2) AS BIGINT)
          | AS score_ppb""".stripMargin)
      .filter(col("score_ppb") > 0)
      .orderBy(col("score_ppb").desc, col("w1"), col("w2"))
      .collect().toSeq
    val now = TextAnalysis.queries("phrase_mining")(spark, sf0001)
      .collect().toSeq
    assert(now == old)
    spark.conf.set("spark.graft.share.minBytes", "0")
    try {
      val open = TextAnalysis.queries("phrase_mining")(spark, sf0001)
        .collect().toSeq
      assert(open == old)
    } finally {
      spark.conf.unset("spark.graft.share.minBytes")
      graft.emf.EmfPlanner.unpersistAll()
    }
  }

  test("text_top_terms: gate-open (shared tf) ≡ gate-closed") {
    val closed = TextAnalysis.queries("text_top_terms")(spark, sf0001)
      .collect().toSeq
    spark.conf.set("spark.graft.share.minBytes", "0")
    try {
      val open = TextAnalysis.queries("text_top_terms")(spark, sf0001)
        .collect().toSeq
      assert(open == closed)
    } finally {
      spark.conf.unset("spark.graft.share.minBytes")
      graft.emf.EmfPlanner.unpersistAll()
    }
  }

  test("text_bm25: scores rank by term mass and match a scalar re-derivation") {
    val rows = TextAnalysis.queries("text_bm25")(spark, sf0001).collect()
    assert(rows.length == 20)
    // monotone by construction of the ORDER BY
    val scores = rows.map(_.getDouble(2))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    assert(scores.head > 0.0)
    // re-derive the top doc's score from first principles (plain Scala,
    // same formula, independent of the Column tree)
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val terms = Seq("spark", "join", "window")
    val lens = docs.map { case (_, t) => t.split(" ", -1).length }
    val n = docs.size.toDouble
    val avgdl = lens.sum.toDouble / n
    def tf(text: String, w: String) = text.split(" ", -1).count(_ == w)
    val dfs = terms.map(t => docs.values.count(x => tf(x, t) > 0).toDouble)
    val top = rows.head
    val dl = docs(top.getLong(0)).split(" ", -1).length.toDouble
    val expect = terms.zip(dfs).map { case (t, dfc) =>
      val tfi = tf(docs(top.getLong(0)), t).toDouble
      val idf = BigDecimal(math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      idf * (tfi * 2.2) / (tfi + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }.sum
    val expectR = BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getDouble(2) == expectR,
      s"bm25 ${top.getDouble(2)} vs rederived $expectR")
  }

  test("ngramRepStats equals the explode-groupBy spec on the corpus + edges") {
    // naive Column spec: bigram strings via slice/array_join, counted by
    // an aggregation shuffle — exactly what the kernel's zero-shuffle
    // per-row walk replaces
    def specStats(df: org.apache.spark.sql.DataFrame) = {
      val ws = split(col("text"), " ")
      val n = size(ws)
      // sequence(1, 0) is DESCENDING [1, 0] in Spark — a 1-word doc
      // needs an explicitly empty index array
      val idx = when(n >= 2, sequence(lit(1), n - 1))
        .otherwise(array().cast("array<int>"))
      val bg = transform(idx,
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1)))
      df.select(
        col("doc_id"),
        n.cast("long").as("s_words"),
        size(array_distinct(ws)).cast("long").as("s_distinct"),
        coalesce(array_max(transform(array_distinct(bg),
          b => size(filter(bg, x => x === b)))), lit(0))
          .cast("long").as("s_top"))
    }
    val docs = graft.Tables.documents(spark, sf0001)
    val fast = docs.select(col("doc_id"),
      TextExprs.ngramRepStats(col("text"), 2).as("st"))
      .select(col("doc_id"), col("st.n_words"), col("st.distinct_words"),
        col("st.top_ngram_count"))
    val mism = specStats(docs).join(fast, Seq("doc_id"))
      .filter(col("s_words") =!= col("n_words") ||
        col("s_distinct") =!= col("distinct_words") ||
        col("s_top") =!= col("top_ngram_count")).count()
    assert(mism == 0L)

    // edges: single word (no bigram), exact repeats, empty-word runs,
    // multi-byte UTF-8, and a doc that is one long repeated bigram
    val edge = Seq(
      "solo",                       // 1 word, 0 bigrams
      "a b a b a b",                // "a b" x3, "b a" x2 -> top 3
      "x  x  x",                    // empty words between doubles
      "é ü é ü",                    // multi-byte
      "w w w w w w")                // "w w" x5
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val edf = spark.createDataFrame(edge).toDF("doc_id", "text")
    val got = edf.select(col("doc_id"),
      TextExprs.ngramRepStats(col("text"), 2).as("st"))
      .select(col("st.n_words"), col("st.distinct_words"),
        col("st.top_ngram_count"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == ((1L, 1L, 0L)))
    assert(got(1) == ((6L, 2L, 3L)))
    assert(got(2) == ((5L, 2L, 2L)))   // words: x,'',x,'',x -> top ('x ') pairs
    assert(got(3) == ((4L, 2L, 2L)))   // "é ü" twice
    assert(got(4) == ((6L, 1L, 5L)))
    // spec parity on the same edges (hash-vs-string distinctness agrees)
    val em = specStats(edf).join(
      edf.select(col("doc_id"), TextExprs.ngramRepStats(col("text"), 2).as("st"))
        .select(col("doc_id"), col("st.n_words"), col("st.distinct_words"),
          col("st.top_ngram_count")), Seq("doc_id"))
      .filter(col("s_words") =!= col("n_words") ||
        col("s_distinct") =!= col("distinct_words") ||
        col("s_top") =!= col("top_ngram_count")).count()
    assert(em == 0L)
  }

  test("dictWordCount (native codegen expr) equals the HOF countIn spec") {
    val dict = Seq("the", "a", "an", "and", "of", "to", "in", "is")
    // corpus parity — every doc, exact equality
    val mismatches = graft.Tables.documents(spark, sf0001)
      .select(
        TextAnalysis.countIn(split(col("text"), " "), dict).as("spec"),
        TextExprs.dictWordCount(col("text"), dict).as("fast"))
      .filter(col("spec") =!= col("fast")).count()
    assert(mismatches == 0L)
    // tokenization edges: empties from consecutive/trailing separators,
    // multiplicity, no-match, and the empty string
    val df = spark.createDataFrame(
      Seq("the the  the ", "", "  ", "xyz", "of", " of").map(Tuple1.apply))
      .toDF("text")
    val rows = df.select(
      TextAnalysis.countIn(split(col("text"), " "), dict).as("spec"),
      TextExprs.dictWordCount(col("text"), dict).as("fast")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("punctCount (native byte-walk expr) equals regexp_count on the class") {
    // corpus parity
    val mismatches = graft.Tables.documents(spark, sf0001)
      .select(
        regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).as("spec"),
        TextExprs.punctCount(col("text")).as("fast"))
      .filter(col("spec") =!= col("fast")).count()
    assert(mismatches == 0L)
    // unicode edges: multi-byte code points count ONCE (like Java regex),
    // astral (surrogate-pair) chars too; ASCII class members don't count
    val df = spark.createDataFrame(Seq(
      "a.b,c!", "héllo", "naïve café", "emoji 😀 end", "™", "",
      "A1 z9", "tab\tnl\n").map(Tuple1.apply)).toDF("text")
    val rows = df.select(
      regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).as("spec"),
      TextExprs.punctCount(col("text")).as("fast"),
      col("text")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"'${r.getString(2)}': regex=${r.getInt(0)} native=${r.getInt(1)}"))
  }

  test("wordCounts (in-row kernel) equals explode+groupBy on the corpus + edges") {
    // corpus parity: kernel pairs re-exploded == the shuffle formulation
    val viaKernel = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(TextExprs.wordCounts(col("text"))).as("p"))
      .select(col("doc_id"), col("p.w").as("w"), col("p.c").as("c"))
    val viaShuffle = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    assert(viaKernel.exceptAll(viaShuffle).isEmpty &&
      viaShuffle.exceptAll(viaKernel).isEmpty)
    // edges: empties kept exactly like split(text, " ") — consecutive
    // separators, trailing separator, empty string; plus sortedness
    val df = spark.createDataFrame(Seq(
      "a b a", "a  b", "a b ", "", " ", "same same same").map(Tuple1.apply))
      .toDF("text")
    val rows = df.select(col("text"),
      TextExprs.wordCounts(col("text")).as("wc"),
      split(col("text"), " ").as("ws")).collect()
    rows.foreach { r =>
      val ws = r.getSeq[String](2)
      val expect = ws.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val got = r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => p.getString(0) -> p.getLong(1))
      assert(got.toMap == expect, s"'${r.getString(0)}'")
      assert(got.map(_._1) == got.map(_._1).sorted, s"unsorted: $got")
    }
  }

  test("ngram_counts: scalar recount agrees, threshold and order hold") {
    val got = TextAnalysis.queries("ngram_counts")(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("n"), r.getAs[String]("gram"), r.getAs[Long]("cnt")))
    assert(got.nonEmpty && got.length <= 100)
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map[(Int, String), Long]()
      .withDefaultValue(0L)
    for (t <- docs) {
      val ws = t.split(" ", -1) // -1 mirrors Spark split (keeps trailing "")
      for (n <- 1 to 3; i <- 0 to ws.length - n)
        counts((n, ws.slice(i, i + n).mkString(" "))) += 1
    }
    val expect = counts.toSeq.filter(_._2 >= 4)
      .map { case ((n, g), c) => (n, g, c) }
      .sortBy { case (n, g, c) => (-c, n, g) }.take(100)
    assert(got.toSeq == expect, s"first diff: ${
      got.toSeq.zip(expect).find { case (a, b) => a != b }}")
  }
}
