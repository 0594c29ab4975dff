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
}
