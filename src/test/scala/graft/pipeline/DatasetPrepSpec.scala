package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatasetPrepSpec extends SparkSpec {

  test("pack_sequences: contiguous per-lang layout, bins respect the budget") {
    val out = DatasetPrep.queries("pack_sequences")(spark, sf0001).collect()
    assert(out.nonEmpty)
    // per lang: offsets start at 0 and are contiguous (off + n_tok = next off)
    out.groupBy(_.getString(1)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(0))
      assert(sorted.head.getLong(3) == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) + a.getLong(2) == b.getLong(3))
        case _ => ()
      }
      // bin_id is the chunk of the start offset
      sorted.foreach(r =>
        assert(r.getLong(4) == r.getLong(3) / DatasetPrep.ctxLen))
    }
  }

  test("sample_split: deterministic, stratified, roughly 80/10/10") {
    val out = DatasetPrep.queries("sample_split")(spark, sf0001)
    val a = out.collect().toSeq
    val b = DatasetPrep.queries("sample_split")(spark, sf0001).collect().toSeq
    assert(a == b) // re-run stable (no RNG)
    val bySplit = a.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.6 && bySplit("train") / total < 0.95)
    assert(bySplit.keySet == Set("train", "val", "test"))
    // stratified: every lang present in the train split
    val langs = a.map(_.getString(0)).toSet
    val trainLangs = a.filter(_.getString(1) == "train").map(_.getString(0)).toSet
    assert(trainLangs == langs)
  }
}
