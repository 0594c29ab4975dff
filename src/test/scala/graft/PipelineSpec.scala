package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("training-data pipeline: dedup → quality → annotate, deterministic") {
    val out = PipelineRun.run(spark, sf0001).cache()
    try {
      val n = out.count()
      // near-dups (the 500 planted copies) must be gone; base corpus
      // survives quality filtering at least in part
      assert(n > 100 && n <= 500, s"unexpected survivor count $n")
      val stride = graft.Tables.documents(spark, sf0001)
        .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0) + 1
      assert(out.filter(col("doc_id") >= stride).count() < 500) // copies dropped
      val schema = out.schema.fieldNames.toSet
      assert(Set("doc_id", "quality", "lang_guess", "n_tokens",
        "fingerprint", "shard").subsetOf(schema))
      // deterministic across runs
      val again = PipelineRun.run(spark, sf0001)
      assert(out.orderBy("doc_id").collect().toSeq ==
        again.orderBy("doc_id").collect().toSeq)
    } finally out.unpersist()
  }
}
