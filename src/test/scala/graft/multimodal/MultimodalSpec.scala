package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table schema: binary payload + typed metadata") {
    val mt = Multimodal.mediaTable(spark, sf0001)
    val sch = mt.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("width").dataType.typeName == "integer")
    assert(mt.count() == 500)
  }

  test("metadata-only query prunes the payload column from the scan") {
    val meta = Multimodal.mediaTable(spark, sf0001).toDF()
      .select(col("media_id"), col("kind"), col("width"))
    val scan = meta.queryExecution.executedPlan.toString
    // documents.parquet scan must read text (payload/width derive from it)
    // but a pure-id projection must not:
    val ids = Multimodal.mediaTable(spark, sf0001).toDF().select(col("media_id"))
    val idScan = ids.queryExecution.executedPlan.toString
    assert(idScan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"payload not pruned:\n$idScan")
  }

  test("stubbed decode: deterministic fake features via mapPartitions") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf0001))
      .collect().sortBy(_.media_id)
    assert(feats.length == 500)
    // brightness = mean byte of UTF-8 text; ASCII word soup → 32..127
    feats.foreach { f =>
      assert(f.brightness > 32 && f.brightness < 127)
      assert(f.n_bytes > 0)
      assert(f.sampled_frames.nonEmpty &&
        f.sampled_frames.length == (f.n_bytes + 31) / 32)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf0001))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.brightness).toSeq == again.map(_.brightness).toSeq)
  }

  test("aHash64: corruption-robust, edit-sensitive; phash finds exactly the planted twins") {
    // unit: a few flipped bytes barely move the hash; different payloads are far
    val base = ("the quick brown fox jumps over the lazy dog " * 20).getBytes("UTF-8")
    val twin = base.clone()
    for (i <- twin.indices if i % 97 == 0)
      twin(i) = (((twin(i) & 0xFF) + 1) & 0xFF).toByte
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(Multimodal.aHash64(base), Multimodal.aHash64(twin)) <= 6)
    val other = ("completely different content with other words entirely " * 20)
      .getBytes("UTF-8")
    assert(ham(Multimodal.aHash64(base), Multimodal.aHash64(other)) > 6)
    // integration: output = exactly the planted (id, id + max + 1) pairs
    val rows = Multimodal.queries("multimodal_phash")(spark, sf0001).collect()
    val ids = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val mx = ids.max
    val expect = ids.filter(_ % 10 == 0).map(id => (id, id + mx + 1)).toSet
    val got = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(rows.forall(_.getAs[Int]("dist") <= 6))
  }
}
