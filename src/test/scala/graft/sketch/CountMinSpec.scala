package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  // scala replay of the fingerprint/bucket arithmetic (mirrors both the
  // Spark expressions and the oracle SQL)
  private def fp(w: String): Long = {
    def a(i: Int): Long = if (i <= w.length) w.charAt(i - 1).toLong else 0L
    (((a(1) * 31 + a(2)) * 31 + a(3)) * 31 + a(4)) * 131 + w.length
  }
  private val rows = Seq((2654435761L, 7L), (1779033703L, 1337L),
    (3144134277L, 7919L), (1013904242L, 104729L))
  private def cells(w: String): Seq[(Int, Long)] =
    rows.zipWithIndex.map { case ((a, b), j) =>
      j -> ((fp(w) * a + b) % 1000000007L % 64)
    }

  // 200 distinct words, word i appearing i%7+1 times: vocabulary 3x the
  // sketch width, so every hash row MUST collide (pigeonhole)
  private def synth = {
    val words = (0 until 200).flatMap(i => Seq.fill(i % 7 + 1)(s"w$i"))
    spark.createDataFrame(words.map(Tuple1.apply)).toDF("w")
  }

  test("estimates never under-count, and over-counting actually occurs at 200 words") {
    val sk = CountMin.sketch(synth).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = (0 until 200).map(i => s"w$i" -> (i % 7 + 1).toLong).toMap
    val est = exact.keys.map { w =>
      w -> cells(w).map(c => sk.getOrElse(c, 0L)).min
    }.toMap
    exact.foreach { case (w, n) =>
      assert(est(w) >= n, s"$w under-counted: ${est(w)} < $n")
    }
    // 200 words into 4x64 cells: with this fixed hash some word's four
    // cells are all shared — the canonical CM over-count (deterministic,
    // so this is a pinned fact about the arithmetic, not a flaky draw)
    assert(exact.exists { case (w, n) => est(w) > n }, "no collision bit")
  }

  test("sketch is linear: shard sketches sum to the corpus sketch") {
    val all = synth
    val a = all.filter(length(col("w")) % 2 === 0)
    val b = all.filter(length(col("w")) % 2 =!= 0)
    def m(df: org.apache.spark.sql.DataFrame) =
      CountMin.sketch(df).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (mAll, mA, mB) = (m(all), m(a), m(b))
    val keys = mA.keySet ++ mB.keySet
    assert(mAll.keySet == keys)
    keys.foreach { k =>
      assert(mAll(k) == mA.getOrElse(k, 0L) + mB.getOrElse(k, 0L), s"$k")
    }
  }

  test("sketch_cms on the corpus: bound holds and the result is partitioning-independent") {
    val out = CountMin.queries("sketch_cms")(spark, sf0001).collect()
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"${r.getString(0)} under-counts")
    }
    val shuffled = CountMin.sketch(
      CountMin.tokens(spark, sf0001).repartition(7)).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val base = CountMin.sketch(CountMin.tokens(spark, sf0001)).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(shuffled == base)
  }
}
