package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  // 200 distinct words — same synthetic vocabulary as CountMinSpec, so
  // the two sketches are exercised on identical input
  private def synth = {
    val words = (0 until 200).map(i => s"w$i")
    spark.createDataFrame(words.map(Tuple1.apply)).toDF("w")
  }
  private def probeDf(terms: Seq[String]) =
    spark.createDataFrame(terms.map(Tuple1.apply)).toDF("term")

  private def hits(filter: DataFrame, terms: Seq[String], m: Int): Map[String, Long] =
    Bloom.probe(filter, probeDf(terms), m, "hit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("no false negatives at any filter size (the Bloom contract)") {
    val inserted = (0 until 200).map(i => s"w$i")
    for (m <- Seq(64, 128, 512, 4096)) {
      val h = hits(Bloom.build(synth, m), inserted, m)
      inserted.foreach { w =>
        assert(h(w) == 1L, s"false negative for $w at m=$m")
      }
    }
  }

  test("undersized filter false-positives; well-sized filter does not (pinned)") {
    val absent = (0 until 50).map(i => s"zz_nope$i")
    // 200 words x 4 bits into 64: fill ~1.0, every absent key passes
    val small = hits(Bloom.build(synth, 64), absent, 64)
    assert(absent.count(small(_) == 1L) > 40, "undersized filter should FP")
    // 4096 bits at fill ~0.18: fp ~ 0.1% — none of these 50 keys pass
    // (deterministic arithmetic, so a pinned fact, not a flaky draw)
    val big = hits(Bloom.build(synth, 4096), absent, 4096)
    assert(absent.forall(big(_) == 0L), "well-sized filter FP'd")
  }

  test("filters OR losslessly across shards (merge linearity)") {
    val a = synth.filter(length(col("w")) % 2 === 0)
    val b = synth.filter(length(col("w")) % 2 =!= 0)
    def words(df: DataFrame): Map[Long, Long] =
      Bloom.build(df, 512).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (wAll, wA, wB) = (words(synth), words(a), words(b))
    val keys = wA.keySet ++ wB.keySet
    assert(wAll.keySet == keys)
    keys.foreach { k =>
      assert(wAll(k) == (wA.getOrElse(k, 0L) | wB.getOrElse(k, 0L)), s"word $k")
    }
  }

  test("keyed filter: every inserted long key passes (join pre-filter contract)") {
    val keys = spark.createDataFrame(
      (1L to 500L).map(i => Tuple1(i * 37 + 11))).toDF("k")
    val fwords = Bloom.packKeyed(keys, 65536)
    val missed = keys.crossJoin(fwords)
      .filter(!Bloom.passes(col("k"), col("fwords"), 65536))
    assert(missed.count() == 0, "false negative in the keyed filter")
  }

  test("join_bloom: aggregate equals the plain join exactly; pre-filter actually filters") {
    val row = Bloom.queries("join_bloom")(spark, sf0001).collect()(0)
    val (nCand, nMatch, rev) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(nCand >= nMatch, "bloom dropped a matching row (false negative)")
    // independent plain-join replay — the technique's correctness claim
    val sel = graft.Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val plain = graft.Tables.lineitem(spark, sf0001)
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("rev")).collect()(0)
    assert(nMatch == plain.getLong(0))
    assert(rev == plain.getDouble(1), s"$rev vs ${plain.getDouble(1)}")
    // effectiveness: candidates are a tiny slice of the fact table
    val total = graft.Tables.lineitem(spark, sf0001).count()
    assert(nCand < total / 10, s"prefilter passed $nCand of $total rows")
  }

  test("sketch_bloom on the corpus: present words always hit, and the result is partitioning-independent") {
    val out = Bloom.queries("sketch_bloom")(spark, sf0001).collect()
    out.foreach { r =>
      if (r.getLong(1) == 1L) { // present => both filters must say yes
        assert(r.getLong(2) == 1L && r.getLong(3) == 1L, r.getString(0))
      }
      // m=512 ⊇ m=64 in failure only: a m512 hit with a m64 miss is
      // impossible for PRESENT terms (both hit); for absent terms the
      // two filters are independent — no cross-size assertion there
    }
    val tok = graft.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
    val base = Bloom.build(tok, 512).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shuffled = Bloom.build(tok.repartition(7), 512).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
  }
}
