package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  /** Planted near-dup id offset = corpus-derived stride (max(doc_id)+1,
    * mirroring [[Dedup.docsWithNearDups]]). */
  private lazy val docStride: Long = graft.Tables.documents(spark, sf0001)
    .agg(max(col("doc_id"))).head.getLong(0) + 1

  test("dedup_clusters: label propagation equals transitive closure of pairs") {
    val pairs = Dedup.queriesNgramPairs(spark, sf0001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = Dedup.queries("dedup_clusters")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    // every edge's endpoints share a cluster
    pairs.foreach { case (a, b) => assert(labels(a) == labels(b)) }
    // cluster representative = min member id; singletons label themselves
    val byCluster = labels.groupBy(_._2)
    byCluster.foreach { case (c, m) => assert(m.keys.min == c) }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.collect { case (id, c) if !paired(id) => assert(c == id) }
    // reference union-find over the pairs gives the identical partition
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    labels.foreach { case (id, c) => assert(find(id) == c) }
  }

  test("split_leakage_safe: clusters never straddle; the doc-keyed hash would") {
    val rows = Dedup.queries("split_leakage_safe")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    // the audit column: zero clusters in more than one split
    rows.foreach(r => assert(r.getLong(3) == 0L, r.toString))
    // census consistency: every doc and every cluster counted exactly once
    val labels = Dedup.queries("dedup_clusters")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_.getLong(1)).sum == labels.length.toLong)
    assert(rows.map(_.getLong(2)).sum == labels.map(_._2).distinct.length.toLong)
    // scalar replay: cluster-keyed xorshift bucket reproduces the census
    def bucket(x: Long): Long = {
      val m = (x % 1000003L) * 2654435761L
      (m ^ (m >> 13)) % 10L
    }
    def split(b: Long) = if (b < 8) "train" else if (b == 8) "val" else "test"
    val expect = labels.groupBy { case (_, c) => split(bucket(c)) }
      .map { case (s, m) => s -> (m.length.toLong, m.map(_._2).distinct.length.toLong) }
    rows.foreach { r =>
      assert(expect(r.getString(0)) == ((r.getLong(1), r.getLong(2))), r.toString)
    }
    // the contrast that motivates the operator: hashing doc_id directly
    // (sample_split's rule) DOES tear at least one near-dup cluster apart
    val straddled = labels.groupBy(_._2).values.exists { members =>
      members.map { case (id, _) => split(bucket(id)) }.distinct.length > 1
    }
    assert(straddled,
      "fixture never shows leakage: doc-keyed split kept every cluster whole")
  }

  test("connectedComponents: multi-hop chain converges; diameter cap refuses") {
    import spark.implicits._
    // chain 0-1-2-...-9 plus isolated 100: one 10-node component needs
    // ~9 propagation rounds to pull node 9 down to label 0
    val nodes = ((0L to 9L) :+ 100L).toDF("doc_id")
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(nodes, chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).foreach(i => assert(labels(i) == 0L))
    assert(labels(100L) == 100L)
    // a cap below the diameter must fail loudly, never return wrong labels
    val e = intercept[IllegalArgumentException](
      Dedup.connectedComponents(nodes, chain, maxRounds = 3))
    assert(e.getMessage.contains("not converged"))
  }

  test("connectedComponents: reliable-checkpoint mode matches local mode") {
    import spark.implicits._
    val nodes = ((0L to 9L) :+ 100L).toDF("doc_id")
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // without a checkpoint dir the reliable mode must refuse up front
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty)
    val e = intercept[IllegalArgumentException](
      Dedup.connectedComponents(nodes, chain, reliableCheckpointEvery = 4))
    assert(e.getMessage.contains("setCheckpointDir"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val local = Dedup.connectedComponents(nodes, chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Dedup
        .connectedComponents(nodes, chain, reliableCheckpointEvery = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      // the reliable run actually wrote checkpoint data to the dir
      def nFiles(p: java.io.File): Int =
        if (p.isDirectory) p.listFiles.map(nFiles).sum else 1
      assert(nFiles(dir.toFile) > 0)
    } finally {
      // shared JVM-wide session: don't leak the checkpoint dir setting
      sc.setCheckpointDir(null)
    }
  }

  test("exact dedup collapses identical texts only") {
    import spark.implicits._
    val out = Dedup.queries("dedup_exact")(spark, sf0001)
    // augmented corpus = 500 base + 500 near (none identical) → 1000 groups
    assert(out.count() == 1000)
    assert(out.agg(max($"n_copies")).head.getLong(0) == 1L)
  }

  test("minhash LSH finds every base↔near-dup pair (recall vs exact jaccard)") {
    val exact = Dedup.queries("dedup_ngram")(spark, sf0001)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(spark, sf0001, k = 32, bands = 8, tau = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes precision exact; recall on the ~0.95-jaccard
    // planted pairs must be total at 8 bands × 4 rows
    val planted = exact.filter { case (a, b) => b == a + docStride }
    assert(planted.nonEmpty)
    assert(planted.subsetOf(lsh),
      s"missed ${(planted -- lsh).size} of ${planted.size} planted pairs")
    // LSH output ⊆ exact (verification filter)
    assert(lsh.subsetOf(exact))
  }

  test("dedup_containment: scalar shingle-set replay; catches what Jaccard misses") {
    val out = Dedup.queries("dedup_containment")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // scalar reference: string shingles, df cap, min-side containment
    val texts = Dedup.docsWithNearDups(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length <= 3) Set(ws.mkString(" "))
      else (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val raw = texts.map { case (id, t) => id -> shingles(t) }
    val df = raw.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val capped = raw.map { case (id, sh) =>
      id -> sh.filter(df(_) <= 32) }.filter(_._2.nonEmpty).toMap
    val want = (for {
      Seq((a, sa), (b, sb)) <- capped.toSeq.sortBy(_._1).combinations(2)
      i = (sa & sb).size.toLong
      m = math.min(sa.size, sb.size).toLong
      if i * 10 >= m * 9
    } yield (a, b) -> (i, m,
      BigDecimal(i.toDouble / m).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(out == want,
      s"missing=${(want.keySet -- out.keySet).take(5)} " +
        s"extra=${(out.keySet -- want.keySet).take(5)}")
    // non-vacuous + the asymmetry itself: containment dominates Jaccard
    // pointwise (I/min ≥ I/union), STRICTLY whenever set sizes differ —
    // which the planted drop-one-word near-dups guarantee. (This corpus
    // plants no small-inside-big docs, so set-level yield beyond J ≥ 0.6
    // would be a vacuous check here; the small-in-big semantics are
    // pinned scalar-level below.)
    val jd = Dedup.queries("dedup_ngram")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.nonEmpty)
    val shared = out.keySet & jd.keySet
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(out(k)._3 >= jd(k) - 1e-9, s"$k: cont ${out(k)._3} < J ${jd(k)}") }
    assert(shared.exists(k => out(k)._3 > jd(k) + 1e-9),
      "no pair with containment strictly above Jaccard")
    // small-in-big: a 10-shingle doc fully inside a 40-shingle doc is
    // invisible to J ≥ 0.6 (J ≤ 0.25) but containment-1.0 — the exact
    // integer predicates the query and oracle share
    val (i, mSmall, big) = (10L, 10L, 40L)
    assert(i * 10 >= mSmall * 9 && i.toDouble / (mSmall + big - i) < 0.6)
  }

  test("simhash: planted near-dups are within hamming 6 and reported") {
    val out = Dedup.queries("dedup_simhash")(spark, sf0001)
    val pairs = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = pairs.filter { case (a, b) => b == a + docStride }
    // single-word deletion flips few bits; expect most planted pairs found
    assert(planted.size > 400, s"only ${planted.size} planted pairs within distance")
  }

  test("fast signature expressions equal the functions._ reference forms") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001).limit(50)
    val sim = docs.select(
      Dedup.simhash64(col("text")).as("ref"),
      SignatureExprs.simhash64Fast(col("text")).as("fast")).collect()
    sim.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // byte-walk tokenization edges: empty string (one empty word),
    // leading/trailing/consecutive separators, multi-byte words
    val edges = Seq("", " ", "  a  b ", "é ü é", "single")
      .toDF("text")
      .select(Dedup.simhash64(col("text")).as("ref"),
        SignatureExprs.simhash64Fast(col("text")).as("fast")).collect()
    edges.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val mh = docs
      .withColumn("sh", Dedup.shingles(col("text"), 3))
      .select(Dedup.minhash(col("sh"), 8).as("ref"),
        SignatureExprs.minhashFast(col("sh"), 8).as("fast")).collect()
    mh.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("LongSet/LongCounter: growth, zero key, collision chains") {
    val s = new LongSet(2) // forces several grows
    val rnd = new scala.util.Random(7)
    val ks = Array.fill(5000)(rnd.nextLong()) ++ Array(0L, 0L, Long.MinValue)
    val ref = scala.collection.mutable.Set[Long]()
    ks.foreach { k => assert(s.add(k) == ref.add(k)) }
    assert(s.size == ref.size)
    val c = new LongCounter(2)
    val refC = scala.collection.mutable.Map[Long, Int]()
    val keyed = Array.fill(3000)(rnd.nextLong() & 0xFFL) :+ 0L :+ 0L // heavy repeats
    keyed.foreach { k =>
      val want = refC.updateWith(k)(v => Some(v.getOrElse(0) + 1)).get
      assert(c.inc(k) == want)
    }
  }

  test("shingles: n-gram construction and short-text edge cases") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set("a b"))
    assert(got(2) == Set("x"))
  }

  test("shingleHashes (fused byte-walk) equals hash-of-string-shingles") {
    import spark.implicits._
    // corpus parity: element order AND values (first-occurrence distinct)
    val corpus = graft.Tables.documents(spark, sf0001)
      .select(
        transform(Dedup.shingles(col("text"), 3), x => xxhash64(x)).as("ref"),
        SignatureExprs.shingleHashes(col("text"), 3).as("fast"))
      .filter(col("ref") =!= col("fast")).count()
    assert(corpus == 0L)
    // edges: short text, single word, empty string, repeated shingles
    // (dedup keeps first occurrence), multi-space (empty words), trailing
    // space, multi-byte UTF-8 words
    val edges = Seq("a b c d", "a b", "x", "", "a  b", "a b ",
      "a b a b a b a b", "héllo wörld a b", "a b c a b c")
      .toDF("text")
      .select(
        transform(Dedup.shingles(col("text"), 3), x => xxhash64(x)).as("ref"),
        SignatureExprs.shingleHashes(col("text"), 3).as("fast"),
        col("text"))
      .collect()
    edges.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"'${r.getString(2)}'")
    }
    // minhash from hashes == minhash from strings (same h1 chain)
    val mh = graft.Tables.documents(spark, sf0001).limit(100)
      .select(
        SignatureExprs.minhashFast(Dedup.shingles(col("text"), 3), 8).as("ref"),
        SignatureExprs.minhashFromHashes(
          SignatureExprs.shingleHashes(col("text"), 3), 8).as("fast"))
      .collect()
    mh.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("dedup_recall: score identities and banding monotonicity") {
    val row = Dedup.queries("dedup_recall")(spark, sf0001).head
    val (nTruth, nFound, nHit) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    val (recall, precision) = (row.getDouble(3), row.getDouble(4))
    assert(nTruth > 0 && nFound > 0)
    assert(nHit <= math.min(nTruth, nFound))
    assert(recall == nHit.toDouble / nTruth)
    assert(precision == nHit.toDouble / nFound)
    // Banding monotonicity: a single 32-row band fires only when ALL 32
    // minhash values agree, which implies every 4-row band of the 8×4
    // scheme agrees too — so the coarse scheme's verified pairs are a
    // subset of the default scheme's (caps aside; buckets here are tiny).
    // This is the deterministic face of "more bands, higher recall".
    val fine = Dedup.minhashPairs(spark, sf0001, k = 32, bands = 8, tau = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val coarse = Dedup.minhashPairs(spark, sf0001, k = 32, bands = 1, tau = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(coarse.subsetOf(fine))
    assert(fine.size == nFound)
  }
}
