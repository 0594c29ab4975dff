package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over the token vocabulary — the other
  * fixed-size set summary a 100 TB pipeline keeps next to the count-min
  * grid ([[CountMin]]): CM answers "how often", Bloom answers "have we
  * seen this at all" (URL/doc-id membership before a fetch, vocab
  * membership before a shuffle-heavy join). The filter is an m-bit
  * array packed into m/32 32-bit words: build cost is ONE scan emitting
  * k (word, bit) pairs per token, `bit_or`-combined map-side down to
  * ≤ m/32 rows — shuffle volume is CONSTANT in corpus size, and the
  * packed words OR losslessly across shards (the same merge-linearity
  * CM pins for counters). Membership = all k probed bits set: no false
  * negatives ever; false positives at rate ≈ fill^k.
  *
  * Everything is deterministic integer arithmetic (the CM char-poly
  * fingerprint, affine hash rows mod 1e9+7, shift/AND bit tests), so
  * the DuckDB oracle replays BOTH filters bit-for-bit — a hash-checked
  * sketch query, not rows-only.
  *
  * The query builds the same filter at two sizes on purpose:
  * m=512 over a ~31-word vocabulary is well-provisioned (fill ≈ 0.2,
  * fp ≈ 0.2⁴ ≈ 0.2%) and answers every probe exactly; m=64 is
  * deliberately undersized (fill ≈ 0.86, fp ≈ 0.55 per absent probe)
  * so the canonical failure mode — absent keys passing — is visible in
  * the oracle-pinned output rather than asserted abstractly. BloomSpec
  * additionally asserts the no-false-negative invariant at every size
  * and the sizing formula's fill prediction. Production sizing is
  * m = −n·ln(fp)/ln(2)², k = (m/n)·ln 2 — the words stay KBs for any
  * corpus.
  */
object Bloom {

  private val P = 1000000007L
  private val RowA = Seq(2654435761L, 1779033703L, 3144134277L, 1013904242L)
  private val RowB = Seq(7L, 1337L, 7919L, 104729L)

  /** Probe set: frequent corpus words, the rare tail word, and absent
    * keys chosen to exercise both outcomes of the undersized filter. */
  private val Probes = Seq(
    "join", "hash", "window", "spark", "the", "dup",
    "zz_absent", "qq_missing", "xx_nope", "yy_void", "absent_tok", "nul")

  /** CM char-polynomial fingerprint (see [[CountMin]]): first 4 code
    * points horner-folded base 31, ×131 + length. */
  private def fp(w: Column): Column = {
    def a(i: Int) = ascii(substring(w, i, 1)).cast("long")
    (((a(1) * 31 + a(2)) * 31 + a(3)) * 31 + a(4)) * 131 +
      length(w).cast("long")
  }

  /** The k bit positions of a fingerprint in an m-bit filter. */
  private def positions(f: Column, m: Int): Column =
    array(RowA.zip(RowB).map { case (ai, bi) =>
      pmod(f * ai + bi, lit(P)) % m
    }: _*)

  /** Packed filters at every requested size from ONE pass over the
    * tokens: each row emits sizes×k tagged (m, pos) structs in-row, and
    * the single `bit_or` aggregate combines map-side — the shuffle
    * carries ≤ Σ m/32 rows whatever the corpus size, and the corpus is
    * scanned once however many filter sizes are kept (the query builds
    * two; a production pipeline sizing-sweep would build more). Filters
    * from different shards OR losslessly. */
  private[sketch] def buildAll(tokens: DataFrame, sizes: Seq[Int]): DataFrame = {
    val entries = for { m <- sizes; (ai, bi) <- RowA.zip(RowB) }
      yield struct(lit(m).as("m"),
        (pmod(fp(col("w")) * ai + bi, lit(P)) % m).as("pos"))
    tokens
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.m").as("m"), shiftright(col("e.pos"), 5).as("word"),
        expr("shiftleft(1L, CAST(e.pos % 32 AS INT))").as("bitv"))
      .groupBy(col("m"), col("word"))
      .agg(expr("bit_or(bitv)").as("bits"))
  }

  /** One filter: (word, bits), at most m/32 rows. */
  private[sketch] def build(tokens: DataFrame, m: Int): DataFrame =
    buildAll(tokens, Seq(m)).drop("m")

  /** Membership: 1 iff every one of the k probed bits is set. The probe
    * side touches only the ≤ m/32-row filter (broadcast by AQE). */
  private[sketch] def probe(filter: DataFrame, probes: DataFrame,
                            m: Int, out: String): DataFrame =
    probes
      .select(col("term"), explode(positions(fp(col("term")), m)).as("pos"))
      .withColumn("word", shiftright(col("pos"), 5))
      .join(filter, Seq("word"), "left")
      .withColumn("hit",
        when(coalesce(col("bits"), lit(0L))
          .bitwiseAND(expr("shiftleft(1L, CAST(pos % 32 AS INT))")) =!= 0,
          lit(1L)).otherwise(lit(0L)))
      .groupBy(col("term"))
      .agg(min(col("hit")).as(out))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-probe membership under the well-sized and undersized filter
    // next to exact presence. At production scale the exact column is
    // the scan you CANNOT afford per probe and drops away; here it
    // makes the no-false-negative contract oracle-visible.
    "sketch_bloom" -> ((s, d) => {
      val tok = graft.Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
      val probes = s.createDataFrame(Probes.map(Tuple1.apply)).toDF("term")
      // both filters from one corpus scan; the combined frame is ≤ 18
      // rows, persisted so the two probe joins don't re-scan the corpus
      // (reclaimed by the EmfPlanner registry after the action)
      val filters = buildAll(tok, Seq(512, 64)).persist()
      graft.emf.EmfPlanner.registerPersisted(filters)
      val big = probe(filters.filter(col("m") === 512).drop("m"),
        probes, 512, "hit_m512")
      val small = probe(filters.filter(col("m") === 64).drop("m"),
        probes, 64, "hit_m64")
      val exact = tok.filter(col("w").isin(Probes: _*))
        .groupBy(col("w")).agg(lit(1L).as("present"))
      big
        .join(small, Seq("term"))
        .join(exact, big("term") === exact("w"), "left")
        .select(col("term"), coalesce(col("present"), lit(0L)).as("present"),
          col("hit_m512"), col("hit_m64"))
        .orderBy(col("term"))
    }),

    // Bloom-join: a selective orders predicate (~0.7% of keys) builds
    // the filter; lineitem rows are pre-filtered in the scan stage and
    // only candidates reach the exact join. Output pins BOTH the
    // pre-filter's candidate count (a deterministic bloom artifact the
    // oracle replays) and the exact join aggregate (identical to a
    // plain join — the correctness claim of the technique).
    "join_bloom" -> ((s, d) => {
      val sel = graft.Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .select(col("o_orderkey"))
      val fwords = packKeyed(sel.select(col("o_orderkey").as("k")), JoinM)
      val cand = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .withColumn("hf", foldedKey(col("l_orderkey")))
        .crossJoin(broadcast(fwords))
        .filter(passesFolded(col("hf"), col("fwords"), JoinM))
        .drop("fwords", "hf")
        .persist() // candidates are ~the match set; the two consumers
                   // below must not re-scan the fact table
      graft.emf.EmfPlanner.registerPersisted(cand)
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val dec2 = (c: Column) => c.cast("decimal(18,2)")
      val joined = cand
        .join(sel, cand("l_orderkey") === sel("o_orderkey"))
        .agg(count(lit(1)).as("n_matched"),
          sum(dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
      nCand.crossJoin(joined)
    }))

  // ---------------------------------------------------------------
  // Bloom-join pre-filter: the warehouse "bloom join". A selective
  // dimension-side predicate yields few join keys; a Bloom filter of
  // those keys is broadcast as ONE map-typed row and applied to the
  // fact side IN THE SCAN STAGE, so non-matching fact rows die before
  // they reach the join — at 100 TB this is the difference between
  // shuffling the whole fact table and shuffling ~the match set. The
  // result is EXACT: no false negatives by construction, and the join
  // itself removes the (rare) false positives — which is why the
  // DuckDB oracle can hash-check the aggregate against the identical
  // semantics. m = 2¹⁶ bits (2 KB packed) keeps fp ≈ 10⁻⁵ at this
  // key count; production sizes m to the key count, and Spark's own
  // runtime-filter feature does the same thing planner-side — this
  // query makes the mechanism explicit and oracle-checkable.
  // ---------------------------------------------------------------

  private val JoinM = 65536

  /** The k bit positions of a LONG key: two-round xorshift mix
    * ([[Hll.mix]]), folded mod 2³¹−1 so the affine products never
    * overflow (hf·a ≤ 2³¹·2654435761 ≈ 5.7·10¹⁸ < 2⁶³), then the CM
    * hash rows. The fold is the fp floor — two keys that collide mod
    * 2³¹−1 share ALL positions — so fp ≈ fill^k + |keys|/2³¹, which
    * stays ≪ 10⁻³ into the hundreds of thousands of keys; a narrower
    * fold (10⁶) was measurably the dominant fp source at 15k probed
    * keys. */
  private def foldedPositions(hf: Column, m: Int): Seq[Column] =
    RowA.zip(RowB).map { case (ai, bi) => pmod(hf * ai + bi, lit(P)) % m }

  /** The folded key hash, as its own column: computing it ONCE in a
    * codegen'd scan-side Project (rather than letting each of the k
    * conjuncts of the filter re-derive it inside the join condition,
    * which BroadcastNestedLoopJoin evaluates interpreted) keeps the
    * per-row interpreted work to 4 affine-map array lookups. */
  private[sketch] def foldedKey(k: Column): Column =
    pmod(Hll.mix(k), lit(2147483647L))

  private def keyPositions(k: Column, m: Int): Seq[Column] =
    foldedPositions(foldedKey(k), m)

  /** Packed filter over a frame of long keys (column `k`). */
  private[sketch] def buildKeyed(keys: DataFrame, m: Int): DataFrame =
    keys
      .select(explode(array(keyPositions(col("k"), m): _*)).as("pos"))
      .select(shiftright(col("pos"), 5).as("word"),
        expr("shiftleft(1L, CAST(pos % 32 AS INT))").as("bitv"))
      .groupBy(col("word"))
      .agg(expr("bit_or(bitv)").as("bits"))

  /** The filter as ONE row holding a DENSE array of m/32 packed words
    * (index = word id, missing words zero-filled), broadcastable next
    * to any scan. Dense-array indexing matters: `element_at` on an
    * ARRAY is O(1), while on a MAP it is a linear scan of all entries
    * (Spark's ArrayBasedMapData carries no hash index) — the map form
    * measured 50× slower on the fact-side filter at m = 2¹⁶. The
    * one-time densification walks the KB-sized word map once. */
  private[sketch] def packKeyed(keys: DataFrame, m: Int): DataFrame =
    buildKeyed(keys, m)
      .agg(map_from_arrays(collect_list(col("word")),
        collect_list(col("bits"))).as("wm"))
      .select(transform(sequence(lit(0L), lit((m / 32 - 1).toLong)),
        i => coalesce(element_at(col("wm"), i), lit(0L))).as("fwords"))

  /** All-k-bits-set test against the packed dense-array column — pure
    * per-row arithmetic (O(1) array indexing + shift/AND), no join, no
    * shuffle. */
  private[sketch] def passes(key: Column, fwords: Column, m: Int): Column =
    passesFolded(foldedKey(key), fwords, m)

  /** Same test over a pre-folded key column (see [[foldedKey]]). */
  private[sketch] def passesFolded(hf: Column, fwords: Column, m: Int): Column =
    foldedPositions(hf, m).map { pos =>
      element_at(fwords, (shiftright(pos, 5) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (pos % 32).cast("int"))) =!= 0
    }.reduce(_ && _)

  private def valuesRows: String = RowA.zip(RowB).zipWithIndex
    .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")

  def oracle: Map[String, String] = Map(
    // identical fingerprint/position arithmetic; both packed filters
    // rebuilt bit-for-bit in SQL
    "sketch_bloom" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |fp AS (
         |  SELECT w,
         |    (((ascii(substring(w,1,1)) * 31 + ascii(substring(w,2,1))) * 31
         |       + ascii(substring(w,3,1))) * 31 + ascii(substring(w,4,1)))
         |      * 131 + length(w) AS f
         |  FROM tok),
         |hashes(j, a, b) AS (VALUES $valuesRows),
         |b512 AS (
         |  SELECT pos // 32 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
         |  FROM (SELECT (f * a + b) % $P % 512 AS pos
         |        FROM fp CROSS JOIN hashes) GROUP BY 1),
         |b64 AS (
         |  SELECT pos // 32 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
         |  FROM (SELECT (f * a + b) % $P % 64 AS pos
         |        FROM fp CROSS JOIN hashes) GROUP BY 1),
         |probes AS (SELECT unnest(['${Probes.mkString("','")}']) AS term),
         |pf AS (
         |  SELECT term,
         |    (((ascii(substring(term,1,1)) * 31 + ascii(substring(term,2,1)))
         |       * 31 + ascii(substring(term,3,1))) * 31
         |       + ascii(substring(term,4,1))) * 131 + length(term) AS f
         |  FROM probes),
         |h512 AS (
         |  SELECT term, CAST(min(CASE WHEN coalesce(bits, 0)
         |      & (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) <> 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS hit_m512
         |  FROM (SELECT term, (f * a + b) % $P % 512 AS pos
         |        FROM pf CROSS JOIN hashes) p
         |  LEFT JOIN b512 ON b512.word = p.pos // 32 GROUP BY term),
         |h64 AS (
         |  SELECT term, CAST(min(CASE WHEN coalesce(bits, 0)
         |      & (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) <> 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS hit_m64
         |  FROM (SELECT term, (f * a + b) % $P % 64 AS pos
         |        FROM pf CROSS JOIN hashes) p
         |  LEFT JOIN b64 ON b64.word = p.pos // 32 GROUP BY term),
         |exact AS (
         |  SELECT w, CAST(1 AS BIGINT) AS present FROM tok
         |  WHERE w IN ('${Probes.mkString("','")}') GROUP BY w)
         |SELECT h512.term, CAST(coalesce(exact.present, 0) AS BIGINT)
         |    AS present,
         |  h512.hit_m512, h64.hit_m64
         |FROM h512 JOIN h64 USING (term)
         |LEFT JOIN exact ON h512.term = exact.w
         |ORDER BY h512.term""".stripMargin,

    // the same key mix / fold / affine-position / packed-word
    // arithmetic replayed over the distinct fact keys (the bloom test
    // depends only on the key, so testing distinct keys == testing
    // rows); the join aggregate is the plain exact join
    "join_bloom" ->
      s"""WITH sel AS (
         |  SELECT o_orderkey FROM orders
         |  WHERE o_orderpriority = '1-URGENT'
         |    AND o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate < TIMESTAMP '1995-04-01'),
         |hashes(j, a, b) AS (VALUES $valuesRows),
         |kh1 AS (
         |  SELECT o_orderkey,
         |    ${Hll.mixSql1("o_orderkey")} AS h1
         |  FROM sel),
         |kh AS (
         |  SELECT o_orderkey,
         |    ${Hll.mixSql2("h1")} % 2147483647 AS hf
         |  FROM kh1),
         |bloom AS (
         |  SELECT pos // 32 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
         |  FROM (SELECT (hf * a + b) % $P % $JoinM AS pos
         |        FROM kh CROSS JOIN hashes) GROUP BY 1),
         |lkeys AS (SELECT DISTINCT l_orderkey FROM lineitem),
         |lh1 AS (
         |  SELECT l_orderkey,
         |    ${Hll.mixSql1("l_orderkey")} AS h1
         |  FROM lkeys),
         |lh AS (
         |  SELECT l_orderkey,
         |    ${Hll.mixSql2("h1")} % 2147483647 AS hf
         |  FROM lh1),
         |lpass AS (
         |  SELECT l_orderkey,
         |    min(CASE WHEN coalesce(bits, 0)
         |        & (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) <> 0
         |      THEN 1 ELSE 0 END) AS pass
         |  FROM (SELECT l_orderkey, (hf * a + b) % $P % $JoinM AS pos
         |        FROM lh CROSS JOIN hashes) p
         |  LEFT JOIN bloom ON bloom.word = p.pos // 32
         |  GROUP BY l_orderkey),
         |cand AS (
         |  SELECT l.l_orderkey, l.l_extendedprice, l.l_discount
         |  FROM lineitem l JOIN lpass USING (l_orderkey) WHERE pass = 1),
         |n1 AS (SELECT CAST(count(1) AS BIGINT) AS n_candidates FROM cand),
         |j AS (
         |  SELECT CAST(count(1) AS BIGINT) AS n_matched,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
         |      AS DOUBLE) AS revenue
         |  FROM cand JOIN sel ON cand.l_orderkey = sel.o_orderkey)
         |SELECT n1.n_candidates, j.n_matched, j.revenue
         |FROM n1 CROSS JOIN j""".stripMargin)
}
