package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-set preparation operators (north-star surface; the reference
  * has nothing comparable — its single `sales` table never feeds a
  * training pipeline).
  *
  * Scale design (100 TB):
  *  - '''Sequence packing''' ([[queries]] `pack_sequences`) is the
  *    standard concat-and-chunk pretraining layout: documents are laid
  *    end-to-end in a deterministic order and cut into fixed token-budget
  *    bins. Lowered as a running-sum window partitioned by `lang` —
  *    each partition's packing is independent, so at corpus scale the
  *    window key becomes (lang, shard) and no global sort exists. The
  *    running sum is one sort per partition, no joins, no driver state.
  *  - '''Deterministic splits''' (`sample_split`): train/val/test by
  *    multiplicative hash of the stable doc id — re-running the pipeline
  *    (or re-partitioning the cluster) never moves a document across
  *    splits, unlike RNG sampling. Pure map + one aggregation for the
  *    stratification audit.
  */
object DatasetPrep {

  /** Tokens per packed bin. */
  val ctxLen = 512

  /** Whitespace token count, as a BIGINT on both engines. */
  private def nTok = size(split(col("text"), " ")).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Concat-and-chunk packing: per-lang running token offset; a doc's
    // bin is the chunk its first token lands in. Deterministic layout
    // (ordered by doc_id within lang).
    "pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), nTok.as("n_tok"))
        .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin_id", floor(col("start_off") / lit(ctxLen)))
        .orderBy(col("doc_id"))
    }),

    // Symmetric int8 embedding quantization (max-abs scale): 4× smaller
    // than float32 before the corpus ships to an ANN index or a training
    // run. One codegen'd zero-shuffle pass (QuantizeI8Expr); rounding is
    // half-away-from-zero with exact tie detection, mirroring C/DuckDB
    // round(double) bit-for-bit. float→double widening is exact, so both
    // engines quantize identical values.
    "emb_quantize" -> ((s, d) => {
      val q = graft.ann.QuantExprs.quantizeI8(
        col("embedding").cast("array<double>"))
      Tables.embeddings(s, d)
        .select(col("vec_id"), q.as("q"))
        .select(
          col("vec_id"),
          col("q.dim").as("dim"),
          col("q.scale").as("scale"),
          // serialized form: the compare layer (driver + check_oracle)
          // stringifies values, so array columns ship as joined strings
          array_join(col("q.qvec").cast("array<string>"), ",").as("qvec"))
        .orderBy(col("vec_id"))
    }),

    // Overlapping sliding-window chunking (the RAG / retrieval-index
    // layout): 50-word chunks on a 40-word stride, so consecutive
    // chunks share 10 words and no query phrase straddles a boundary
    // unseen. Chunk generation is IN-ROW (sequence → slice → explode, a
    // narrow ~1.25× row expansion) — no join, no shuffle; at 100 TB
    // chunking is scan-bound. The final ORDER BY is oracle determinism
    // only.
    "chunk_overlap" -> ((s, d) => {
      val ck = 50
      val stride = 40
      val ws = split(col("text"), " ")
      // ceil(n/stride) in exact int arithmetic (int+int `/` is a double
      // divide in Spark — exact at these magnitudes, floor recovers it)
      val num = floor((size(ws) + lit(stride - 1)) / lit(stride)).cast("int")
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), num - 1), i =>
            struct(i.as("chunk_id"),
              slice(ws, i * stride + 1, lit(ck)).as("cw")))).as("c"))
        .select(col("doc_id"),
          col("c.chunk_id").as("chunk_id"),
          size(col("c.cw")).as("n_chunk_words"),
          array_join(col("c.cw"), " ").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Skip-gram (center, context) pair counts, forward window 1..2 —
    // the extraction pass of word-embedding training data. Pairs are
    // generated IN-ROW from the token array (two shifted zips — narrow,
    // ~2 rows out per token) and counted by ONE pair-keyed hash
    // aggregation with map-side combine: shuffle volume is bounded by
    // distinct pairs per partition (≲ vocab²), NOT corpus tokens. The
    // positional self-join formulation (token table joined to itself on
    // doc and pos-distance) shuffles every token occurrence twice; the
    // oracle uses exactly that formulation as the independent mirror.
    "skipgram_pairs" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val n = size(ws)
      // (center, context-at-+dist) pairs as two shifted slices zipped;
      // greatest(...) keeps the slice length at 0 for docs shorter than
      // the window (sequence/when formulations hit Spark's descending-
      // sequence and empty-array-typing traps here)
      def shifted(dist: Int): Column =
        zip_with(
          slice(ws, lit(1), greatest(n - dist, lit(0))),
          slice(ws, lit(dist + 1), greatest(n - dist, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))
      Tables.documents(s, d)
        .select(explode(concat(shifted(1), shifted(2))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
    }),

    // Tokenization against a corpus-learned vocabulary: word ids by
    // frequency rank (ties alphabetical — fully deterministic), then
    // every document re-emitted as its id sequence. The vocab build is
    // one word-count shuffle (vocab-sized output) + one rank sort of
    // the VOCAB (not the corpus); the corpus-side encoding is ZERO
    // shuffle — the vocab ships as a broadcast map column and the id
    // lookup is an in-row transform over the token array, so encoding
    // 100 TB is scan-bound. (At web-scale vocab the single-partition
    // rank sort becomes a two-level rank — count-bucket then within —
    // same output, still vocab-sized.)
    "tokenize_ids" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val docs = Tables.documents(s, d)
      val vocab = docs.select(explode(ws).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .select(col("w"), row_number().over(
          Window.orderBy(col("n").desc, col("w"))).as("id"))
      val vmap = vocab
        .agg(map_from_entries(collect_list(struct(col("w"), col("id"))))
          .as("vm"))
      docs.crossJoin(broadcast(vmap))
        .select(col("doc_id"), size(ws).as("n_tok"),
          array_join(transform(ws,
            w => element_at(col("vm"), w).cast("string")), ",").as("ids"))
        .orderBy(col("doc_id"))
    }),

    // Stratified split audit: deterministic 80/10/10 by a
    // multiply-xorshift mix of doc_id (a bare multiplicative mod-10
    // would collapse to doc_id's last digit — the xorshift folds the
    // high bits back in); counts + token mass per (lang, split).
    // The id is reduced mod 1000003 (prime) BEFORE the multiply so the
    // product stays < 2.7e15 — no ANSI overflow at any corpus id scale
    // (ids 1000003 apart share a split, which is harmless for splitting).
    // Deterministic fixed-size per-group sample — reservoir-sampling
    // SEMANTICS (exactly k uniform-at-random docs per language) without
    // the RNG: rank every doc by the shared multiplicative-xorshift
    // hash of its stable id and keep the k smallest, ties broken by
    // doc_id. Hash order is uniform, so the k kept docs are a uniform
    // k-subset — but unlike a streamed reservoir the result is
    // reproducible under any partitioning, any arrival order, and any
    // rerun, and it COMPOSES with the other hash samplers (a doc's keep
    // fate everywhere is one function of its id). Scale shape: a naive
    // rank-per-group is one sort of the whole group; instead level 1
    // takes top-k within (lang, salt-of-16) — Spark's window top-k
    // filter prunes these sorts to per-partition heaps of k — and
    // level 2 re-ranks the surviving ≤ 16k rows per lang. The global
    // top-k is always inside the union of per-salt top-ks, so the
    // two-level form is EXACT (the emb_prototypes argument), and the
    // wide shuffle carries (lang, salt)-keyed slivers, never whole
    // languages.
    "sample_reservoir" -> ((s, d) => {
      val k = 8
      val lvl1 = Window.partitionBy(col("lang"), col("salt"))
        .orderBy(col("bucket"), col("doc_id"))
      val lvl2 = Window.partitionBy(col("lang"))
        .orderBy(col("bucket"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          CorpusOps.bucket1M(col("doc_id")).as("bucket"))
        .withColumn("salt", pmod(col("doc_id"), lit(16)))
        .withColumn("r1", row_number().over(lvl1))
        .filter(col("r1") <= k)
        .select(col("lang"), col("doc_id"), col("bucket"),
          row_number().over(lvl2).as("rnk"))
        .filter(col("rnk") <= k)
        .select(col("lang"), col("rnk"), col("doc_id"), col("bucket"))
        .orderBy(col("lang"), col("rnk"))
    }),

    "sample_split" -> ((s, d) => {
      val m = pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L)
      val bucket = pmod(m.bitwiseXOR(shiftright(m, 13)), lit(10))
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(nTok).as("n_tokens"))
        .orderBy(col("lang"), col("split"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "pack_sequences" ->
      """SELECT doc_id, lang,
        |  len(string_split(text, ' ')) AS n_tok,
        |  CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
        |    PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS start_off,
        |  CAST(floor(CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
        |    PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |    / 512) AS BIGINT) AS bin_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "emb_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |s AS (
        |  SELECT vec_id, emb,
        |    list_max(list_transform(emb, x -> abs(x))) AS scale
        |  FROM e)
        |SELECT vec_id,
        |  CAST(len(emb) AS INT) AS dim,
        |  scale,
        |  array_to_string(
        |    CASE WHEN scale = 0 THEN list_transform(emb, x -> 0)
        |         ELSE list_transform(emb, x -> CAST(round(x * 127 / scale) AS INT))
        |    END, ',') AS qvec
        |FROM s ORDER BY vec_id""".stripMargin,
    // list slicing l[a:b] is 1-based inclusive in DuckDB ≡ Spark
    // slice(l, a, b-a+1); chunk starts every 40 words, 50-word windows
    "chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |    ws[i*40+1 : i*40+50] AS cw
        |  FROM t, LATERAL (SELECT unnest(range((n + 39) // 40)) AS i))
        |SELECT doc_id, chunk_id,
        |  CAST(len(cw) AS INT) AS n_chunk_words,
        |  array_to_string(cw, ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // independent formulation: positional token self-join on doc +
    // pos-distance — mirrors the in-row zip exactly
    "skipgram_pairs" ->
      """WITH w AS (
        |  SELECT doc_id, u.w, u.pos FROM documents,
        |    LATERAL (SELECT unnest(string_split(text, ' ')) AS w,
        |      generate_subscripts(string_split(text, ' '), 1) AS pos) u)
        |SELECT a.w AS w1, b.w AS w2, count(1) AS n
        |FROM w a JOIN w b
        |  ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
        |GROUP BY 1, 2 ORDER BY n DESC, w1, w2""".stripMargin,
    // same rank rule (count desc, word asc); ids reassembled in token
    // order via the positional unnest
    "tokenize_ids" ->
      """WITH w AS (
        |  SELECT doc_id, u.w, u.pos FROM documents,
        |    LATERAL (SELECT unnest(string_split(text, ' ')) AS w,
        |      generate_subscripts(string_split(text, ' '), 1) AS pos) u),
        |vocab AS (
        |  SELECT w, CAST(row_number() OVER (ORDER BY count(1) DESC, w)
        |    AS INT) AS id
        |  FROM w GROUP BY w)
        |SELECT doc_id, CAST(count(1) AS INT) AS n_tok,
        |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids
        |FROM w JOIN vocab USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // single-level rank over the same hash — the two-level Spark form
    // is exact, so the flat formulation is a true independent mirror
    "sample_reservoir" ->
      """WITH b AS (
        |  SELECT lang, doc_id,
        |    xor((doc_id % 1000003) * 2654435761,
        |        ((doc_id % 1000003) * 2654435761) >> 13) % 1000000 AS bucket
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, bucket,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY bucket, doc_id) AS rnk
        |  FROM b)
        |SELECT lang, CAST(rnk AS INT) AS rnk, doc_id, bucket
        |FROM r WHERE rnk <= 8 ORDER BY lang, rnk""".stripMargin,
    "sample_split" ->
      """WITH b AS (
        |  SELECT lang, text,
        |    xor((doc_id % 1000003) * 2654435761,
        |        ((doc_id % 1000003) * 2654435761) >> 13) % 10 AS bucket
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 8 THEN 'train'
        |       WHEN bucket = 8 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(1) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
  )
}
