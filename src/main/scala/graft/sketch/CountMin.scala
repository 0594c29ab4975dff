package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Count-min sketch over the token stream — the fixed-size frequency
  * summary a 100 TB pipeline keeps when the exact per-term count table
  * (tokenize_ids' vocabulary shuffle) is itself too big to rebuild per
  * probe. The sketch is a d×w counter grid (d=4 hash rows, w=64
  * buckets): build cost is ONE scan emitting d (row, bucket) keys per
  * token with map-side combine down to ≤ d·w rows — the shuffle volume
  * is CONSTANT in corpus size, which is the entire point. Point
  * estimates take min over the d rows (classic CM upper bound:
  * est ≥ exact always, over-counts only when every row collides).
  *
  * Everything is deterministic integer arithmetic — the term
  * fingerprint is a char polynomial (codegen'd ascii/substring, no
  * library hash), the d hash rows are affine maps mod 1e9+7 — so the
  * DuckDB oracle replays the ENTIRE sketch bit-for-bit: this is a
  * hash-checked sketch query, not a rows-only one. The sketch is
  * LINEAR (counters add), so shard sketches merge losslessly — the
  * same property agg_hll_merge pins for HLL — asserted in
  * CountMinSpec along with the one-sided error bound.
  *
  * Width 64 is test-scale: the 31-word corpus vocabulary forces real
  * collisions so the min-over-rows machinery is exercised (several
  * probes DO over-count at w=64; the spec asserts the bound, the
  * oracle the exact values). Production sizing is w = ceil(e/ε),
  * d = ceil(ln 1/δ) — the counters stay KBs for any corpus.
  */
object CountMin {

  private val P = 1000000007L
  private val W = 64
  private val RowA = Seq(2654435761L, 1779033703L, 3144134277L, 1013904242L)
  private val RowB = Seq(7L, 1337L, 7919L, 104729L)

  /** Probe set: frequent template words, stopwords, and one absent
    * term (its exact count is 0; its CM estimate is whatever its cells
    * collided into — the canonical CM failure mode, pinned by the
    * oracle). */
  private val Probes =
    Seq("join", "hash", "window", "spark", "the", "a", "scan", "zz_absent")

  /** Char-polynomial fingerprint: first 4 code points horner-folded
    * base 31, then ×131 + length. ascii past the end of the string is
    * 0 in both engines (substring → '' → ascii 0), so short words are
    * well-defined. Max ≈ 4.9·10⁸ < 2³¹ — products with the row
    * multipliers stay inside long. */
  private def fp(w: Column): Column = {
    def a(i: Int) = ascii(substring(w, i, 1)).cast("long")
    (((a(1) * 31 + a(2)) * 31 + a(3)) * 31 + a(4)) * 131 +
      length(w).cast("long")
  }

  /** The d bucket ids of a fingerprint, as an array (posexplode gives
    * the row index for free). */
  private def buckets(f: Column): Column =
    array(RowA.zip(RowB).map { case (ai, bi) =>
      pmod(f * ai + bi, lit(P)) % W
    }: _*)

  /** The d×w sketch: (row, bucket, counter). ≤ 256 rows regardless of
    * corpus size; the groupBy's map-side combine means each scan task
    * ships at most d·w partial counters. */
  private[sketch] def sketch(tokens: DataFrame): DataFrame =
    tokens
      .select(posexplode(buckets(fp(col("w")))).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("counter"))

  private[sketch] def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CM point estimates for the probe terms next to their exact
    // counts. The estimate side touches only the 256-row sketch (built
    // in one constant-shuffle pass); the exact side is a probe-filtered
    // count — at production scale the exact column is what you CANNOT
    // afford per probe, and drops away; it is here to make the query
    // self-auditing (and the overestimate bound oracle-visible).
    "sketch_cms" -> ((s, d) => {
      val tok = tokens(s, d)
      val sk = sketch(tok)
      val probes = s.createDataFrame(
        Probes.map(Tuple1.apply)).toDF("term")
      val est = probes
        .select(col("term"), posexplode(buckets(fp(col("term"))))
          .as(Seq("row", "bucket")))
        .join(sk, Seq("row", "bucket"), "left")
        .groupBy(col("term"))
        .agg(min(coalesce(col("counter"), lit(0L))).as("cms_n"))
      val exact = tok.filter(col("w").isin(Probes: _*))
        .groupBy(col("w")).agg(count(lit(1)).as("exact_n"))
      est
        .join(exact, est("term") === exact("w"), "left")
        .select(col("term"), coalesce(col("exact_n"), lit(0L)).as("exact_n"),
          col("cms_n"))
        .orderBy(col("term"))
    }))

  def oracle: Map[String, String] = Map(
    // the identical fingerprint/bucket arithmetic replayed in SQL; the
    // sketch CTE is the same d×w counter grid
    "sketch_cms" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |fp AS (
         |  SELECT w,
         |    (((ascii(substring(w,1,1)) * 31 + ascii(substring(w,2,1))) * 31
         |       + ascii(substring(w,3,1))) * 31 + ascii(substring(w,4,1)))
         |      * 131 + length(w) AS f
         |  FROM tok),
         |sk AS (
         |  SELECT r.j AS row_id, (f * r.a + r.b) % $P % $W AS bucket,
         |    count(1) AS counter
         |  FROM fp CROSS JOIN (VALUES ${RowA.zip(RowB).zipWithIndex
             .map { case ((a, b), j) => s"($j, $a, $b)" }
             .mkString(", ")}) r(j, a, b)
         |  GROUP BY 1, 2),
         |probes AS (SELECT unnest(['${Probes.mkString("','")}']) AS term),
         |pf AS (
         |  SELECT term,
         |    (((ascii(substring(term,1,1)) * 31 + ascii(substring(term,2,1)))
         |       * 31 + ascii(substring(term,3,1))) * 31
         |       + ascii(substring(term,4,1))) * 131 + length(term) AS f
         |  FROM probes),
         |est AS (
         |  SELECT pf.term,
         |    CAST(min(coalesce(sk.counter, 0)) AS BIGINT) AS cms_n
         |  FROM pf CROSS JOIN (VALUES ${RowA.zip(RowB).zipWithIndex
             .map { case ((a, b), j) => s"($j, $a, $b)" }
             .mkString(", ")}) r(j, a, b)
         |  LEFT JOIN sk ON sk.row_id = r.j
         |    AND sk.bucket = (pf.f * r.a + r.b) % $P % $W
         |  GROUP BY pf.term),
         |exact AS (
         |  SELECT w, count(1) AS n FROM tok
         |  WHERE w IN ('${Probes.mkString("','")}') GROUP BY w)
         |SELECT est.term, CAST(coalesce(exact.n, 0) AS BIGINT) AS exact_n,
         |  est.cms_n
         |FROM est LEFT JOIN exact ON est.term = exact.w
         |ORDER BY est.term""".stripMargin)
}
