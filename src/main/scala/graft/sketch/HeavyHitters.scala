package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch-guided heavy-hitter detection — the two-phase pattern that
  * finds frequent keys WITHOUT a full per-key count shuffle:
  *
  *  1. '''Sketch pass''': one scan builds a count-min grid (d=4 rows ×
  *     w=4096 buckets, [[CountMin]]'s arithmetic at a wider w — sized
  *     so collision mass ≪ the threshold: w ≈ 2× the key-domain size
  *     keeps P(all d rows collide) ≈ (1/2)⁴, i.e. ~97% of estimates
  *     exact here; production sizing is the usual w = ceil(e/ε)) — the
  *     shuffle is ≤ d·w counter rows at ANY corpus size.
  *  2. '''Candidate probe''': the key dictionary (here the `part`
  *     dimension — at pipeline scale, any enumerable key domain) probes
  *     the broadcast sketch; keys whose estimate clears the threshold
  *     become candidates. CM estimates are one-sided (est ≥ exact,
  *     always), so NO true heavy hitter can be missed — the candidate
  *     set has false positives, never false negatives.
  *  3. '''Exact rescue''': exact counts are computed for candidates
  *     ONLY — the count shuffle carries just the candidate keys'
  *     occurrences instead of the whole key domain, which is the entire
  *     economy: sketch + rescue replaces the vocabulary-sized shuffle
  *     with a constant one plus an output-sized one.
  *
  * The output keeps both numbers per candidate (estimate and exact), so
  * the false-positive regime is oracle-visible: rows with
  * `exact_n < threshold` are exactly the collision-inflated candidates
  * the rescue pass exists to weed out. The threshold is derived
  * in-query as 1.5× the MEAN key frequency (`3·n_tot div 2·|domain|` —
  * the mean is scale-invariant when rows and keys grow together), so
  * the query is selective at every sf and fully deterministic.
  * All arithmetic is integer (the key folds mod 1000003 before the
  * affine row hashes, bounding every product far below 2⁶³), so the
  * DuckDB oracle replays sketch, probe, and rescue bit-for-bit.
  */
object HeavyHitters {

  private val P = 1000000007L
  private val W = 4096
  private val RowA = Seq(2654435761L, 1779033703L, 3144134277L, 1013904242L)
  private val RowB = Seq(7L, 1337L, 7919L, 104729L)

  /** Fold an integer key to < 1000003 so `fold·RowA` never overflows
    * long at any key magnitude (the bucket1M convention). */
  private def fold(k: Column): Column = pmod(k, lit(1000003L))

  private def buckets(f: Column): Column =
    array(RowA.zip(RowB).map { case (ai, bi) =>
      pmod(f * ai + bi, lit(P)) % W
    }: _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hot parts in the order stream: every part whose CM estimate
    // clears 1.5× the mean frequency, with its exact count rescued.
    "heavy_hitters" -> ((s, d) => {
      val keys = Tables.lineitem(s, d).select(col("l_partkey").as("k"))
      // size-gated checkpoint (r17): the sketch is ≤ rows×W counters
      // (16384 rows) but feeds BOTH the estimate join and (below) the
      // threshold; un-truncated, `candidates`'s two consumers re-ran
      // the whole corpus sketch pass each (plan-verified 18 scans
      // pre-change).
      val sketch = keys
        .select(posexplode(buckets(fold(col("k")))).as(Seq("row", "bucket")))
        .groupBy(col("row"), col("bucket"))
        .agg(count(lit(1)).as("counter"))
      val sk = graft.PlanShare.pinned(sketch)
      // threshold = 1.5× the MEAN key frequency (n_tot/|domain|) — the
      // mean is scale-invariant here (10× rows brings 10× keys), so the
      // query stays selective at every sf; exact integer arithmetic.
      // n_tot has two EXACTLY-equal derivations (every key contributes
      // exactly one posting to row 0, so Σ row-0 counters == count(keys)
      // — HeavyHittersSpec asserts the invariant): above the gate read
      // it off the pinned sketch (no corpus scan at all); below, where
      // `sk` is un-materialized and the sketch subtree would re-run per
      // consumer, a plain count of the key column is the cheaper form
      // (r17 verdict item 5 — the sketch now runs ONCE in both regimes).
      val nTot =
        if (graft.PlanShare.crossesGate(sketch))
          sk.filter(col("row") === 0)
            .agg(coalesce(sum(col("counter")), lit(0L)).as("n_tot"))
        else keys.agg(count(lit(1)).as("n_tot"))
      val thr = nTot
        .crossJoin(Tables.part(s, d).agg(count(lit(1)).cast("long").as("n_keys")))
        .select(expr("(n_tot * 3) div (2 * n_keys)").as("thr"))
      val est = Tables.part(s, d).select(col("p_partkey"))
        .select(col("p_partkey"),
          posexplode(buckets(fold(col("p_partkey")))).as(Seq("row", "bucket")))
        .join(sk, Seq("row", "bucket"), "left")
        .groupBy(col("p_partkey"))
        .agg(min(coalesce(col("counter"), lit(0L))).as("est_n"))
      // candidate set is output-sized (the heavy keys): checkpoint so
      // the rescue semi-join and the final report don't re-run the
      // sketch+estimate pipeline once each (size-gated)
      val candidates = graft.PlanShare.pinned(est.crossJoin(broadcast(thr))
        .filter(col("est_n") >= col("thr")))
      val exact = keys
        .join(broadcast(candidates.select(col("p_partkey").as("k"))),
          Seq("k"), "left_semi")
        .groupBy(col("k")).agg(count(lit(1)).as("exact_n"))
      candidates
        .join(exact, candidates("p_partkey") === exact("k"), "left")
        .select(col("p_partkey"), col("est_n"),
          coalesce(col("exact_n"), lit(0L)).as("exact_n"),
          (coalesce(col("exact_n"), lit(0L)) >= col("thr")).as("is_heavy"))
        .orderBy(col("p_partkey"))
    }),
  )

  def oracle: Map[String, String] = Map(
    // identical fold/affine-row/bucket arithmetic, identical threshold
    // derivation, identical rescue
    "heavy_hitters" ->
      s"""WITH keys AS (SELECT l_partkey AS k FROM lineitem),
         |thr AS (SELECT (SELECT count(1) * 3 FROM keys)
         |          // (2 * (SELECT count(1) FROM part)) AS thr),
         |sk AS (
         |  SELECT r.j AS row_id, ((k % 1000003) * r.a + r.b) % $P % $W AS bucket,
         |    count(1) AS counter
         |  FROM keys CROSS JOIN (VALUES ${RowA.zip(RowB).zipWithIndex
             .map { case ((a, b), j) => s"($j, $a, $b)" }
             .mkString(", ")}) r(j, a, b)
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT p.p_partkey,
         |    CAST(min(coalesce(sk.counter, 0)) AS BIGINT) AS est_n
         |  FROM part p CROSS JOIN (VALUES ${RowA.zip(RowB).zipWithIndex
             .map { case ((a, b), j) => s"($j, $a, $b)" }
             .mkString(", ")}) r(j, a, b)
         |  LEFT JOIN sk ON sk.row_id = r.j
         |    AND sk.bucket = ((p.p_partkey % 1000003) * r.a + r.b) % $P % $W
         |  GROUP BY p.p_partkey),
         |cand AS (
         |  SELECT est.*, thr.thr FROM est CROSS JOIN thr
         |  WHERE est.est_n >= thr.thr),
         |exact AS (
         |  SELECT k, count(1) AS n FROM keys
         |  WHERE k IN (SELECT p_partkey FROM cand) GROUP BY k)
         |SELECT cand.p_partkey, cand.est_n,
         |  CAST(coalesce(exact.n, 0) AS BIGINT) AS exact_n,
         |  coalesce(exact.n, 0) >= cand.thr AS is_heavy
         |FROM cand LEFT JOIN exact ON cand.p_partkey = exact.k
         |ORDER BY cand.p_partkey""".stripMargin,
  )
}
