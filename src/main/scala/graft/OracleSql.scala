package graft

/** Helpers for authoring the DuckDB oracle SQL (dev-side contract
  * strings — not part of the engine's execution path). */
object OracleSql {

  /** Prefix the named CTEs with DuckDB's `AS MATERIALIZED` evaluation
    * hint — zero semantic change, but load-bearing at sf10+: DuckDB 1.0
    * inlines a CTE at every reference, so a CTE consumed by several
    * downstream CTEs (a shared shingle/edge pipeline, an unrolled
    * iteration chain, a self-joined frame) is re-evaluated once per
    * reference, compounding multiplicatively down the chain (observed:
    * 74 GB of temp spill and death-by-disk at sf10 on oracles whose
    * materialized form finishes in under a minute). Non-recursive CTEs
    * inside a `WITH RECURSIVE` list accept the hint too. */
  def materialized(sql: String, ctes: String*): String =
    ctes.foldLeft(sql) { (s, c) =>
      // The hint is load-bearing at sf10 — a name that fails to match
      // (typo, whitespace/case drift in the SQL) must fail the build,
      // not silently drop the hint. Quote both sides so CTE names are
      // treated as literals, not regex/replacement syntax.
      val out = s.replaceFirst(
        "\\b" + java.util.regex.Pattern.quote(c) + " AS \\(",
        java.util.regex.Matcher.quoteReplacement(c) + " AS MATERIALIZED (")
      require(out != s, s"materialized(): CTE '$c AS (' not found in SQL")
      out
    }
}
