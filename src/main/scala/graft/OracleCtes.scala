package graft

/** Rewrites every top-level CTE of a DuckDB oracle to `AS MATERIALIZED`.
  *
  * DuckDB inlines a CTE referenced more than once, re-evaluating its whole
  * prefix once per reference — for CHAINED iterative oracles (HITS,
  * PageRank, label propagation, absorbing chains, walk matrices) where
  * each round's state is read 2+ times by the next round, the inlining
  * compounds exponentially with chain depth. At the oracle SFs the
  * prefixes are small enough to hide it; at the sf1.0 value-hash gate
  * q_hits spilled >60 GB of DuckDB temp before this guard (the q_mis
  * precedent from round 13, applied systematically to every chained
  * oracle). Purely a DuckDB execution hint: results are unchanged, and
  * Spark never parses these strings.
  *
  * The rewrite keys on the `WITH foo AS (SELECT` / `, foo AS (SELECT`
  * shape (optional column list allowed; VALUES/WITH bodies too), which
  * cannot collide with column aliases (`expr AS name` has no following
  * paren) or WINDOW clauses (a window spec's body starts with
  * PARTITION/ORDER/ROWS, never SELECT — q_attribution's multi-window
  * clause is the live counterexample the body lookahead exists for).
  * Idempotent: an already-MATERIALIZED CTE no longer matches.
  */
object OracleCtes {
  private val Cte =
    raw"((?:\bWITH\b|,)\s*)(\w+(?:\([^()]*\))?\s+AS)\s*(\(\s*(?:SELECT|VALUES|WITH)\b)".r

  def materialize(sql: String): String =
    Cte.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
      m.group(1) + m.group(2) + " MATERIALIZED " + m.group(3)))
}
