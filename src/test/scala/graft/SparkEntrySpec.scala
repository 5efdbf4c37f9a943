package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards for the driver surface: every declared query must carry its
  * DuckDB oracle (a query without one silently downgrades to a rows-only check
  * in the driver), and the key sets must stay consistent.
  */
class SparkEntrySpec extends AnyFunSuite {

  /** Queries DELIBERATELY without a SQL oracle (driver records the weaker
    * rows-only check): each must be genuinely non-SQL-expressible and carry a
    * golden spec as its semantics gate. Grows only with a documented reason.
    */
  private val rowsOnlyQueries = Set(
    "q_bpe_train", // iterative data-dependent merge recurrence; BpeTrainSpec golden
    "q_bpe_encode", // rank-order greedy tokenizer apply; BpeTrainSpec golden
    "q_tokenizer_fertility", // composes the trained-BPE encode; BpeTrainSpec golden
    "q_unigram_train", // EM/prune recurrence; UnigramLmSpec reference differential
    "q_unigram_encode", // Viterbi over the trained vocab; UnigramLmSpec differential
    "q_unigram_fertility") // composes the unigram encode; UnigramLmSpec differential

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- rowsOnlyQueries).isEmpty,
      s"queries missing oracles: ${(q -- o -- rowsOnlyQueries).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((rowsOnlyQueries -- q).isEmpty, "stale rows-only allowlist entry")
    assert((rowsOnlyQueries & o).isEmpty,
      "allowlisted query gained an oracle - remove it from rowsOnlyQueries")
  }

  test("query names follow the q_ convention and are non-empty SQL") {
    SparkEntry.queries.keys.foreach(k => assert(k.startsWith("q_"), k))
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.toUpperCase.startsWith("WITH") ||
        sql.trim.toUpperCase.startsWith("SELECT"), s"$k oracle doesn't look like SQL")
    }
  }

  test("integer SUMs in oracle SQL are BIGINT-cast (DuckDB DECIMAL128 trap)") {
    // DuckDB SUM over an integer column yields DECIMAL128(38,0) while Spark
    // yields int64 — any un-cast SUM over a known integer column in a FINAL
    // projection breaks the driver's typed hash. Heuristic guard: the known
    // integer-sum aliases introduced so far must carry the cast.
    val knownIntSums = Seq("cum_volume", "session_id", "sum_k", "total_tokens")
    for ((name, sql) <- SparkEntry.oracleSql; alias <- knownIntSums
         if sql.contains(s"AS $alias")) {
      val ok = sql.contains(s"AS BIGINT) AS $alias") ||
        !sql.replaceAll("(?s)\\s+", " ").matches(s".*SUM\\([^)]*\\) AS $alias.*")
      assert(ok, s"$name: SUM AS $alias lacks CAST(... AS BIGINT)")
    }
  }
}
