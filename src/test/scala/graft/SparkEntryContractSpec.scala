package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guard: the gate registry is the judged surface, so its
  * invariants fail here before they fail in a round artifact. */
class SparkEntryContractSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered gate carries a DuckDB oracle (no rows-only gates)") {
    // r12: the last three rows-only ANN gates moved to the q19-style
    // accuracy-contract shape (exact mirrored rows + in-engine recall
    // flag), so the oracled surface is total and must stay that way.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"rows-only gates appeared (every gate must ship an oracle): $rowsOnly")
  }

  test("gate names are well-formed and unique per family convention") {
    val pat = "^(q\\d{2}|[dgmpst]\\d{2}|excel)[a-z0-9_]*$".r
    val bad = SparkEntry.queries.keySet.filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"unconventional gate names: $bad")
  }

  test("no oracle SQL is empty or references an unknown table") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings",
      // DuckDB table functions that legitimately follow FROM/JOIN
      "range", "unnest", "generate_series")
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      assert(rawSql != null && rawSql.trim.nonEmpty, s"$name: empty oracle")
      val sql = rawSql.replaceAll("'[^']*'", "''") // ignore string literals
      val froms = "(?i)(?<![a-z0-9_])(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // every referenced base name is either a CTE defined in the SQL or
      // one of the harness tables
      val ctes =
        "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS(?:\\s+MATERIALIZED)?\\s*\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms -- ctes -- tables
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
