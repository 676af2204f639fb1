package graft

/** Static guards on the driver contract itself — the failure modes that
  * sail through compilation and only surface as a red CORRECTNESS row:
  * an oracle without a matching query, or an oracle missing the total
  * ORDER BY the row-order-sensitive compare requires. */
class ContractSpec extends SparkSpec {

  /** Queries whose result is a single row by construction — a total order
    * is vacuous there and the SQL legitimately omits ORDER BY. */
  private val singleRow = Set(
    "d05_count_distinct", "x36_least_squares", "x43_chunk_dedup_stats")

  test("every oracle has a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every multi-row oracle carries a total ORDER BY") {
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !singleRow(name) &&
        !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(missing.isEmpty, s"row-order-sensitive compare needs ORDER BY: $missing")
  }

  test("single-row whitelist entries really are single-row") {
    for (n <- singleRow)
      assert(SparkEntry.queries(n)(spark, sf0001).count() == 1L, n)
  }

  test("the declared surface keeps growing monotonically (snapshot floor)") {
    assert(SparkEntry.queries.size >= 106,
      s"declared queries shrank to ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 98,
      s"oracled queries shrank to ${SparkEntry.oracleSql.size}")
  }
}
