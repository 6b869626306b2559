package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every declared query has a DuckDB
  * oracle (a query without one silently downgrades the correctness
  * gate to rows-only) unless it is EXPLICITLY listed as rows-only
  * here, names are unique per qN index, and the flagship entry
  * returns rows (the driver's smoke check).
  */
class ContractSpec extends AnyFunSuite {

  /** Queries with no SQL-expressible oracle (the contract's documented
    * weaker rows-only path). Listing is deliberate: adding a query
    * here must be a conscious decision, never an omission.
    */
  private val rowsOnly = Set(
    "q82_rainbow_fit",       // iterative LM optimizer; values pinned by RainbowFitSpec
    "q100_rainbow_censored") // same optimizer, censored (upper-limit) history path

  test("every query has an oracle and vice versa") {
    // these two together also force oracleSql ∩ rowsOnly = ∅
    assert(SparkEntry.queries.keySet -- rowsOnly ===
      SparkEntry.oracleSql.keySet)
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
  }

  test("query indexes are unique") {
    val idx = SparkEntry.queries.keySet.toSeq
      .map(_.split("_")(0)) // "q33"
    assert(idx.distinct.size === idx.size)
  }

  test("entry() answers the flagship query with rows") {
    val out = SparkEntry.entry(SparkSpec.session)
    assert(out.count() > 0)
  }
}
