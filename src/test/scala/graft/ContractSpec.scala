package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every declared query has a DuckDB
  * oracle (a query without one silently downgrades the correctness
  * gate to rows-only), names are unique per qN index, and the flagship
  * entry returns rows (the driver's smoke check).
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
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
