package graft

import graft.nexmark.SparkSpec

/** Driver-contract sanity: every query has an oracle, the flagship entry
  * returns rows, and every query executes at the smallest scale factor.
  * (Value-level correctness is the driver's DuckDB gate + tools/selfcheck.py.)
  */
class SparkEntrySpec extends SparkSpec {
  val sfDir = "/root/testdata/sf0.001"

  test("every query has a matching oracle (names must align for the driver)") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.nonEmpty)
  }

  test("entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run and return non-empty results at sf0.001") {
    val empty = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
