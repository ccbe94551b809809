package graft

import graft.nexmark.SparkSpec

/** Driver-contract sanity: every query has an oracle, the flagship entry
  * returns rows, and every query executes at the smallest scale factor.
  * (Value-level correctness is the driver's DuckDB gate + tools/selfcheck.py.)
  */
class SparkEntrySpec extends SparkSpec {
  val sfDir = "/root/testdata/sf0.001"

  test("every query has a matching oracle (names must align for the driver)") {
    // oracle-less queries are allowed (driver records a rows-only check)
    // but only for the streaming-trigger pipelines DuckDB can't express
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val oracleLess = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(oracleLess.forall(_.startsWith("stream_")),
      s"non-streaming queries missing an oracle: ${oracleLess.filterNot(_.startsWith("stream_"))}")
    assert(SparkEntry.queries.nonEmpty)
  }

  test("entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run and return non-empty results at sf0.001") {
    // stream_* entries may legitimately emit nothing at sf0.001 (the
    // bounded volume can be too small for any window to pass the watermark
    // in append mode); they must still RUN clean. Their results are
    // oracle-gated at sf0.01 via the dumped-input DuckDB SQL (which agrees
    // on emptiness at any scale).
    val empty = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0 && !name.startsWith("stream_")) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
