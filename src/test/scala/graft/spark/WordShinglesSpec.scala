package graft.spark

import graft.nexmark.SparkSpec

class WordShinglesSpec extends SparkSpec {

  test("word_shingles equals the declarative distinct-concat formulation as a set") {
    val declarative = "array_distinct(transform(sequence(1, size(ws) - 2), i -> " +
      "concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', element_at(ws, i + 2))))"
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')), ' ') AS ws")
      .where("size(ws) >= 3")
      .selectExpr("word_shingles(ws, 3) AS fast", s"$declarative AS ref")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // order is first-occurrence in both, but only SET equality is part
      // of the contract (no query result depends on shingle order)
      assert(r.getSeq[String](0).toSet == r.getSeq[String](1).toSet, s"mismatch: $r")
      assert(r.getSeq[String](0).size == r.getSeq[String](1).size)
    }
  }

  test("word_shingles edge cases: fewer words than n, duplicates collapse") {
    val r = spark.sql(
      """SELECT word_shingles(array('a', 'b'), 3) AS short,
        |       word_shingles(array('x', 'y', 'x', 'y', 'x'), 2) AS dups
        |""".stripMargin).collect()(0)
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getSeq[String](1) == Seq("x y", "y x"))
  }
}
