package graft.spark

import graft.nexmark.SparkSpec

class RollingMinHashesSpec extends SparkSpec {

  test("rolling_min_hashes matches the declarative polynomial + sort formulation") {
    // the HOF formulation this kernel replaced, over real normalized text
    val terms = (0 until 8).map { j =>
      val pow = math.pow(31, 7 - j).toLong
      s"element_at(codes, i + $j) * $pow"
    }.mkString(" + ")
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')) AS nc")
      .where("length(nc) >= 8")
      .selectExpr("nc", "transform(split(nc, ''), c -> CAST(ascii(c) AS BIGINT)) AS codes")
      .selectExpr(
        "rolling_min_hashes(nc, 8, 5) AS fast",
        s"slice(array_sort(transform(sequence(1, size(codes) - 7), i -> $terms)), 1, 5) AS ref")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r"))
  }

  test("rolling_min_hashes edge cases: short input, duplicates, fewer windows than k") {
    val r = spark.sql(
      """SELECT rolling_min_hashes('abc', 8, 5) AS short,
        |       rolling_min_hashes('aaaaaaaaaa', 8, 5) AS dups,
        |       rolling_min_hashes('abcdefghi', 8, 5) AS two
        |""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0).isEmpty)
    // 3 identical windows of 'a'*8: duplicates kept, like array_sort+slice
    assert(r.getSeq[Long](1).length == 3 && r.getSeq[Long](1).distinct.length == 1)
    assert(r.getSeq[Long](2).length == 2)
  }

  test("rolling_min_hashes rejects windows beyond the exact-arithmetic bound") {
    // w = 10 is the largest window with 255*sum(31^j) < 2^53 (see class doc)
    assert(spark.sql("SELECT rolling_min_hashes('abcdefghijkl', 10, 3)")
      .collect()(0).getSeq[Long](0).length == 3)
    val e = intercept[Exception] {
      spark.sql("SELECT rolling_min_hashes('abcdefghijkl', 11, 3)").collect()
    }
    assert(e.getMessage.contains("window must be <= 10"), e.getMessage)
  }
}
