package graft.spark

import graft.nexmark.SparkSpec

class Md5WordsSpec extends SparkSpec {

  test("md5_words equals parsing the md5 hex string 8 chars at a time") {
    // cross-check the native digest split against Spark's own md5 + conv
    // (hex -> decimal) over real varied strings
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("substring(text, 1, 40) AS s")
      .selectExpr(
        "md5_words(s) AS w",
        "transform(sequence(0, 3), j -> cast(conv(substring(md5(s), j * 8 + 1, 8), 16, 10) as bigint)) AS ref")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for $r")
    }
  }

  test("md5_words stays inside whole-stage codegen and bounds its words") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("md5_words(text) AS w")
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [md5_words"), plan)
    val words = df.selectExpr("explode(w) AS x").agg(
      org.apache.spark.sql.functions.min("x"),
      org.apache.spark.sql.functions.max("x")).collect()(0)
    assert(words.getLong(0) >= 0L && words.getLong(1) < (1L << 32))
  }
}
