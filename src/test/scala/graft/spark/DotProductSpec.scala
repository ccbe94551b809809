package graft.spark

import org.apache.spark.sql.functions._
import graft.nexmark.SparkSpec

class DotProductSpec extends SparkSpec {

  test("optimizer rule rewrites the zip_with+aggregate idiom to DotProduct") {
    // parquet-backed input: literal-backed plans constant-fold away before
    // the rewrite is observable
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS a")
    val df = e.selectExpr(
      "vec_id",
      "aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), s"rule did not fire:\n$optimized")
    // value equivalence vs the native function
    val both = e.selectExpr("vec_id", "dot_product(a, a) AS nd",
        "aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS hd")
      .collect()
    both.foreach(r => assert(r.getDouble(1) == r.getDouble(2), s"vec ${r.getLong(0)}"))
  }

  test("rule leaves non-dot-product aggregates untouched") {
    import spark.implicits._
    // subtraction instead of multiplication: must NOT rewrite
    val df = Seq((Array(1.0, 2.0), Array(4.0, 5.0))).toDF("a", "b")
      .select(expr("aggregate(zip_with(a, b, (x, y) -> x - y), 0D, (acc, v) -> acc + v)").as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(df.collect()(0).getDouble(0) == -6.0)
    // non-zero seed: must NOT rewrite
    val df2 = Seq((Array(1.0, 2.0), Array(4.0, 5.0))).toDF("a", "b")
      .select(expr("aggregate(zip_with(a, b, (x, y) -> x * y), 1D, (acc, v) -> acc + v)").as("d"))
    assert(!df2.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(df2.collect()(0).getDouble(0) == 15.0)
  }

  test("dot_product reproduces HOF null semantics: ragged and null-element inputs yield NULL") {
    // zip_with null-pads the shorter array → null product → null sum; the
    // rewrite must preserve that, so dot_product itself returns NULL
    val r = spark.sql(
      """SELECT dot_product(array(1D, 2D, 3D), array(4D, 5D)) AS ragged_nd,
        |       aggregate(zip_with(array(1D, 2D, 3D), array(4D, 5D),
        |                 (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS ragged_hd,
        |       dot_product(array(1D, CAST(NULL AS DOUBLE)), array(4D, 5D)) AS nullel_nd,
        |       aggregate(zip_with(array(1D, CAST(NULL AS DOUBLE)), array(4D, 5D),
        |                 (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS nullel_hd
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1), "ragged: both must be NULL")
    assert(r.isNullAt(2) && r.isNullAt(3), "null element: both must be NULL")
  }

  test("RewriteDotProduct fires inside the s_dot_topk library query") {
    val df = graft.queries.Similarity.dotTopk(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"),
      s"s_dot_topk should run on the native kernel via the rewrite:\n$optimized")
  }

  test("dot_product SQL function matches the HOF computation") {
    val r = spark.sql(
      """SELECT dot_product(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d,
        |       aggregate(zip_with(array(1D, 2D, 3D), array(4D, 5D, 6D),
        |                 (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS h
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 32.0)
  }
}
