package graft.spark

import org.apache.spark.sql.functions._
import graft.nexmark.SparkSpec

/** Native cosine_sim expression: correctness against a plain Scala
  * computation, SQL registration via GraftExtensions, null/error paths.
  * (Both the codegen and interpreted paths run: the DataFrame queries
  * exercise doGenCode; the literal-fold path exercises nullSafeEval.)
  */
class CosineSimSpec extends SparkSpec {

  test("cosine_sim matches the direct computation over random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5))
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), expr("cosine_sim(a, b)").as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val want = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(got(id) - want) < 1e-12, s"id=$id")
    }
  }

  test("cosine_sim is registered in SQL and handles identical vectors") {
    val one = spark.sql("SELECT cosine_sim(array(1D, 2D, 3D), array(1D, 2D, 3D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(one - 1.0) < 1e-15)
    val ortho = spark.sql("SELECT cosine_sim(array(1D, 0D), array(0D, 1D)) AS c")
      .collect()(0).getDouble(0)
    assert(ortho == 0.0)
  }

  test("cosine_sim rejects wrong types and propagates nulls") {
    val err = intercept[Exception](
      spark.sql("SELECT cosine_sim(1, 2)").collect())
    assert(err.getMessage.toLowerCase.contains("cosine_sim") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
    val n = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1D)) AS c")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("cosine_sim fails cleanly on length mismatch") {
    val err = intercept[Exception](
      spark.sql("SELECT cosine_sim(array(1D, 2D), array(1D))").collect())
    assert(err.getMessage.contains("lengths differ") ||
      Option(err.getCause).exists(_.getMessage.contains("lengths differ")))
  }
}
