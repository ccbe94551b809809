package graft.spark

import graft.nexmark.SparkSpec

/** Pins for the fused row-wise MinHash-LSH kernel: the band keys must be
  * BIT-IDENTICAL to the declarative higher-order-function chain it
  * replaces (TextPipeline.rowMd5WordsExpr → rowSigExpr → rowBandKeysExpr,
  * kept in the library exactly as this spec's reference formulation), on
  * real varied token sets — so the streaming ingest guard's oracle, which
  * recomputes signatures with the aggregated SQL formulation, stays exact
  * under the kernel swap.
  */
class MinHashBandsSpec extends SparkSpec {

  private def tokensDf = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .selectExpr("filter(split(lower(text), ' '), t -> t <> '') AS toks")
    .filter("size(toks) > 0")

  test("minhash_bands equals the declarative HOF chain on real token sets") {
    val rows = tokensDf
      .selectExpr(
        "minhash_bands(toks) AS kb",
        s"${graft.queries.TextPipeline.rowBandKeysExpr(
            graft.queries.TextPipeline.rowSigExpr(
              graft.queries.TextPipeline.rowMd5WordsExpr("toks")))} AS ref")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch for $r")
    }
  }

  test("minhash_bands stays inside whole-stage codegen; keys are md5 hex strings") {
    // HOF-free token prep: a lambda (filter/transform) anywhere in the
    // stage would break the codegen span for reasons outside the kernel
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("minhash_bands(split(lower(text), ' ')) AS kb")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [minhash_bands"), plan)
    val keys = df.selectExpr("explode(kb) AS k").collect().map(_.getString(0))
    assert(keys.forall(k => k.length == 32 && k.forall(c => "0123456789abcdef".contains(c))))
  }

  test("band keys are set-semantic: token order and duplicates never matter") {
    val rows = tokensDf
      .selectExpr(
        "minhash_bands(toks) AS a",
        "minhash_bands(concat(reverse(toks), toks)) AS b")
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"order/dup sensitivity: $r")
    }
  }
}
