package graft

import graft.queries.TextPipeline
import graft.nexmark.SparkSpec
import org.apache.spark.sql.functions._

/** The fingerprintDedup window-vs-agg auto-switch (TextPipeline docstring):
  * both formulations must be row-identical on any input — the probe may
  * only ever change the PHYSICAL plan — and the sampled hot-share probe
  * must actually trip on a boilerplate-dominated corpus and stay quiet on
  * a uniform one.
  */
class FingerprintDedupSwitchSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (0L until 20000L).map { i =>
    // 60% of docs share one fingerprint, the rest are ~unique
    val fp = if (i % 5 < 3) "hotfp" else s"fp$i"
    (i, fp)
  }.toDF("doc_id", "fp")

  private def uniform = (0L until 20000L).map(i => (i, s"fp${i / 2}"))
    .toDF("doc_id", "fp")

  test("window and agg+join formulations are row-identical (skewed and uniform)") {
    for (d <- Seq(skewed, uniform)) {
      val a = TextPipeline.fingerprintDedupWindow(d).collect().map(_.toSeq).toSet
      val b = TextPipeline.fingerprintDedupAggJoin(d).collect().map(_.toSeq).toSet
      assert(a == b && a.nonEmpty)
    }
  }

  test("probe trips on a hot corpus, stays quiet on a uniform one") {
    val (hotShare, hotSampled) = TextPipeline.hotFpShare(skewed, 0.05)
    assert(hotSampled >= 500)
    assert(hotShare > TextPipeline.HotFpShareThreshold,
      s"hot corpus share $hotShare should exceed the switch threshold")
    val (uniShare, uniSampled) = TextPipeline.hotFpShare(uniform, 0.05)
    assert(uniSampled >= 500)
    assert(uniShare < TextPipeline.HotFpShareThreshold,
      s"uniform corpus share $uniShare should stay below the switch threshold")
    // probe determinism: fixed seed, same input -> same estimate
    assert(TextPipeline.hotFpShare(skewed, 0.05) == (hotShare, hotSampled))
  }

  test("the real entry still matches its window formulation on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val out = TextPipeline.fingerprintDedup(spark, dir).collect().map(_.toSeq).toSet
    val d = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.size == d.count())
    assert(out.nonEmpty)
  }
}
