package graft

import graft.nexmark.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate layer a 100 TB profile pass uses
  * where the exact answer would shuffle the full key set:
  *
  *   - `approx_count_distinct` (HyperLogLog++): distinct counts whose
  *     shuffle payload is one fixed-size sketch per partition instead of
  *     every distinct key;
  *   - `approx_percentile`: quantiles without a global sort;
  *   - `count_min_sketch`: per-item frequency estimates (never
  *     under-counts, over-counts bounded by eps·N) from one fixed-size
  *     sketch — the heavy-hitter profile over a vocabulary too large to
  *     aggregate exactly.
  *
  * These have no DuckDB oracle entry (sketch internals differ between
  * engines, so driver hash-equality cannot hold); the capability contract
  * is spec'd instead, at BOTH sf0.01 and sf0.1 (error accumulation across
  * partial merges only shows at the larger input):
  *   - bounded relative error against the EXACT answer;
  *   - GOLDEN pinned sketch outputs — both sketches are deterministic
  *     functions of their input (HLL++ register hashing and the quantile
  *     summary are seedless; HLL merge is a register max, order-free, and
  *     the quantile merge order is fixed by this suite's pinned local[4]
  *     session + parquet split layout — verified stable across repeated
  *     runs), so exact equality holds run-to-run and a Spark upgrade that
  *     changes sketch internals trips this spec before a user sees
  *     shifted profiles;
  *   - the partial-aggregation plan shape that makes them scale
  *     (map-side sketch merge — the whole point).
  */
class SketchSpec extends SparkSpec {

  /** (sfDir, golden approx distinct, golden p50, golden p99) — pinned on
    * Spark 4.1.2 against testdata seed 42.
    */
  private val Fixtures = Seq(
    ("/root/testdata/sf0.01", 14752L, 52968.34, 103859.8),
    ("/root/testdata/sf0.1", 146710L, 52936.79, 103912.89))

  for ((sfDir, goldAcd, goldP50, goldP99) <- Fixtures) {
    test(s"approx_count_distinct within rsd of exact, golden-pinned ($sfDir)") {
      val l = Tables.lineitem(spark, sfDir)
      val exact = l.select(countDistinct(col("l_orderkey"))).head().getLong(0)
      val approx = l.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
        .head().getLong(0)
      val relErr = math.abs(approx - exact).toDouble / exact
      // HLL++ rsd is a standard deviation, not a hard bound: allow 3 sigma
      assert(relErr <= 0.06, s"exact=$exact approx=$approx relErr=$relErr")
      assert(approx == goldAcd,
        s"HLL++ output drifted from golden $goldAcd to $approx — sketch internals changed")
    }

    test(s"approx_percentile brackets the exact percentile, golden-pinned ($sfDir)") {
      val l = Tables.lineitem(spark, sfDir)
      val Seq(p50a, p99a) = l
        .select(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)"))
        .head().getSeq[Double](0).toSeq
      val exact = l.stat.approxQuantile("l_extendedprice", Array(0.5, 0.99), 0.0)
      val (p50e, p99e) = (exact(0), exact(1))
      assert(math.abs(p50a - p50e) / p50e <= 0.02, s"p50 approx=$p50a exact=$p50e")
      assert(math.abs(p99a - p99e) / p99e <= 0.02, s"p99 approx=$p99a exact=$p99e")
      assert(p50a == goldP50 && p99a == goldP99,
        s"quantile summary drifted from golden ($goldP50, $goldP99) to ($p50a, $p99a)")
    }
  }

  /** (sfDir, golden estimates for the 3 most frequent normalized words) —
    * pinned on Spark 4.1.2 against testdata seed 42; see the golden
    * rationale in the class doc (CMS with a fixed seed is a deterministic,
    * order-free function of the input multiset: cell updates are
    * commutative counts and merge is cell-wise addition).
    */
  private val CmsFixtures = Seq(
    ("/root/testdata/sf0.01", Seq(964L, 947L, 943L)),
    ("/root/testdata/sf0.1", Seq(9182L, 9159L, 9157L)))

  for ((sfDir, golden) <- CmsFixtures) {
    test(s"count_min_sketch over-estimates within eps*N, golden-pinned ($sfDir)") {
      val w = Tables.documents(spark, sfDir)
        .select(explode(split(trim(regexp_replace(regexp_replace(
          lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val top = w.groupBy(col("w")).count()
        .orderBy(col("count").desc, col("w").asc).limit(3)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val total = w.count()
      val bytes = w.agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      val ests = top.map { case (word, _) => cms.estimateCount(word) }
      top.zip(ests).foreach { case ((word, exact), est) =>
        // CMS never under-counts; eps bounds the over-count vs total mass
        assert(est >= exact && est <= exact + (0.001 * total).toLong + 1,
          s"word=$word exact=$exact est=$est total=$total")
      }
      assert(ests.toSeq == golden,
        s"CMS estimates drifted from golden $golden to ${ests.toSeq} — sketch internals changed")
    }
  }

  test("approx_count_distinct partial-aggregates map-side (sketches, not rows, shuffle)") {
    val l = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val df = l.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("nd"))
    val plan = df.queryExecution.executedPlan.toString
    // two HashAggregate layers around one Exchange = partial merge of
    // fixed-size HLL sketches; an exact distinct would need a second
    // shuffle on (flag, orderkey) first
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
