package graft

import graft.nexmark.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate layer a 100 TB profile pass uses
  * where the exact answer would shuffle the full key set:
  *
  *   - `approx_count_distinct` (HyperLogLog++): distinct counts whose
  *     shuffle payload is one fixed-size sketch per partition instead of
  *     every distinct key;
  *   - `approx_percentile`: quantiles without a global sort.
  *
  * These have no DuckDB oracle entry (sketch internals differ between
  * engines, so driver hash-equality cannot hold); the capability contract
  * is spec'd instead: bounded relative error against the EXACT answer on
  * the fixture, and the partial-aggregation plan shape that makes them
  * scale (map-side sketch merge — the whole point).
  */
class SketchSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within rsd of the exact distinct count") {
    val l = Tables.lineitem(spark, sfDir)
    val exact = l.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = l.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    // HLL++ rsd is a standard deviation, not a hard bound: allow 3 sigma
    assert(relErr <= 0.06, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("approx_count_distinct partial-aggregates map-side (sketches, not rows, shuffle)") {
    val l = Tables.lineitem(spark, sfDir)
    val df = l.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("nd"))
    val plan = df.queryExecution.executedPlan.toString
    // two HashAggregate layers around one Exchange = partial merge of
    // fixed-size HLL sketches; an exact distinct would need a second
    // shuffle on (flag, orderkey) first
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("approx_percentile brackets the exact percentile") {
    val l = Tables.lineitem(spark, sfDir)
    val Seq(p50a, p99a) = l
      .select(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)"))
      .head().getSeq[Double](0).toSeq
    val exact = l.stat.approxQuantile("l_extendedprice", Array(0.5, 0.99), 0.0)
    val (p50e, p99e) = (exact(0), exact(1))
    assert(math.abs(p50a - p50e) / p50e <= 0.02, s"p50 approx=$p50a exact=$p50e")
    assert(math.abs(p99a - p99e) / p99e <= 0.02, s"p99 approx=$p99a exact=$p99e")
  }
}
