package graft.spark

import graft.nexmark.SparkSpec
import graft.nexmark.sink.Murmur3Partitioner
import org.apache.spark.sql.functions._

/** The native `murmur3_partition` expression (SURVEY §9.8.3): equivalence
  * with the Scala partitioner over adversarial keys, and proof the routing
  * lives inside the codegen'd projection rather than a lambda.
  */
class Murmur3Spec extends SparkSpec {
  import spark.implicits._

  test("murmur3_partition column == Murmur3Partitioner.partitionFor for all key shapes") {
    val keys = (-5000L to 5000L) ++ Seq(Long.MaxValue, Long.MinValue, Long.MaxValue - 1,
      Long.MinValue + 1, 1L << 32, (1L << 32) - 1, (1L << 48) + 12345L)
    val df = keys.toDF("k")
      .withColumn("p", call_function("murmur3_partition", col("k"), lit(32)))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    keys.foreach { k =>
      assert(df(k) == Murmur3Partitioner.partitionFor(k, 32),
        s"mismatch for key $k")
    }
  }

  test("partition values cover the space and the plan shows the native projection") {
    val df = spark.range(100000L)
      .withColumn("p", call_function("murmur3_partition", col("id"), lit(8)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("murmur3_partition"), s"expected native projection:\n$plan")
    // the leading `*(n)` marks a WholeStageCodegen stage in toString form
    assert(plan.contains("*(1) Project"), s"expected codegen'd projection:\n$plan")
    val counts = df.groupBy("p").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet, s"all 8 partitions must be hit: $counts")
    // murmur3 is uniform: no partition more than 2x the mean
    assert(counts.values.max < 2 * 100000L / 8)
  }

  test("null key yields null partition (nullSafeEval)") {
    val df = Seq[Option[Long]](Some(7L), None).toDF("k")
      .withColumn("p", call_function("murmur3_partition", col("k"), lit(4)))
    val rows = df.collect()
    assert(rows.find(_.isNullAt(0)).get.isNullAt(1), "null in -> null out")
    assert(rows.find(!_.isNullAt(0)).get.getInt(1) == Murmur3Partitioner.partitionFor(7L, 4))
  }
}
