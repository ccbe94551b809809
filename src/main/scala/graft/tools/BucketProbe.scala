package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off evidence probe (r10): measures the bucketed co-located SMJ
  * against the shuffle SMJ at the sf1 fixture volume (6M lineitem ⋈
  * 1.5M orders) — the empirical counterpart of ScalePlanSpec's
  * plan-shape pin ("a SortMergeJoin with NO Exchange on either side").
  * The plan pin proves the shuffle is gone; this probe records what that
  * buys at the largest local volume, which is the number the 100 TB
  * bucketing claim extrapolates from.
  *
  * Usage: runMain graft.tools.BucketProbe <sfDir> [buckets=32]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("bucketprobe_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))

    def time(label: String)(body: => Long): Unit = {
      // warm + 2 timed, report min (the bench convention)
      body
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${runs.min}%.2f s (runs ${runs.map(r => f"$r%.2f").mkString("/")})")
    }

    val q = () => l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(expr("l_extendedprice * (1 - l_discount)")).as("rev"))
    time("shuffle SMJ (unbucketed)") { q().count() }

    l.write.mode("overwrite").bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bp_li")
    o.write.mode("overwrite").bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bp_ord")
    val qb = () => spark.table("bp_li").join(spark.table("bp_ord"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(expr("l_extendedprice * (1 - l_discount)")).as("rev"))
    val plan = qb().queryExecution.executedPlan.toString
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    require(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
            !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      "bucketed join unexpectedly shuffles on the join key")
    time("co-located SMJ (bucketed)") { qb().count() }
    spark.sql("DROP TABLE IF EXISTS bp_li")
    spark.sql("DROP TABLE IF EXISTS bp_ord")
    spark.stop()
  }
}
