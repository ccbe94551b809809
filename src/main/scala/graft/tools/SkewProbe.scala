package graft.tools

import org.apache.spark.sql.SparkSession

/** `q_skew_join` absorbed-vs-naive measurement (r14 VERDICT Next #5): run
  * the oracle-gated 20%-hot-key join on the SHUFFLE path (broadcast off,
  * skew thresholds scaled to the fixture — the same retuning a cluster
  * deployment does; stock 256 MB thresholds are sized for TB-scale
  * partitions) with the AQE skew split ON vs OFF, and report wall times
  * plus whether the final plan carries `skew=true`.
  *
  * `forceOptimizeSkewedJoin` is required on the ON side: the entry's
  * per-key audit agg rides the join's partitioning (partial agg in the
  * same stage), so vanilla AQE vetoes the split to preserve the agg's
  * required distribution — see the entry scaladoc and conf/cluster.conf.
  *
  * SCOPE OF THE REPORTED WALLS (r15 ADVICE): skewJoin's profile side is
  * materialized by an eager localCheckpoint at DataFrame-construction
  * time, BEFORE the timed count — so the ON/OFF walls cover the join +
  * audit only, not the profile build. That exclusion is intended
  * (production reads the profile from a stored table) and symmetric
  * across ON/OFF, but BASELINE rows citing these walls must not be read
  * as end-to-end entry times.
  *
  * Usage: runMain graft.tools.SkewProbe <sfDir> [runs=2]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10/sf10")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[skew] note: walls cover join+audit only — the profile side is " +
      "materialized (localCheckpoint) before t0, symmetrically for ON and OFF")
    for (mode <- Seq("on", "off"); _ <- 1 to runs) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", (mode == "on").toString)
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", (mode == "on").toString)
      val df = graft.queries.EventAnalytics.skewJoin(spark, dir)
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // plan marker from the SAME execution (count plans its own QE, so
      // re-execute via collect on a fresh frame for the marker probe)
      val probe = graft.queries.EventAnalytics.skewJoin(spark, dir)
      probe.collect()
      val skewed = probe.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"[skew] dir=$dir mode=$mode wall=$sec%.2f s rows=$n skewMarker=$skewed")
    }
    spark.stop()
  }
}
