package graft.tools

import org.apache.spark.sql.SparkSession

/** Convergence-trace probe for `s_kmeans_conv` on a given fixture: runs
  * the real [[graft.queries.Similarity.kmeansIterate]] at an exploratory
  * round cap and prints the full (round, moved, inertiaQ) trace — the
  * probe that calibrates the entry's round cap / oracle unroll depth
  * when a fixture's geometry changes (r13: the interpolant ScaleUp).
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1/sf1")
    val cap = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (_, trace) = graft.queries.Similarity.kmeansIterate(spark, dir, cap)
      trace.foreach(t => println(s"round ${t.round} moved ${t.changed} inertiaQ ${t.inertiaQ}"))
      println(s"CONVERGED in ${trace.size} rounds")
    } catch {
      case e: IllegalStateException => println(s"NOT CONVERGED: ${e.getMessage}")
    }
    spark.stop()
  }
}
