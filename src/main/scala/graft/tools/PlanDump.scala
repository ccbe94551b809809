package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every (non-stream) SparkEntry query to
  * <outDir>/<name>_<tag>.txt — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/.
  *
  *   runMain graft.tools.PlanDump <outDir> <tag> [sfDir] [entry,entry,...]
  *
  * stream_* entries are skipped for the same reason PlanAudit skips them:
  * the query fn RUNS the whole streaming pipeline and returns a sink
  * re-read, whose scan plan says nothing about the pipeline.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.stream.dumpInputs", "false")
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"dumped $name")
        } catch { case e: Throwable =>
          println(s"FAILED $name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    spark.stop()
  }
}
