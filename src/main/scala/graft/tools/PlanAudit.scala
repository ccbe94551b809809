package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-quality audit over every batch SparkEntry query (stream_* entries
  * are skipped — see the note at the loop): counts shuffles, join
  * strategies, codegen coverage, and scan pruning — the checklist the
  * 100 TB design review cares about. runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-24s ${"xchg"}%4s ${"bhj"}%4s ${"smj"}%4s ${"bnlj"}%5s ${"sortagg"}%7s ${"gwin"}%5s  readSchemaCols")
    var globalWindows = 0
    // stream_* entries RUN a whole streaming pipeline inside the query fn
    // and return only the sink re-read — auditing that scan is meaningless
    // and slow; their plan story is the streaming specs + bench numbers
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_")).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        val s = plan.toString
        def c(p: String) = p.r.findAllIn(s).size
        // partition-less WindowExec: every row through ONE task — the
        // scale-killer pattern. Detected from the logical plan: a Window
        // node with an empty partitionBy spec.
        val gwin = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.size
        globalWindows += gwin
        val scans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(s)
          .map(_.group(1).split(",").length).toSeq
        println(f"$name%-24s ${c("Exchange")}%4d ${c("BroadcastHashJoin")}%4d " +
          f"${c("SortMergeJoin")}%4d ${c("BroadcastNestedLoopJoin")}%5d " +
          f"${c("SortAggregate")}%7d $gwin%5d  ${scans.mkString(",")}")
      } catch { case e: Throwable =>
        println(f"$name%-24s ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(60)}") }
    }
    // Sanctioned global windows, every one over a bounded-by-construction
    // input: r_monthly_trend's post-aggregation lag (calendar-sized —
    // Relational.scala comment) and t_dsir_select's two (the 64-row
    // bucket-distribution totals and the rank over the top-DsirKeep cut
    // AFTER TakeOrderedAndProject — TextPipeline.dsirSelect comments).
    println(s"global-window (no partition) occurrences: $globalWindows " +
      "(expected: 3 — r_monthly_trend x1, t_dsir_select x2, all bounded inputs)")
    spark.stop()
  }
}
