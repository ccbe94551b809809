package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off cardinality probe for the t_winnow_pairs second-decade
  * exponent (BASELINE.md §Scaling watch item): measures each stage's
  * row counts and the df-capped pair volume at a given SF, so a
  * superlinear wall-clock can be attributed to DATA (pair mass) or to
  * EXECUTION (spill/memory) by comparing decades.
  *
  * Usage: runMain graft.tools.WinnowProbe <sfDir>
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    val wd = t("fingerprints (distinct doc,hash)") {
      val w = graft.queries.TextPipeline.queries("t_winnow_fingerprint")(spark, dir)
        .select(col("doc_id"), col("min_hash")).distinct().localCheckpoint(true)
      w.count()
    }
    val wdf = graft.queries.TextPipeline.queries("t_winnow_fingerprint")(spark, dir)
      .select(col("doc_id"), col("min_hash")).distinct().localCheckpoint(true)
    val dfDist = t("df histogram") {
      wdf.groupBy(col("min_hash")).agg(count(lit(1)).as("hdf"))
        .select(
          sum(when(col("hdf") <= 50, lit(1)).otherwise(lit(0))).as("kept_buckets"),
          sum(when(col("hdf") > 50, lit(1)).otherwise(lit(0))).as("capped_buckets"),
          sum(when(col("hdf") <= 50, col("hdf") * (col("hdf") - 1) / 2).otherwise(lit(0)))
            .as("pair_volume"))
        .collect()(0).toSeq
    }
    val pairs = t("final pairs") {
      graft.queries.TextPipeline.queries("t_winnow_pairs")(spark, dir).count()
    }
    println(s"SUMMARY dir=$dir wd=$wd dfdist=$dfDist pairs=$pairs")
    spark.stop()
  }
}
