package graft.tools

import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPQ/PQ gain measurement (r13 VERDICT Next #7, trained-codebook half):
  * total encode distortion — Σ over (vector, subspace) of the argmin
  * ((s·s − 2 s·c) + c·c), the quantity Lloyd's minimizes and the PQ
  * serving error proxy — for the four codebook × layout combinations:
  *
  *   pivot/contiguous, trained/contiguous, pivot/OPQ-permuted,
  *   trained/OPQ-permuted (the full OPQ-P pipeline: permute → train).
  *
  * Run against the standard fixture AND the `aniso` ScaleUp profile to
  * record how much of the rotation family's value survives or appears
  * under each spectrum. One JSON line per combination.
  *
  * Usage: runMain graft.tools.PqGainProbe <sfDir>
  */
object PqGainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same d2 composition as the encoder; distortion summed exactly over
    // the per-(vector, subspace) argmin
    def distortion(subs: DataFrame, cw: DataFrame): Double =
      subs.join(broadcast(cw), "j")
        .withColumn("d2",
          (col("ssq") - lit(2.0) * call_function("dot_product", col("sub"), col("cwv"))) + col("csq"))
        .groupBy(col("vec_id"), col("j")).agg(min(col("d2")).as("md2"))
        .agg(sum(col("md2"))).head.getDouble(0)

    for ((layout, subsRaw) <- Seq(
        "contiguous" -> Similarity.pqSubsOf(spark, dir),
        "opq_permuted" -> Similarity.opqPermutedSubs(spark, dir))) {
      val subs = subsRaw.localCheckpoint(true)
      val pivot = Similarity.pqCodewords(subs)
      val trained = Similarity.trainPqCodebooksOn(subs)
      for ((cb, cw) <- Seq("pivot" -> pivot, "trained" -> trained)) {
        val d = distortion(subs, cw)
        println(f"""PQGAIN {"layout":"$layout","codebook":"$cb","distortion":$d%.3f,"dir":"$dir"}""")
      }
    }
    spark.stop()
  }
}
