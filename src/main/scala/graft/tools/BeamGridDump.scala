package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dump for the r13 RobustPrune driver-side grid (numpy twin of
  * the beam walk, the r12 BeamProbe protocol): candidate edge pools at a
  * wide cut + the norm-filtered vectors, at a given fixture.
  */
object BeamGridDump {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/beamgrid")
    val k = args.lift(2).map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Similarity
    Similarity.knnGraphScaledAt(spark, dir, k)
      .select("query_id", "vec_id", "cos6")
      .write.mode("overwrite").parquet(s"$out/cands")
    Similarity.vecs(spark, dir).select(col("vec_id"), col("emb"))
      .write.mode("overwrite").parquet(s"$out/vecs")
    println(s"dumped to $out")
    spark.stop()
  }
}
