package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{Similarity, TextPipeline}

/** Convergence diagnostic for the connected-components paths on a scale
  * fixture (r9 scale gate): rebuilds `s_cosine_cc`'s verified-pair edge
  * buckets at the given dir and runs [[TextPipeline.ccIterate]] with a
  * raised round guard, tracing the per-round label sum — the evidence
  * needed to tell "long-chain graph, needs more rounds" apart from "label
  * propagation stopped making progress" when a fixture (like the sf1 perf
  * fixture) pushes the dup graph past bench shape.
  *
  * Usage: runMain graft.tools.CcProbe <sfDir> [maxRounds=100]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxRounds = args.drop(1).find(_ != "mass").map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Similarity.vecs(spark, dir)
    val n = graft.Tables.embeddings(spark, dir).count()
    // bucket pair mass FIRST (no pair materialization): Σ C(|bucket|,2)
    // bounds the candidate join's shuffle write — the r15 sf100 disk
    // budget question (s_cosine_cc filled 60 GB of scratch)
    if (args.contains("mass")) {
      val m = Similarity.dupLshBands(e, n)
        .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2")).as("pair_mass"),
             max(col("n")).as("max_bucket"), count(lit(1)).as("n_buckets")).head()
      println(s"[ccprobe] pair_mass=${m.getLong(0)} max_bucket=${m.getLong(1)} " +
        s"n_buckets=${m.getLong(2)}")
      spark.stop(); return
    }
    val pairs = Similarity.verifiedDupPairs(e, n).localCheckpoint(true)
    val nPairs = pairs.count()
    val buckets = pairs
      .select(col("vec_a").as("doc_id"), col("vec_a").as("band"), col("vec_b").as("bkey"))
      .unionByName(pairs
        .select(col("vec_b").as("doc_id"), col("vec_a").as("band"), col("vec_b").as("bkey")))
    println(s"[ccprobe] $dir: verified pairs = $nPairs")
    val t0 = System.nanoTime()
    val (labels, rounds) = TextPipeline.ccIterate(buckets, maxRounds,
      (r, s) => println(f"[ccprobe] round $r%3d labelSum = $s"))
    val nComponents = labels.select(col("cluster_id")).distinct().count()
    println(s"[ccprobe] converged in $rounds rounds, $nComponents components, " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
