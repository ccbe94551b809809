package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for `s_knn_beam` recall: separates the three candidate
  * ceilings — (a) the kNN graph's own quality (do the query vertex's
  * out-edges contain the true top-k?), (b) reachability (is the true
  * top-k within h symmetrized hops of the seed centroids at all?), and
  * (c) the search (what does the beam actually find?) — so a recall
  * regression can be attributed to graph build, connectivity, or
  * search parameters instead of guessed at.
  *
  * runMain graft.tools.BeamProbe [sfDir]
  */
object BeamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Similarity

    def pairs(df: DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val truth = pairs(Similarity.knnBrute(spark, dir).select("query_id", "vec_id"))
    val graph = pairs(Similarity.knnGraphScaled(spark, dir).select("query_id", "vec_id"))
    val beam = pairs(Similarity.knnBeam(spark, dir).select("query_id", "vec_id"))

    def recall(got: Map[Long, Set[Long]]): Double = {
      val rs = truth.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val graphPinned = pairs(Similarity.knnGraph(spark, dir).select("query_id", "vec_id"))
    println(f"graph recall (scaled-build out-edges vs brute top-5): ${recall(graph)}%.3f")
    println(f"graph recall (pinned-build out-edges vs brute top-5): ${recall(graphPinned)}%.3f")
    println(f"beam  recall (s_knn_beam result vs brute top-5):      ${recall(beam)}%.3f")

    // reachability: BFS from each query's SeedN seed vertices over the
    // symmetrized NavDegree-cut edge list (= the persisted navigation
    // index), h hops — the ceiling ANY search with these seeds/edges/
    // round-count can reach
    val ed = Similarity.knnGraphScaledAt(spark, dir, Similarity.NavGraphK)
      .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos6"))
    val sym = ed.unionByName(ed.select(col("dst").as("src"), col("src").as("dst"), col("cos6")))
      .groupBy("src", "dst").agg(max("cos6").as("cos6"))
    val adjAll = sym.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).take(Similarity.NavDegree).map(_._2).toSet).toMap
    val queries = truth.keySet
    // seeds: the entry's own election — top-SeedN pivot vertices by cos6
    val seeds = pairs(Similarity.beamSeeds(spark, dir))
    for (h <- 1 to 10) {
      val reach = queries.toSeq.map { q =>
        var frontier = seeds.getOrElse(q, Set.empty)
        var seen = frontier
        for (_ <- 1 to h) {
          frontier = frontier.flatMap(adjAll.getOrElse(_, Set.empty)) -- seen - q
          seen ++= frontier
        }
        (seen & truth(q)).size.toDouble / truth(q).size
      }
      println(f"reachability ceiling at $h hops (unbounded beam): ${reach.sum / reach.size}%.3f")
    }
    spark.stop()
  }
}
