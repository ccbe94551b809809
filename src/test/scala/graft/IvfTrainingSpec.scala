package graft

import graft.nexmark.SparkSpec
import graft.queries.Similarity
import org.apache.spark.sql.functions.{col, count, lit}

/** IVF coarse-centroid training (Similarity.trainedCoarseCentroids): a
  * real vector pipeline retrains its coarse quantizer with k-means and
  * reindexes. The trained centroids flow through the EXACT knnIvf
  * probe/assign/rank path via knnIvfWithCentroids (not a spec
  * reimplementation), and the deterministic pivot cells stay the
  * cross-engine oracle (`s_knn_ivf`, `s_ann_recall`).
  *
  * What training guarantees — and what it does not: Lloyd's from the
  * pivot initialization monotonically tightens CELL COMPACTNESS (the
  * quantization objective), which is the invariant asserted here.
  * Recall@k at a fixed nprobe is NOT monotone in compactness, and on
  * this ISOTROPIC synthetic fixture it measurably does not improve
  * (0.96 pivot → 0.90 trained at nprobe=3, with a comparable scanned-
  * candidate budget, 680 vs 725 — balanced trained cells spread true
  * neighbors across more cells, while the skewed pivot cells over-scan
  * their big cells into higher recall). On a real clustered corpus the
  * compactness gain is what buys recall; here the numbers are reported
  * so the tradeoff stays measured, not assumed. `s_ann_recall` remains
  * the per-reindex recall audit that would catch a bad trade in
  * production.
  */
class IvfTrainingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  test("training tightens the quantization objective it optimizes (inertia vs pivot init)") {
    // round 1 of the trace IS the pivot-cell assignment; the converged
    // round's quantized inertia must sit strictly below it (the fixture
    // converges well past any ±1-quantum-per-point wobble)
    val trace = Similarity.kmeansTrace(spark, dir)
    assert(trace.size >= 2, "fixture converged instantly — nothing trained")
    assert(trace.last.inertiaQ < trace.head.inertiaQ,
      s"training did not tighten cells: ${trace.last.inertiaQ} >= ${trace.head.inertiaQ}")
  }

  test("trained index serves through the production path; recall/cost stays measured") {
    val truth = topkSets(Similarity.knnBrute(spark, dir))
    val pivot = topkSets(Similarity.knnIvfWithCentroids(spark, dir, null))
    val trainedCents = Similarity.trainedCoarseCentroids(spark, dir)
    val trained = topkSets(Similarity.knnIvfWithCentroids(spark, dir, trainedCents))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }
    val (rPivot, rTrained) = (recall(pivot), recall(trained))
    val sPivot = Similarity.scannedCandidates(spark, dir, null)
    val sTrained = Similarity.scannedCandidates(spark, dir, trainedCents)
    info(f"recall@k pivot=$rPivot%.3f trained=$rTrained%.3f over ${truth.size} queries")
    info(f"scanned candidates pivot=$sPivot trained=$sTrained")
    // the trained index must be a working index (non-degenerate recall at
    // a sane scan budget), and every query must still get answers
    assert(rTrained > 0.5, f"trained index degenerate: recall $rTrained%.3f")
    assert(trained.keySet == truth.keySet, "trained index dropped queries")
    assert(sTrained < 3L * sPivot, "trained probe scans exploded vs pivot cells")
  }

  test("incremental index: recall-delta vs the full pivot index stays bounded; retrain rule exact") {
    // the merged (base-cells-only) index serves today's delta without a
    // retrain; its aggregate recall must stay a working index AND the
    // delta vs the full pivot index (annRecall, all cells) must stay
    // inside the band a retrain decision is made on — if incremental
    // maintenance cost more than ~25 recall points, daily ingest without
    // retrain would be the wrong default and this entry's premise breaks
    for (d <- Seq("/root/testdata/sf0.001", dir)) {
      val inc = Similarity.incrementalIndex(spark, d)
        .select("query_id", "n_brute", "n_overlap", "recall_bp", "retrain").collect()
      assert(inc.nonEmpty)
      val incRecall = inc.map(_.getLong(2)).sum.toDouble / inc.map(_.getLong(1)).sum
      val full = Similarity.queries("s_ann_recall")(spark, d)
        .select("n_brute", "n_overlap").collect()
      val fullRecall = full.map(_.getLong(1)).sum.toDouble / full.map(_.getLong(0)).sum
      info(f"$d: incremental recall=$incRecall%.3f vs full-index=$fullRecall%.3f")
      assert(incRecall > 0.5, f"$d: merged index degenerate: $incRecall%.3f")
      assert(incRecall >= fullRecall - 0.25,
        f"$d: incremental serve lost ${fullRecall - incRecall}%.3f recall vs a rebuild — " +
          "beyond the no-retrain band")
      // the retrain verdict is exactly the integer 0.8 rule, per query
      for (r <- inc)
        assert((r.getInt(4) == 1) == (r.getLong(2) * 5 < 4 * r.getLong(1)),
          s"retrain flag inconsistent on query ${r.getLong(0)}")
    }
  }

  test("kNN-graph PageRank: mass bounded, teleport floor exact, centrality tracks in-degree") {
    for (d <- Seq("/root/testdata/sf0.001", dir)) {
      val pr = Similarity.queries("s_knn_pagerank")(spark, d).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = pr.size
      assert(n > 0 && pr.values.forall(_ > 0), s"$d: non-positive ranks")
      // floor losses only shrink mass; the damped loop keeps ≥ ~80%
      val total = pr.values.sum.toDouble
      assert(total <= 1.000001e12, s"$d: rank mass grew: $total")
      assert(total >= 0.8e12, s"$d: rank mass collapsed: $total")
      // in-degree over the SCALED build — the graph the entry consumes
      // since r12 (r11 VERDICT Next #1)
      val indeg = Similarity.queries("s_knn_graph_scaled")(spark, d)
        .groupBy(col("vec_id")).agg(count(lit(1)).as("ind")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // a node nobody links to gets EXACTLY the teleport floor
      val floorVal = (15L * (1000000000000L / n)) / 100L
      val sinks = pr.keySet -- indeg.keySet
      for (v <- sinks) assert(pr(v) == floorVal,
        s"$d: zero-in-degree node $v at ${pr(v)} != teleport floor $floorVal")
      assert(sinks.isEmpty || pr.values.max > floorVal,
        s"$d: nobody above the teleport floor — propagation vacuous")
      // centrality must track the graph: the max-rank node's in-degree
      // is above the mean in-degree
      val top = pr.maxBy(_._2)._1
      val meanInd = indeg.values.sum.toDouble / n
      assert(indeg.getOrElse(top, 0L).toDouble >= meanInd,
        s"$d: top-ranked node has below-average in-degree")
    }
  }

  test("trained centroids keep the (cid, cemb) contract and the index shape") {
    val cent = Similarity.trainedCoarseCentroids(spark, dir)
    assert(cent.columns.toSeq == Seq("cid", "cemb"))
    val n = cent.count()
    // converged k-means may only lose (empty) cells vs the pivot init,
    // never invent new ones
    val pivots = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id % 25 = 0").count()
    assert(n > 0 && n <= pivots, s"$n trained cells vs $pivots pivot cells")
  }
}
