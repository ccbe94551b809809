package graft

import graft.nexmark.SparkSpec
import graft.queries.Similarity

/** Pins for the graph-navigation ANN entry (`s_knn_beam`): the operator's
  * value proposition is bounded per-query work (visit
  * O(rounds · beam · GraphK) vertices, independent of N) at usable
  * recall, so the spec pins exactly those two sides — the visited-count
  * ceiling from the construction, and a recall floor against the
  * oracle-gated brute-force ground truth — plus the result-shape
  * contracts the DuckDB gate's hash compare relies on (dense ranks,
  * no self-results, no duplicate vertices).
  */
class BeamSearchSpec extends SparkSpec {
  private val Dir = "/root/testdata/sf0.01"

  private lazy val beam = Similarity.knnBeam(spark, Dir)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4)))

  test("result shape: dense ranks, no self, no duplicate vertices, cos6 ordered") {
    assert(beam.nonEmpty, "degenerate: no beam results")
    val perQ = beam.groupBy(_._1)
    for ((q, rows) <- perQ) {
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length),
        s"query $q: ranks not dense 1..${rows.length}")
      assert(rows.length <= 5, s"query $q: more than TopK rows")
      assert(rows.forall(_._2 != q), s"query $q: self admitted to results")
      assert(rows.map(_._2).distinct.length == rows.length,
        s"query $q: duplicate vertex in results")
      // ranks follow (cos6 desc, vec_id asc) — the quantized-rank contract
      val key = sorted.map(t => (-t._3, t._2))
      assert(key.zip(key.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) },
        s"query $q: rank order violates (cos6 desc, vec_id asc)")
    }
  }

  test("visited cost is bounded by construction: n_visited <= seeds + rounds*beam*NavDegree") {
    // SeedN(12) seed vertices, expanded in round 1 (<= 12*NavDegree new),
    // then at most BeamWidth(24) * NavDegree(12) new vertices in each of
    // the 11 remaining rounds — the per-query bound that is the whole
    // point of graph-navigation serving (independent of corpus size; the
    // symmetrized nav edge list is re-cut to NavDegree per vertex)
    val bound = 12 + 12 * 12 + 11 * 24 * 12
    for ((q, rows) <- beam.groupBy(_._1)) {
      val nv = rows.head._5
      assert(rows.forall(_._5 == nv), s"query $q: n_visited not constant")
      assert(nv >= 1 && nv <= bound, s"query $q: n_visited $nv outside [1, $bound]")
    }
  }

  test("recall@5 vs brute-force ground truth clears the floor") {
    val truth = Similarity.knnBrute(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = beam.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == truth.keySet, "beam must answer every query in the batch")
    val recalls = truth.map { case (q, t) => (got(q) & t).size.toDouble / t.size }
    val macroRecall = recalls.sum / recalls.size
    // pinned from observed runs with headroom (r13 width re-grid measured
    // 1.000 at sf0.01/sf0.001 and 0.985 at sf0.1 — up from 0.98/0.925 at
    // the r12 width-12 walk); a graph, frontier-bookkeeping, or
    // ranking regression (e.g. losing the quantized tie-break, or
    // re-expanding the visited top instead of the unexpanded frontier —
    // both measured 0.18-0.30) craters through this floor
    assert(macroRecall >= 0.95, f"macro recall@5 $macroRecall%.3f below floor 0.95")
  }

  test("per-hop probe is partition-pruned point lookups, never a corpus scan") {
    import org.apache.spark.sql.functions._
    Similarity.buildNavIndex(spark, Dir)
    val q = Similarity.vecs(spark, Dir)
      .filter(col("vec_id") % Similarity.QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
      .localCheckpoint(true)
    val frontierRows = Similarity.beamSeeds(spark, Dir)
      .select("query_id", "vec_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val plan = Similarity.beamRoundScored(spark, Dir, frontierRows, q)
      .queryExecution.executedPlan.toString
    // the hop reads the persisted nav index with a LITERAL partition
    // filter on the frontier's residues — directory pruning at plan time.
    // Must match a NON-EMPTY PartitionFilters list naming sb: every
    // FileSourceScan prints `PartitionFilters: []`, so a bare substring
    // check is vacuous — if the Long-literal isin against the int sb
    // column ever stops unwrapping its cast, pruning silently reverts to
    // a 64-partition scan and only this regex catches it
    val pruned = """PartitionFilters: \[[^\]]*sb[^\]]*\]""".r
    assert(pruned.findFirstIn(plan).isDefined,
      s"nav scan has no non-empty partition filter on sb:\n$plan")
    // and the embedding corpus is NEVER rescanned per hop (the r11
    // finding this redesign removes): the only parquet in the hop plan
    // is the nav index itself
    assert(!plan.contains("embeddings.parquet"),
      s"per-hop corpus scan found:\n$plan")
  }
}
