package graft

import graft.nexmark.SparkSpec
import graft.queries.Similarity

/** Differential pin for `s_knn_labelprop`: the DataFrame round chain must
  * equal a straight-line Scala twin of synchronous LPA — same symmetrized
  * edge set, same (count DESC, label ASC) vote argmax, same round count —
  * on real sf0.001 data (500 nodes, ~2.5k directed edges). Plus the
  * structural invariants: every community label is a real vec_id (labels
  * only ever copy initial labels), sizes partition the node set, and the
  * result is coarser than singletons (the kNN graph is never vote-free).
  */
class LabelPropSpec extends SparkSpec {

  test("label propagation equals the Scala twin on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.knnLabelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // the entry consumes the production-shape SCALED build (r11 VERDICT
    // Next #1) — the twin must propagate over the same edge set
    val dirEdges = Similarity.knnGraphScaled(spark, dir)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = (dirEdges ++ dirEdges.map(_.swap)).distinct
    val nodes = out.map(_._1).distinct.sorted
    val nbrs = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }

    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lbl = nodes.map { v =>
        val votes = nbrs.getOrElse(v, Array.empty[Long]).map(lbl)
        if (votes.isEmpty) v -> lbl(v)
        else {
          val best = votes.groupBy(identity).toSeq.map { case (l, vs) => (vs.size, l) }
            .reduceLeft((a, b) =>
              if (a._1 != b._1) { if (a._1 > b._1) a else b }
              else { if (a._2 < b._2) a else b })
          v -> best._2
        }
      }.toMap
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }
    val expected = nodes.map(v => (v, lbl(v), sizes(lbl(v)))).toSet
    assert(out.toSet == expected,
      s"diff=${(out.toSet -- expected).take(5)} / ${(expected -- out.toSet).take(5)}")

    // structural invariants
    val nodeSet = nodes.toSet
    assert(out.forall(r => nodeSet.contains(r._2)), "label must be a real vec_id")
    assert(out.map(_._1).distinct.length == out.length)
    val commSizes = out.map(r => (r._2, r._3)).distinct
    assert(commSizes.map(_._2).sum == out.length.toLong, "sizes partition the nodes")
    assert(commSizes.length < out.length, "LPA must coarsen beyond singletons")
  }
}
