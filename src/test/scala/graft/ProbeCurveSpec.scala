package graft

import graft.nexmark.SparkSpec
import graft.queries.Similarity

/** Pins for `s_probe_curve` (the IVF recall-vs-cost tuning curve):
  *
  *   - cross-entry consistency — the np = NProbe(3) row must equal
  *     `s_ann_recall`'s macro aggregate exactly (same probe order, same
  *     rank contract); the curve and the production point can never
  *     drift apart;
  *   - nesting — probe sets nest, so total_cands is non-decreasing
  *     in nprobe and hits at the widest width is the curve maximum
  *     (per-width hits need not be monotone: a wider cut can surface a
  *     rounded-cos tie that displaces a truth row, so only the endpoint
  *     claim is structural);
  *   - audit arithmetic — recall_bp = hits · 10⁴ div n_truth, n_truth =
  *     TopK · |queries|.
  */
class ProbeCurveSpec extends SparkSpec {
  private val Dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("s_probe_curve: np=NProbe row equals s_ann_recall; cands nest; exact arithmetic") {
    for (dir <- Dirs) {
      val curve = Similarity.probeCurve(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      assert(curve.map(_._1).toSeq == (1L to 5L), s"missing widths at $dir")
      val nTruth = curve.head._3
      for ((np, cands, nt, hits, bp) <- curve) {
        assert(nt == nTruth, s"n_truth varies across widths at $dir")
        assert(hits <= nt, s"hits exceed truth at np=$np ($dir)")
        assert(bp == hits * 10000 / nt, s"recall_bp arithmetic at np=$np ($dir)")
      }
      // non-decreasing, not strictly increasing: probe sets nest, but an
      // IVF cell can be EMPTY (a centroid need not be its own nearest
      // centroid), so a wider probe can add zero candidates on a different
      // fixture despite correct operator output (r13 ADVICE)
      assert(curve.map(_._2).toSeq == curve.map(_._2).toSeq.sorted,
        s"total_cands not non-decreasing at $dir")
      assert(curve.last._4 == curve.map(_._4).max,
        s"widest width is not the hits maximum at $dir")
      // the production point: s_ann_recall's macro aggregate, recomputed
      val ar = Similarity.annRecall(spark, dir).collect()
      val hits3 = ar.map(_.getLong(3)).sum
      val truth3 = ar.map(_.getLong(1)).sum
      val row3 = curve.find(_._1 == 3L).get
      assert(row3._3 == truth3 && row3._4 == hits3,
        s"np=3 row (${row3._4}/${row3._3}) != s_ann_recall aggregate ($hits3/$truth3) at $dir")
    }
  }

  test("s_serve_ndcg: exact integer arithmetic, hit mass equals s_ann_recall's") {
    for (dir <- Dirs) {
      val rows = Similarity.serveNdcg(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                   r.getLong(4), r.getLong(5)))
      assert(rows.nonEmpty, s"no queries at $dir")
      for ((qid, nHits, dcg, firstRk, ndcgBp, mrrBp) <- rows) {
        assert(nHits <= 5 && ndcgBp <= 10000, s"bounds broken at $qid ($dir)")
        assert((nHits == 0) == (dcg == 0L) && (nHits == 0) == (firstRk == 0L),
          s"zero-hit accounting at $qid ($dir)")
        if (firstRk > 0)
          assert(mrrBp == 10000 / firstRk, s"mrr arithmetic at $qid ($dir)")
        // a full sweep of 5 hits at served ranks 1..5 IS the ideal ranking
        if (nHits == 5)
          assert(ndcgBp == 10000, s"5 hits must be the ideal DCG at $qid ($dir)")
      }
      // same serve (knnIvf), same truth (knnBrute) as s_ann_recall: the
      // rank-aware audit's hit MASS must equal the recall audit's
      val ar = Similarity.annRecall(spark, dir).collect()
      assert(rows.map(_._2).sum == ar.map(_.getLong(3)).sum,
        s"hit mass diverged from s_ann_recall at $dir")
    }
  }
}
