package graft

import graft.nexmark.SparkSpec
import graft.queries.Similarity

/** Pins for metadata-filtered ANN (`s_knn_filtered`) and segment-index
  * merge compaction (`s_index_merge`).
  *
  * Filtered serve:
  *   - audit arithmetic is exact (recall bps, overlap bounds);
  *   - the pre-filter strategy dominates post-filtering on recall — the
  *     production rule the entry exists to demonstrate — and post-filter
  *     can never exceed pre-filter per query: post's true hits are
  *     matching candidates of a probe-set SUBSET (NProbe ⊆
  *     FilteredNProbe cells), and any cohort item outranking a true hit
  *     in pre's cut is itself in the cohort truth, so overlap never
  *     drops;
  *   - pre-filter recall clears the unfiltered-IVF macro floor: the
  *     filter must not cost recall when applied before ranking.
  *
  * Segment merge:
  *   - scan-cost reclaim — scatter-gather over S segments probes
  *     S×NProbe half-sized cells, so its corpus-wide candidate mass must
  *     strictly exceed the merged index's (the cost the compaction
  *     reclaims), while merged recall must not fall below scatter-gather
  *     recall by more than the re-cell noise;
  *   - the merged serve is bit-identical to `s_knn_ivf` (same pivots,
  *     same candidates, same rank) — merge lands on the standard build,
  *     not a third index shape.
  */
class FilteredAndMergeSpec extends SparkSpec {
  private val Dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("s_knn_filtered: exact audit arithmetic and per-query strategy dominance") {
    for (dir <- Dirs) {
      val rows = Similarity.knnFiltered(spark, dir).collect()
      assert(rows.nonEmpty, s"degenerate: no audited queries at $dir")
      for (r <- rows) {
        val qid = r.getLong(0); val nb = r.getLong(1)
        val (np, ovp, ns, ovs, nt, ovt) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
           r.getLong(6), r.getLong(7))
        val (ncPre, ncPart) = (r.getLong(8), r.getLong(9))
        val (preBp, postBp, partBp) = (r.getLong(10), r.getLong(11), r.getLong(12))
        assert(nb > 0, s"empty cohort truth for query $qid at $dir")
        assert(ovp <= math.min(nb, np), s"pre overlap exceeds a side at $qid")
        assert(ovs <= math.min(nb, ns), s"post overlap exceeds a side at $qid")
        assert(ovt <= math.min(nb, nt), s"part overlap exceeds a side at $qid")
        assert(preBp == ovp * 10000 / nb, s"recall_pre_bp arithmetic at $qid")
        assert(postBp == ovs * 10000 / nb, s"recall_post_bp arithmetic at $qid")
        assert(partBp == ovt * 10000 / nb, s"recall_part_bp arithmetic at $qid")
        assert(ncPre >= np && ncPart >= nt, s"served more than scanned at $qid")
        // post's probe cells ⊆ pre's widened cells and the rank order is
        // shared, so per query post-filtering can never beat pre-filtering
        assert(ns <= np && postBp <= preBp,
          s"post-filter beat pre-filter at $qid ($dir): n=$ns/$np bp=$postBp/$preBp")
      }
    }
  }

  test("s_knn_filtered: partitioned >= widened pre-filter >> post-filter on macro recall") {
    // sf0.01's 20 cells saturate the widened probe (pre degenerates to an
    // exact cohort scan); only at sf0.1 (80 cells) do all three strategies
    // actually prune, so the dominance ordering is pinned there
    val rows = Similarity.knnFiltered(spark, "/root/testdata/sf0.1").collect()
    val pre = rows.map(_.getLong(10)).sum.toDouble / rows.length / 10000.0
    val post = rows.map(_.getLong(11)).sum.toDouble / rows.length / 10000.0
    val part = rows.map(_.getLong(12)).sum.toDouble / rows.length / 10000.0
    // measured 0.79: cost-parity probe-widening recovers most of the 0.57
    // naive-width recall hole but saturates on the scattered cohort tail
    assert(pre >= 0.70, f"pre-filter macro recall $pre%.3f below floor 0.70")
    // the label-partitioned index is the production design for
    // low-cardinality filters: it must dominate probe-widening (measured
    // 0.96 vs 0.79) at the unfiltered serve's candidate cost
    assert(part >= 0.90 && part >= pre + 0.05,
      f"partitioned recall $part%.3f below floor 0.90 or not dominating pre $pre%.3f")
    // a 1/|labels| cohort keeps ~1/|labels| of the unfiltered top-k: the
    // selective-filter recall cliff post-filtering is famous for
    assert(post <= pre - 0.2,
      f"post-filter recall $post%.3f not meaningfully below pre $pre%.3f — fixture no longer demonstrates the cliff")
  }

  test("s_knn_range_filtered: audit arithmetic, fetch advantage, strategy ordering") {
    // per-query invariants + the fetch claim at every scale; the recall
    // separation is pinned at sf0.1 below (small fixtures saturate the
    // split budget and seg/pre tie at an exact range scan)
    for (dir <- Dirs :+ "/root/testdata/sf0.1") {
      val rows = Similarity.knnRangeFiltered(spark, dir).collect()
      assert(rows.nonEmpty, s"degenerate: no audited queries at $dir")
      var fetchPre = 0L; var fetchSeg = 0L
      for (r <- rows) {
        val qid = r.getLong(0); val nb = r.getLong(1)
        val (np, ovp, ns, ovs, nt, ovt) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
           r.getLong(6), r.getLong(7))
        val (ncPre, ncSeg, nfPre, nfSeg) =
          (r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11))
        val (preBp, postBp, segBp) = (r.getLong(12), r.getLong(13), r.getLong(14))
        assert(nb > 0, s"empty range truth for query $qid at $dir")
        assert(ovp <= math.min(nb, np) && ovs <= math.min(nb, ns) && ovt <= math.min(nb, nt),
          s"overlap exceeds a side at $qid ($dir)")
        assert(preBp == ovp * 10000 / nb && postBp == ovs * 10000 / nb &&
               segBp == ovt * 10000 / nb, s"recall bp arithmetic at $qid ($dir)")
        assert(ncPre <= nfPre && ncSeg <= nfSeg,
          s"scored more than fetched at $qid ($dir)")
        assert(ncPre >= np && ncSeg >= nt, s"served more than scanned at $qid ($dir)")
        fetchPre += nfPre; fetchSeg += nfSeg
      }
      // the structural claim: the global index fetches ~1/selectivity
      // postings per scored candidate; the segmented index's fetch exceeds
      // its scored mass only by edge-bucket waste
      assert(fetchSeg < fetchPre,
        s"segmented fetch $fetchSeg not below widened-pre fetch $fetchPre at $dir")
    }
  }

  test("s_knn_range_filtered: segmented >= widened pre-filter >> post-filter on macro recall") {
    // sf0.1 (80 global cells, ~19-cell bucket indexes, 6% selectivity):
    // measured seg 0.95 / pre 0.755 / post 0.04 — the narrow-range regime
    // where a time-segmented index beats probe-widening
    val rows = Similarity.knnRangeFiltered(spark, "/root/testdata/sf0.1").collect()
    val n = rows.map(_.getLong(1)).sum.toDouble
    val pre = rows.map(_.getLong(3)).sum / n
    val post = rows.map(_.getLong(5)).sum / n
    val seg = rows.map(_.getLong(7)).sum / n
    assert(seg >= 0.90 && seg >= pre + 0.05,
      f"segmented recall $seg%.3f below floor 0.90 or not dominating pre $pre%.3f")
    assert(pre >= 0.65, f"widened-pre macro recall $pre%.3f below floor 0.65")
    assert(post <= pre - 0.3,
      f"post-filter recall $post%.3f not meaningfully below pre $pre%.3f — fixture no longer demonstrates the cliff")
  }

  test("s_range_lsh: containment, recall floor, sub-scan candidate mass") {
    for (dir <- Dirs) {
      val rows = Similarity.rangeLsh(spark, dir).collect()
      assert(rows.nonEmpty, s"degenerate: no queries at $dir")
      // per-query ground truth recomputed from the exact scan entry
      val exact = Similarity.rangeSearch(spark, dir).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
      var found = 0L; var nExact = 0L; var cands = 0L
      for (r <- rows) {
        val qid = r.getLong(0)
        val (ne, nc, nf, neHi, nfHi) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(ne == exact.getOrElse(qid, 0L),
          s"n_exact diverged from s_range_search at $qid ($dir): $ne vs ${exact.getOrElse(qid, 0L)}")
        assert(nf <= ne && nf <= nc, s"found exceeds exact/cands at $qid ($dir)")
        assert(nfHi <= nf && nfHi <= neHi && neHi <= ne,
          s"hi-radius accounting broken at $qid ($dir)")
        assert(r.getLong(6) == (if (ne == 0) 10000L else nf * 10000 / ne),
          s"recall_bp arithmetic at $qid ($dir)")
        found += nf; nExact += ne; cands += nc
      }
      // macro recall floor (measured 0.575 at sf0.001, 0.64 at sf0.01,
      // 0.708 at sf0.1 — the documented ρ ≈ 0.74 regime at τ = 0.30)
      assert(nExact > 0, s"no exact in-radius mass at $dir")
      assert(found.toDouble / nExact >= 0.55,
        f"macro LSH radius recall ${found.toDouble / nExact}%.3f below floor 0.55 at $dir")
      // sub-scan: candidate mass bounded well below the corpus scan
      val corpus = graft.Tables.embeddings(spark, dir).count() - 1
      assert(cands < rows.length * corpus * 6 / 10,
        s"candidate mass $cands not below 60%% of the scan at $dir")
    }
  }

  test("s_range_lsh_mp: multi-probe lifts recall over single-probe at sub-scan mass") {
    for (dir <- Dirs) {
      val mp = Similarity.rangeLshMp(spark, dir).collect()
      assert(mp.nonEmpty, s"degenerate: no queries at $dir")
      // same truth as the single-probe entry (identical exact-scan rule)
      val sp = Similarity.rangeLsh(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
      var mpFound = 0L; var spFound = 0L; var nExact = 0L; var cands = 0L
      for (r <- mp) {
        val qid = r.getLong(0)
        val (ne, nc, nf) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(ne == sp(qid)._1,
          s"truth diverged from s_range_lsh at $qid ($dir): $ne vs ${sp(qid)._1}")
        assert(nf <= ne && nf <= nc, s"found exceeds exact/cands at $qid ($dir)")
        assert(r.getLong(6) == (if (ne == 0) 10000L else nf * 10000 / ne),
          s"recall_bp arithmetic at $qid ($dir)")
        mpFound += nf; spFound += sp(qid)._2; nExact += ne; cands += nc
      }
      assert(nExact > 0, s"no exact in-radius mass at $dir")
      // the multi-probe claim: strictly more recall than single-probe on
      // the same truth (measured gap ≥ +0.12 recall at every SF), still
      // at sub-scan candidate mass (measured ≤ 0.35; bound 0.40)
      assert(mpFound > spFound,
        s"multi-probe found $mpFound not above single-probe $spFound at $dir")
      val recall = mpFound.toDouble / nExact
      assert(recall >= 0.75,
        f"macro multi-probe recall $recall%.3f below floor 0.75 at $dir")
      val corpus = graft.Tables.embeddings(spark, dir).count() - 1
      assert(cands < mp.length * corpus * 4 / 10,
        s"candidate mass $cands not below 40%% of the scan at $dir")
    }
  }

  test("s_index_merge: audit arithmetic, scan-cost reclaim, merged recall floor") {
    for (dir <- Dirs) {
      val rows = Similarity.indexMerge(spark, dir).collect()
      assert(rows.nonEmpty, s"degenerate: no audited queries at $dir")
      var segCands = 0L; var mergedCands = 0L
      var segBpSum = 0L; var mergedBpSum = 0L
      for (r <- rows) {
        val (qid, nb, ncs, ncm, ovs, ovm, segBp, mergedBp) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
           r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
        assert(ovs <= nb && ovm <= nb, s"overlap exceeds truth at $qid ($dir)")
        assert(segBp == ovs * 10000 / nb, s"recall_seg_bp arithmetic at $qid")
        assert(mergedBp == ovm * 10000 / nb, s"recall_merged_bp arithmetic at $qid")
        assert(ncs > 0 && ncm > 0, s"empty candidate set at $qid ($dir)")
        segCands += ncs; mergedCands += ncm
        segBpSum += segBp; mergedBpSum += mergedBp
      }
      // the reclaim: S segments × NProbe half-sized cells scan more than
      // NProbe full cells of the consolidated index
      assert(segCands > mergedCands,
        s"scatter-gather scanned $segCands <= merged $mergedCands at $dir — no cost to reclaim")
      val mergedRecall = mergedBpSum.toDouble / rows.length / 10000.0
      assert(mergedRecall >= 0.85,
        f"merged macro recall $mergedRecall%.3f below floor 0.85 at $dir")
    }
  }

  test("s_index_merge: the merged serve is bit-identical to s_knn_ivf") {
    val dir = "/root/testdata/sf0.01"
    val ivf = Similarity.knnIvf(spark, dir)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.indexMerge(spark, dir).collect()
    // cross-check through the audit: merged overlap vs truth must equal
    // what auditing s_knn_ivf's rows against the same truth yields
    val b = Similarity.knnBrute(spark, dir)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ovByQ = ivf.filter(b.contains).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for (r <- rows) {
      val qid = r.getLong(0)
      assert(r.getLong(5) == ovByQ.getOrElse(qid, 0L),
        s"merged-serve overlap diverged from s_knn_ivf's at $qid")
    }
  }
}
