package graft

import graft.nexmark.SparkSpec
import graft.queries.{Similarity, TextPipeline}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Pins for the round-13 additions `s_cell_split` (IVF rebalance),
  * `s_range_search` (exact radius search) and `t_ngram_novelty`
  * (corpus novelty curve).
  *
  * Cell split:
  *   - mass conservation — the two halves partition the original cell
  *     (n_a + n_b = n_before), so a split can never lose or duplicate a
  *     posting;
  *   - the split rule is exactly "occupancy strictly above the mean",
  *     recomputed from the output itself (is_split must equal
  *     n_before · K > N);
  *   - every split is effective: both halves non-empty, so the largest
  *     probed cell strictly shrinks — the serving-cost claim.
  *
  * Range search:
  *   - the PLAN is the designed zero-shuffle scan: no ShuffleExchange
  *     anywhere (queries broadcast, one narrow map pass) — the scaladoc's
  *     100 TB claim as an executable assertion;
  *   - cross-op consistency: every `s_knn_brute` top-k hit at cos6 ≥ τ
  *     appears in the range result (threshold truth contains ranked
  *     truth).
  *
  * Novelty:
  *   - conservation — Σ tot_novel over all (source, decile) buckets is
  *     EXACTLY the corpus-wide distinct shingle count (every distinct
  *     shingle is novel in exactly one doc: its min-doc_id one);
  *   - per-bucket sanity: tot_novel ≤ tot_shingles, and Σ n_docs is the
  *     shingle-eligible (≥ 3 words) doc count.
  */
class RebalanceAndNoveltySpec extends SparkSpec {
  private val Dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("s_cell_split: mass conservation, mean-threshold rule, effective splits") {
    for (dir <- Dirs) {
      // the seed argmins pack (cos6, vec_id) into one BIGINT with a 32-bit
      // id field (Similarity.cellSplit minKey) — guard the bound the pack
      // silently assumes (r13 ADVICE)
      val maxId = Tables.embeddings(spark, dir)
        .agg(max(col("vec_id"))).head.getLong(0)
      assert(maxId < 4294967296L,
        s"fixture vec_id $maxId exceeds the minKey pack's 32-bit id field")
      val rows = Similarity.cellSplit(spark, dir).collect()
      assert(rows.nonEmpty, s"no cells at $dir")
      val k = rows.length.toLong
      val n = rows.map(_.getLong(1)).sum
      val splits = rows.filter(_.getLong(2) == 1L)
      assert(splits.nonEmpty, s"degenerate: no cell above mean occupancy at $dir")
      for (r <- rows) {
        val (cid, nBefore, isSplit) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val (seedA, seedB, nA, nB) =
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(isSplit == (if (nBefore * k > n) 1L else 0L),
          s"split rule mismatch at cell $cid ($dir): n_before=$nBefore k=$k n=$n")
        assert(nA + nB == nBefore, s"mass not conserved at cell $cid ($dir)")
        if (isSplit == 1L) {
          assert(seedA >= 0 && seedB >= 0 && seedA != seedB,
            s"bad seeds at cell $cid ($dir): $seedA/$seedB")
          assert(nA >= 1 && nB >= 1,
            s"ineffective split at cell $cid ($dir): $nA/$nB")
          assert(math.max(nA, nB) < nBefore,
            s"split did not shrink cell $cid ($dir)")
        } else {
          assert(seedA == -1L && seedB == -1L && nA == nBefore && nB == 0L,
            s"non-split cell $cid carries split fields ($dir)")
        }
      }
    }
  }

  test("s_range_search: zero-shuffle plan and containment of ranked truth") {
    for (dir <- Dirs) {
      val rs = Similarity.rangeSearch(spark, dir)
      val shuffles = rs.queryExecution.executedPlan.collectWithSubqueries {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"range search plans ${shuffles.size} shuffle(s) at $dir — scan design lost")
      val range = rs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(range.nonEmpty, s"no in-radius pairs at $dir")
      val brute = Similarity.knnBrute(spark, dir)
        .filter(col("cos6") >= Similarity.RangeTau)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(brute.nonEmpty, s"no thresholded brute hits to check at $dir")
      for (p <- brute)
        assert(range.contains(p), s"brute top-k hit $p missing from range result ($dir)")
    }
  }

  test("t_ngram_novelty: novel-mass conservation and doc accounting") {
    for (dir <- Dirs) {
      val rows = TextPipeline.ngramNovelty(spark, dir).collect()
      assert(rows.nonEmpty, s"no novelty buckets at $dir")
      for (r <- rows) {
        val (tot, novel) = (r.getLong(3), r.getLong(4))
        assert(novel <= tot, s"novel > shingles in bucket ${(r.getString(0), r.getLong(1))} ($dir)")
      }
      // corpus-wide identities, recomputed independently of the operator
      val d = Tables.documents(spark, dir)
        .select(col("doc_id"),
          split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
      val nDocs = d.count()
      val nDistinct = d
        .select(explode(call_function("word_shingles", col("ws"), lit(3))).as("sh"))
        .agg(countDistinct(col("sh"))).head.getLong(0)
      assert(rows.map(_.getLong(2)).sum == nDocs,
        s"n_docs accounting at $dir: ${rows.map(_.getLong(2)).sum} != $nDocs")
      assert(rows.map(_.getLong(4)).sum == nDistinct,
        s"novel mass != distinct shingles at $dir: ${rows.map(_.getLong(4)).sum} != $nDistinct")
    }
  }
}
