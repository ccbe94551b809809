package graft

import graft.nexmark.SparkSpec
import graft.queries.{Similarity, TextPipeline}

/** Pins for the contrastive-mining and hybrid-retrieval entries:
  *
  *   - `s_hard_negatives`: every mined negative really is a
  *     different-label neighbor, ranked by the quantized-cosine contract;
  *   - `s_triplet_mine`: the (anchor, positive, negative) selection rule —
  *     positive shares the anchor's label, the negative doesn't, and the
  *     negative is SEMI-hard (strictly farther than the positive, margin
  *     positive and exactly pos − neg);
  *   - `t_hybrid_rrf`: reciprocal-rank-fusion arithmetic is exactly
  *     Σ 10000 div (60 + rank), the dense ranks agree with the
  *     oracle-gated `s_knn_brute` list, and membership dominance holds
  *     (a doc present in BOTH lists always outranks any single-list doc
  *     — the property that makes RRF a fusion rather than a mixture).
  */
class MiningAndFusionSpec extends SparkSpec {
  private val Dir = "/root/testdata/sf0.01"

  private lazy val labels: Map[Long, Int] =
    graft.Tables.embeddings(spark, Dir).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("s_hard_negatives: different-label, ordered, dense-ranked, no self") {
    val rows = Similarity.hardNegatives(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
                 r.getDouble(4), r.getInt(5)))
    assert(rows.nonEmpty, "degenerate: no hard negatives mined")
    for ((q, rs) <- rows.groupBy(_._1)) {
      assert(q % 50 == 0, s"non-anchor query id $q")
      assert(rs.forall(_._3 != q), s"anchor $q: self admitted")
      assert(rs.forall(t => t._4 != t._2),
        s"anchor $q: a negative shares the anchor label")
      assert(rs.forall(t => labels(t._3) == t._4),
        s"anchor $q: neg_label column disagrees with the embeddings table")
      assert(rs.forall(t => labels(t._1) == t._2),
        s"anchor $q: anchor_label column disagrees with the embeddings table")
      val sorted = rs.sortBy(_._6)
      assert(sorted.map(_._6).toSeq == (1 to rs.length) && rs.length <= 5,
        s"anchor $q: ranks not dense 1..k<=5")
      val key = sorted.map(t => (-t._5, t._3))
      assert(key.zip(key.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) },
        s"anchor $q: rank order violates (cos6 desc, vec_id asc)")
    }
  }

  test("s_triplet_mine: labels, semi-hardness, exact margin, one row per anchor") {
    val rows = Similarity.tripletMine(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
                 r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty, "degenerate: no triplets mined")
    assert(rows.map(_._1).distinct.length == rows.length,
      "an anchor produced more than one triplet")
    for ((q, lab, posId, posCos, negId, negCos, margin) <- rows) {
      assert(labels(posId) == lab, s"anchor $q: positive label mismatch")
      assert(labels(negId) != lab, s"anchor $q: negative shares the label")
      assert(posId != q && negId != q, s"anchor $q: self in triplet")
      assert(negCos < posCos, s"anchor $q: negative not semi-hard")
      assert(margin == posCos - negCos, s"anchor $q: margin not pos - neg")
      assert(margin > 0, s"anchor $q: non-positive margin")
    }
  }

  test("t_hybrid_rrf: exact fusion arithmetic, dense ranks match s_knn_brute, dominance") {
    val fused = TextPipeline.hybridRrf(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(fused.nonEmpty, "degenerate: no fused results")
    val brute = Similarity.knnBrute(spark, Dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(3).toLong)).toMap
    for ((q, doc, spRk, dnRk, rrf, rk) <- fused) {
      assert(q % 50 == 0, s"non-anchor query id $q")
      assert(doc != q, s"query $q: self admitted")
      val expected = (if (spRk > 0) 10000L / (60L + spRk) else 0L) +
                     (if (dnRk > 0) 10000L / (60L + dnRk) else 0L)
      assert(rrf == expected, s"($q,$doc): rrf_bp $rrf != $expected")
      assert(spRk > 0 || dnRk > 0, s"($q,$doc): in neither list")
      if (dnRk > 0)
        assert(brute.get((q, doc)).contains(dnRk),
          s"($q,$doc): dense_rk $dnRk disagrees with s_knn_brute")
    }
    for ((q, rs) <- fused.groupBy(_._1)) {
      val sorted = rs.sortBy(_._6)
      assert(sorted.map(_._6).toSeq == (1L to rs.length.toLong) && rs.length <= 10,
        s"query $q: ranks not dense 1..k<=10")
      // dominance: every doc found by BOTH systems outranks every
      // single-list doc (min two-list score 10000/70 + 10000/65 = 295
      // beats max one-list score 10000/61 = 163)
      val worstBoth = sorted.filter(t => t._3 > 0 && t._4 > 0).map(_._6).maxOption
      val bestSingle = sorted.filter(t => t._3 == 0 || t._4 == 0).map(_._6).minOption
      for (wb <- worstBoth; bs <- bestSingle)
        assert(wb < bs, s"query $q: a single-list doc outranked a both-list doc")
    }
  }
}
