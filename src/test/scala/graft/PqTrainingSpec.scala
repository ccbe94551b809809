package graft

import graft.nexmark.SparkSpec
import graft.queries.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PQ codebook training (Similarity.trainPqCodebooks): the trained
  * codebooks must beat the deterministic pivot codebooks on BOTH metrics
  * that matter to a PQ index — encode distortion (what Lloyd's
  * optimizes) and end-to-end ADC recall against exact L2 neighbors (what
  * the index exists for). The pivot-codebook entries stay the
  * cross-engine oracles (s_knn_pq / s_knn_ivfpq); this spec is the
  * warrant that the training path improves on them.
  */
class PqTrainingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val TopK = 5

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  test("trained codebooks: lower distortion and no worse ADC recall than pivots") {
    val subs = Similarity.pqSubsOf(spark, dir).localCheckpoint(true)
    val pivotCw = Similarity.pqCodewords(subs)
    val trainedCw = Similarity.trainPqCodebooks(spark, dir)

    // encode distortion: sum over (vector, subspace) of the argmin d2,
    // same ((ssq - 2*s.c) + csq) composition the encoder ranks by
    def distortion(cw: DataFrame): Double =
      subs.join(broadcast(cw), "j")
        .withColumn("d2",
          (col("ssq") - lit(2.0) * call_function("dot_product", col("sub"), col("cwv"))) + col("csq"))
        .groupBy(col("vec_id"), col("j")).agg(min(col("d2")).as("md2"))
        .agg(sum(col("md2"))).head.getDouble(0)

    val pivotDist = distortion(pivotCw)
    val trainedDist = distortion(trainedCw)
    assert(trainedDist < pivotDist,
      s"training did not reduce encode distortion: $trainedDist >= $pivotDist")

    // ADC recall@5 against exact L2 top-5 on the raw embeddings
    val embs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", expr("sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x))"))
      .filter(col("nrm") > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def reconOf(cw: DataFrame): Map[Long, Array[Double]] =
      Similarity.pqReconstructWith(subs, cw)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def recallOf(recon: Map[Long, Array[Double]]): Double = {
      val queries = embs.keys.toSeq.filter(_ % 50 == 0).sorted
      val perQuery = queries.map { q =>
        val qe = embs(q)
        def top5(space: Map[Long, Array[Double]]): Set[Long] =
          space.keys.toSeq.filter(_ != q)
            .sortBy(c => (l2(qe, space(c)), c)).take(TopK).toSet
        (top5(embs) intersect top5(recon)).size.toDouble / TopK
      }
      perQuery.sum / perQuery.size
    }
    val pivotRecall = recallOf(reconOf(pivotCw))
    val trainedRecall = recallOf(reconOf(trainedCw))
    info(f"distortion pivot=$pivotDist%.3f trained=$trainedDist%.3f; " +
      f"recall@5 pivot=$pivotRecall%.3f trained=$trainedRecall%.3f")
    assert(trainedRecall >= pivotRecall,
      s"trained ADC recall $trainedRecall < pivot recall $pivotRecall")
    assert(trainedRecall > 0.0, "degenerate: zero recall on the fixture")
  }

  test("trained codebooks keep the pqEncode consumable shape and drop into serving") {
    val subs = Similarity.pqSubsOf(spark, dir).localCheckpoint(true)
    val trainedCw = Similarity.trainPqCodebooks(spark, dir)
    assert(trainedCw.columns.toSeq == Seq("code", "j", "cwv", "csq"))
    // every (vector, subspace) still encodes to exactly one codeword
    val recon = Similarity.pqReconstructWith(subs, trainedCw)
    val n = recon.count()
    val dims = recon.select(size(col("remb")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(n == subs.select("vec_id").distinct().count())
    assert(dims == Seq(64), s"reconstruction dims drifted: $dims")
  }
}
