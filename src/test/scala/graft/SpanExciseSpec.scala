package graft

import graft.nexmark.SparkSpec
import graft.queries.TextPipeline
import org.apache.spark.sql.functions._

/** Semantics pins for `t_span_excise` (the excised-corpus stage over
  * `t_dup_spans`' detections):
  *
  *   - mass conservation — `kept_tokens + excised_tokens = n_tokens` on
  *     every emitted row, and the cleaned text really contains exactly
  *     `kept_tokens` whitespace tokens (the ledger is the text, not a
  *     parallel estimate);
  *
  *   - excision policy — only the HIGHER-doc_id occurrence of each
  *     detected pair is cut (every affected doc appears as some pair's
  *     doc_b; dupSpans guarantees doc_a < doc_b), so the corpus-first
  *     copy of a repeated passage always survives somewhere;
  *
  *   - exactness — the cleaned text equals an independent Scala twin:
  *     original normalized tokens minus the union of detected doc_b
  *     intervals, order preserved (overlapping detections from several
  *     partners excise each token at most once);
  *
  *   - planted end-to-end — a corpus with one 20-token passage copied
  *     into three docs excises it from the two later docs only, with the
  *     surrounding unique text intact.
  */
class SpanExciseSpec extends SparkSpec {
  private val Dir = "/root/testdata/sf0.01"

  private def norm(s: String): Array[String] =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim.split(" ")

  test("mass conservation: kept + excised = n_tokens, and the cleaned text has kept_tokens tokens") {
    val rows = TextPipeline.spanExcise(spark, Dir).collect()
    assert(rows.nonEmpty, "degenerate: no excisions at sf0.01")
    for (r <- rows) {
      val (n, sp, ex, kept, txt) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      assert(kept + ex == n, s"doc ${r.getLong(0)}: kept $kept + excised $ex != $n")
      assert(sp >= 1 && ex >= 1, s"doc ${r.getLong(0)}: emitted without any excision")
      val gotTokens = if (txt.isEmpty) 0 else txt.split(" ").length
      assert(gotTokens == kept,
        s"doc ${r.getLong(0)}: cleaned text has $gotTokens tokens, ledger says $kept")
    }
  }

  test("cleaned text equals the Scala twin: tokens minus the union of doc_b intervals") {
    val spans = TextPipeline.dupSpans(spark, Dir).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))) // (doc_b, b_start, span_tokens)
    val cut: Map[Long, Set[Long]] = spans.groupBy(_._1).view.mapValues(_.toSeq
      .flatMap { case (_, s, len) => s until (s + len) }.toSet).toMap
    val docs = Tables.documents(spark, Dir)
      .filter(col("doc_id").isin(cut.keys.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), norm(r.getString(1)))).toMap
    val got = TextPipeline.spanExcise(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getString(5))).toMap
    assert(got.keySet == cut.keySet, "affected-doc set != docs with doc_b detections")
    for ((id, positions) <- cut) {
      val expect = docs(id).zipWithIndex
        .collect { case (w, i) if !positions.contains(i + 1L) => w }.mkString(" ")
      assert(got(id) == expect, s"doc $id: cleaned text diverges from the Scala twin")
    }
  }

  test("planted corpus: a passage copied into three docs is excised from the two later docs only") {
    import spark.implicits._
    val passage = (1 to 20).map(i => s"copied$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon zeta eta theta"),
      (2L, s"one two three four five $passage six seven eight nine ten"),
      (3L, s"$passage unique tail words here padding more filler tokens"),
      (4L, "entirely unrelated text with no shared runs at all whatsoever"))
    val dir = java.nio.file.Files.createTempDirectory("spanex").toFile
    dir.deleteOnExit()
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
    val out = TextPipeline.spanExcise(spark, dir.getPath).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getString(5)))).toMap
    assert(out.keySet == Set(2L, 3L), s"expected docs 2,3 excised, got ${out.keySet}")
    assert(out(2L)._1 == 20 && out(2L)._2 ==
      "one two three four five six seven eight nine ten")
    assert(out(3L)._1 == 20 && out(3L)._2 ==
      "unique tail words here padding more filler tokens")
  }
}
