package graft

import graft.nexmark.SparkSpec
import graft.queries.{Similarity, TextPipeline}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 tokenizer/selection/quantization
  * operators, beyond their tri-scale oracle gates:
  *
  *   - BPE training genuinely iterates (later merges consume earlier
  *     rounds' output) and conserves mass: every merge removes exactly
  *     pair_count symbol occurrences, so the segmented corpus size equals
  *     initial char count minus the summed pair counts — an EXACT
  *     cross-check between the merge table and the applied vocab.
  *   - Binary (sign-bit) search: the Hamming prefilter genuinely prunes
  *     (recall@5 vs the brute oracle is imperfect) but the exact rerank
  *     keeps it useful (recall well above random). Both bounds pinned.
  *   - DSIR selection enriches the curated target sources above their
  *     base rate — the operator's entire point.
  *   - LM perplexity terciles are balanced per language (ntile contract).
  */
class TokenizerAndSelectionSpec extends SparkSpec {

  private val Sf001 = "/root/testdata/sf0.001"
  private val Sf01 = "/root/testdata/sf0.01"

  test("BPE merges iterate and conserve symbol mass against the applied vocab") {
    for (dir <- Seq(Sf001, Sf01)) {
      val merges = TextPipeline.bpeMerges(spark, dir).collect().sortBy(_.getInt(0))
      assert(merges.length == 8, s"$dir: expected 8 merge rounds")
      // iteration proof: some merge's operand is itself a merged (multi-
      // char) token from an earlier round
      assert(merges.exists(r => r.getString(1).length > 1 || r.getString(2).length > 1),
        s"$dir: no merge consumed an earlier round's output — loop not iterating")
      // each round's merged token is the concatenation of its operands
      merges.foreach { r =>
        assert(r.getString(3) == r.getString(1) + r.getString(2))
        assert(r.getLong(4) > 0)
      }
      val sumPairs = merges.map(_.getLong(4)).sum
      val vocabTotal = TextPipeline.bpeVocab(spark, dir)
        .agg(sum(col("n_occ"))).collect()(0).getLong(0)
      // initial symbol mass = total normalized non-space chars (weighted
      // by occurrence); every merge round removes exactly pair_count
      // occurrences, so the applied segmentation must land exactly here
      val vocabTopk = TextPipeline.queries("t_vocab_topk")(spark, dir)
      assert(vocabTopk.count() < 100, "fixture vocab hit t_vocab_topk's limit — " +
        "initial-char derivation below would undercount")
      val initialChars = vocabTopk
        .agg(sum(expr("cnt * length(word)"))).collect()(0).getLong(0)
      assert(vocabTotal == initialChars - sumPairs,
        s"$dir: vocab mass $vocabTotal != initial $initialChars - merged $sumPairs")
    }
  }

  test("binary sign-bit search: Hamming prefilter prunes, exact rerank recovers") {
    for (dir <- Seq(Sf001, Sf01)) {
      val brute = Similarity.knnBrute(spark, dir)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bin = Similarity.knnBinary(spark, dir)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = bin.intersect(brute).size.toDouble / brute.size
      // 1-bit signatures at 64 dims: far better than random (top-5 of
      // ~500 candidates ≈ 1% random overlap), below exact (it prunes)
      assert(recall >= 0.40, s"$dir: binary recall@5 $recall < 0.40 — prefilter too lossy")
      assert(recall < 1.0, s"$dir: binary recall@5 == 1.0 — pool not actually pruning " +
        "(did BinPool grow past the candidate count?)")
    }
  }

  test("DSIR selection enriches the target sources above base rate") {
    for (dir <- Seq(Sf001, Sf01)) {
      val sel = TextPipeline.dsirSelect(spark, dir)
      val trainFrac = sel.agg(
        avg(col("source").isin("src0", "src1", "src2", "src3").cast("double")))
        .collect()(0).getDouble(0)
      // 4 of 20 sources are the target → base rate 0.2; importance
      // weights must pull the selection toward them
      assert(trainFrac > 0.2, s"$dir: selected train fraction $trainFrac not above base 0.2")
    }
  }

  test("dup spans: every reported span is a genuine exact token match") {
    val spans = TextPipeline.dupSpans(spark, Sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty, "degenerate: no duplicated spans in the fixture")
    val ids = spans.flatMap(s => Seq(s._1, s._2)).distinct
    val words = graft.Tables.documents(spark, Sf01)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), split(
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")),
        " ").as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((a, b, as, bs, len) <- spans) {
      val sa = words(a).slice(as.toInt - 1, as.toInt - 1 + len.toInt)
      val sb = words(b).slice(bs.toInt - 1, bs.toInt - 1 + len.toInt)
      assert(sa.length == len && sa == sb,
        s"span ($a,$b,$as,$bs,$len): token slices differ or run off the doc")
    }
    // islands are maximal runs of K-gram STARTS per (pair, diagonal): the
    // df-cap can punch a sub-K hole inside one genuine long duplicate, in
    // which case the two islands' TOKEN extents legitimately overlap (each
    // still covers K-1 tokens past its last surviving shingle start) — so
    // the invariant is on shingle-start runs, not token extents. A span of
    // span_tokens = len covers starts [as, as + len - K]; MAXIMAL runs must
    // be separated by at least one dropped start, i.e.
    // y.start >= x.start + x.len - K + 2 (r10 ADVICE: the earlier
    // `- K < y` form admitted abutting runs that maximality forbids).
    val k = graft.queries.TextPipeline.SpanK
    for (Seq(x, y) <- spans.groupBy(s => (s._1, s._2, s._3 - s._4)).values
                           .map(_.sortBy(_._3).toSeq).filter(_.size > 1)
                           .flatMap(_.sliding(2))) {
      assert(x._3 + x._5 - k + 1 < y._3,
        s"spans $x and $y share/abut K-gram starts on one diagonal — islands not maximal")
    }
  }

  test("BM25 top-k: every hit contains a query term, ranks dense, scores positive") {
    val hits = TextPipeline.bm25Topk(spark, Sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(hits.nonEmpty)
    val terms = Map(
      "hash_join" -> Seq("hash", "join"),
      "stream_window" -> Seq("stream", "window", "agg"),
      "sort_merge" -> Seq("sort", "merge", "table"))
    val docWords = graft.Tables.documents(spark, Sf01)
      .filter(col("doc_id").isin(hits.map(_._2).distinct: _*))
      .select(col("doc_id"), split(
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")),
        " ").as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    for ((q, d, s, _) <- hits) {
      assert(s > 0, s"$q/$d: non-positive BM25 score $s")
      assert(terms(q).exists(docWords(d).contains),
        s"$q/$d: returned doc contains none of the query terms")
    }
    for ((q, g) <- hits.groupBy(_._1)) {
      assert(g.map(_._4).sorted.toSeq == (1 to g.length),
        s"$q: ranks not dense 1..${g.length}")
      // rank order must agree with score order (ties broken by doc_id)
      val byRank = g.sortBy(_._4).map(h => (h._3, h._2)).toSeq
      assert(byRank.zip(byRank.drop(1)).forall { case ((s1, d1), (s2, d2)) =>
        s1 > s2 || (s1 == s2 && d1 < d2) }, s"$q: rank order disagrees with scores")
    }
  }

  test("quality classifier: gradient descent moved probabilities off the 0.5 init") {
    for (dir <- Seq(Sf001, Sf01)) {
      val p = TextPipeline.qualityClassifier(spark, dir)
        .agg(avg(col("p4")).as("m"), min(col("p4")).as("lo"), max(col("p4")).as("hi"))
        .collect()(0)
      val (m, lo, hi) = (p.getDouble(0), p.getLong(1), p.getLong(2))
      // with zero-initialized weights every doc starts at sigmoid(0)=0.5;
      // three full-batch steps toward the 0.2 class prior must pull the
      // mean decisively below 0.5 while staying a proper probability
      assert(m < 4900 && m > 1500, s"$dir: mean p4 $m — training did not move off init")
      assert(lo < hi, s"$dir: constant probability $lo — features carry no signal")
      assert(lo >= 0 && hi <= 10000, s"$dir: p4 out of probability range [$lo, $hi]")
    }
  }

  test("OOD outliers: the adaptive cut flags a real but small tail") {
    for (dir <- Seq(Sf001, Sf01)) {
      val r = Similarity.queries("s_ood_outliers")(spark, dir)
        .agg(sum(col("is_outlier")).cast("double") / count(lit(1))).collect()(0).getDouble(0)
      assert(r > 0, s"$dir: zero outliers — the threshold is vacuous on this data")
      assert(r < 0.05, s"$dir: $r flagged — the 'tail' is a quarter of the corpus")
    }
  }

  test("media byte stats: in-plan Adler-32 matches java.util.zip.Adler32") {
    val computed = TextPipeline.mediaByteStats(spark, Sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val texts = graft.Tables.documents(spark, Sf01)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    for ((id, text) <- texts) {
      val ref = new java.util.zip.Adler32
      ref.update(text.getBytes("UTF-8"))
      assert(computed(id) == ref.getValue,
        s"doc $id: in-plan adler32 ${computed(id)} != JDK ${ref.getValue}")
    }
  }

  test("pHash: a perturbed payload pairs with its original; disjoint payloads don't") {
    import spark.implicits._
    // three constructed payloads ≥ 256 bytes: an original, its re-encode
    // twin (the operator's own noise model: every 97th byte bumped), and
    // a byte-disjoint payload — the direct statement of the perceptual
    // property the banded entry relies on
    val orig: Array[Long] = Array.tabulate(512)(i => ((i * 31 + 17) % 251).toLong)
    val twin = orig.zipWithIndex.map { case (b, i0) =>
      if ((i0 + 1) % 97 == 13) (b + 7) % 256 else b }
    val disjoint: Array[Long] = Array.tabulate(512)(i => ((i * i * 13 + 7 * i + 101) % 256).toLong)
    val media = Seq((1L, orig.toSeq), (2L, twin.toSeq), (3L, disjoint.toSeq))
      .toDF("media_id", "bs")
    val sigs = TextPipeline.phashSig(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val hTwin = ham(sigs(1L), sigs(2L))
    val hDisj = ham(sigs(1L), sigs(3L))
    info(s"twin hamming=$hTwin disjoint hamming=$hDisj")
    assert(hTwin <= 6, s"re-encode twin drifted to hamming $hTwin — hash not perceptual")
    assert(hDisj > 6, s"disjoint payload at hamming $hDisj — hash not discriminating")

    // and through the ENTRY: every derived twin that survives the ≥64-byte
    // cut must pair with its original (banding may drop a rare twin whose
    // few flipped bits straddle all four bands — allow ≤ 5% slack), and no
    // reported pair may exceed the Hamming ceiling
    for (dir <- Seq(Sf001, Sf01)) {
      val pairs = TextPipeline.phashNearDup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.nonEmpty, s"$dir: no near-dup pairs — twin derivation broken")
      assert(pairs.forall(_._3 <= 6), s"$dir: pair above the Hamming ceiling")
      val twinIds = graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 5 === 4)
        .filter(octet_length(col("text").cast("binary")) >= 64)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val found = pairs.collect { case (a, b, _) if a == -b => b }.toSet
      val recall = found.intersect(twinIds).size.toDouble / twinIds.size
      info(s"$dir: banded twin recall = $recall (${found.size}/${twinIds.size})")
      assert(recall >= 0.95, s"$dir: banded recall $recall below 0.95")
    }
  }

  test("channel near-dup: every structured twin pairs with its original") {
    // the per-channel analog of the pHash twin pin: the re-encode twin
    // derivation never touches the header bytes (positions 1-2; the bump
    // hits positions ≡13 mod 97), so a twin parses to the same layout as
    // its original and must pair with it — 4 bands of 8 bits per channel
    // guarantee any ≤3-bit-per-channel twin shares an intact band
    // (measured twin noise: ≤2 bits total), so recall is structural, not
    // probabilistic; only the hot-bucket cap may drop one.
    for (dir <- Seq(Sf001, Sf01)) {
      val pairs = TextPipeline.channelNearDup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.nonEmpty, s"$dir: no channel near-dup pairs — twin derivation broken")
      assert(pairs.forall(_._3 <= 6), s"$dir: pair above the Hamming ceiling")
      // twins surviving the structure cut: same gate as the operator,
      // evaluated through the kernel itself on the ORIGINAL bytes (the
      // twin's layout is identical by construction)
      val twinIds = graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 5 === 4)
        .filter(expr("size(channel_sigs(payload_bytes(cast(text as binary)))) > 0"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val found = pairs.collect { case (a, b, _) if a == -b => b }.toSet
      val recall = found.intersect(twinIds).size.toDouble / twinIds.size
      info(s"$dir: per-channel twin recall = $recall (${found.size}/${twinIds.size})")
      assert(recall >= 0.95, s"$dir: per-channel recall $recall below 0.95")
    }
  }

  test("LM perplexity terciles are balanced within each language") {
    val counts = TextPipeline.lmPerplexity(spark, Sf01)
      .groupBy(col("lang"), col("ppl_bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val langs = counts.keySet.map(_._1)
    for (l <- langs) {
      val sizes = (1 to 3).map(b => counts.getOrElse((l, b), 0L))
      assert(sizes.max - sizes.min <= 1, s"$l: tercile sizes $sizes not ntile-balanced")
      assert(sizes.min > 0, s"$l: empty tercile")
    }
  }
}
