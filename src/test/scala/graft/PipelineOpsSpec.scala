package graft

import graft.nexmark.SparkSpec
import graft.queries.{Similarity, TextPipeline}
import org.apache.spark.sql.functions._

/** Semantic properties of the round-5 training-data operators that the
  * DuckDB oracle gate cannot express (the oracle proves cross-engine
  * equality; these prove the answers mean what they claim).
  */
class PipelineOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("simhash32 kernel is bit-identical to the declarative formulation") {
    val native = TextPipeline.simhash(spark, dir).select("doc_id", "simhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val decl = TextPipeline.simhashSigsDeclarative(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native.nonEmpty && native == decl)
  }

  test("simhash banding is EXACT for hamming <= bands-1 (pigeonhole)") {
    // brute-force all pairs within hamming 3 from the signature surface
    val sigs = TextPipeline.simhash(spark, dir).select("doc_id", "simhash")
    val x = sigs.as("x"); val y = sigs.as("y")
    val brute = x.join(y, col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        call_function("bit_count",
          col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = TextPipeline.simhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, "banded candidate generation must lose no pair within the hamming ball")
    assert(brute.nonEmpty)
  }

  test("decontaminate: eval docs excluded, flags match a real shingle overlap") {
    val out = TextPipeline.decontaminate(spark, dir)
    assert(out.filter(col("doc_id") % 20 === 0).count() == 0)
    assert(out.filter(col("n_overlap") > col("n_shingles")).count() == 0)
    // recompute one flagged doc's overlap directly from word 5-shingles
    val flagged = out.filter(col("is_contaminated") === 1).select("doc_id", "n_overlap")
      .collect()
    assert(flagged.nonEmpty, "fixture must contain at least one contaminated doc")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ").as("w"))
      .select(col("doc_id"), call_function("word_shingles", col("w"), lit(5)).as("sh"))
    val evalSh = docs.filter(col("doc_id") % 20 === 0)
      .select(explode(col("sh")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val (docId, nOverlap) = (flagged.head.getLong(0), flagged.head.getLong(1))
    val docSh = docs.filter(col("doc_id") === docId)
      .select(explode(col("sh")).as("s")).collect().map(_.getString(0)).toSet
    assert(docSh.count(evalSh.contains).toLong == nOverlap)
  }

  test("repetitionFilter: basis points bounded, keep consistent with thresholds") {
    val rows = TextPipeline.repetitionFilter(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (top1, dup, bi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      Seq(top1, dup, bi).foreach(bp => assert(bp >= 0 && bp <= 10000, s"bp out of range: $r"))
      val expectKeep = top1 <= 1300 && bi <= 600 && dup <= 6500
      assert(r.getInt(5) == (if (expectKeep) 1 else 0), s"keep flag inconsistent: $r")
    }
    assert(rows.map(_.getInt(5)).distinct.length == 2, "thresholds should split the fixture")
  }

  test("packSequences: per-shard exclusive prefix sums, every doc packed once") {
    val out = TextPipeline.packSequences(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(out.length.toLong == nDocs)
    assert(out.map(_.getLong(0)).distinct.length.toLong == nDocs)
    out.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(0) % 8 == shard)
        assert(r.getLong(3) == cum / 256 && r.getLong(4) == cum % 256,
          s"bin/offset must be the exclusive prefix sum: $r (expected cum=$cum)")
        cum += r.getLong(2)
      }
    }
  }

  test("sourceQuota: cap binds per source, rank dense, WindowGroupLimit in plan") {
    val df = TextPipeline.sourceQuota(spark, dir)
    val rows = df.collect()
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      assert(rs.length <= 15, s"source $src over quota")
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length), s"rank not dense for $src")
      // rank order = score desc, doc_id asc
      val ordered = rs.sortBy(_.getInt(3))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) > b.getLong(2) ||
            (a.getLong(2) == b.getLong(2) && a.getLong(0) < b.getLong(0)))
        case _ => ()
      }
    }
    // the rank filter must push below the sort (per-partition K-row heaps)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("corpusShuffle: a dense deterministic permutation, shard-parallel") {
    val out = TextPipeline.corpusShuffle(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(out.length.toLong == nDocs)
    assert(out.map(_.getLong(0)).distinct.length.toLong == nDocs, "every doc exactly once")
    out.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 16)
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length), s"pos not dense in shard $shard")
    }
    // stable across runs (content-hash keyed, not rand())
    val again = TextPipeline.corpusShuffle(spark, dir).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
  }

  test("chunkDedup: chunk counts match word counts, dedup finds real dups") {
    val out = TextPipeline.chunkDedup(spark, dir).collect()
    val wordCounts = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val (docId, nChunks, nDup, bp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nChunks == (wordCounts(docId) + 9) / 10, s"chunk count wrong for $docId")
      assert(nDup <= nChunks && bp == nDup * 10000 / nChunks)
    }
    assert(out.map(_.getLong(2)).sum > 0, "fixture must contain duplicated chunks")
    assert(out.exists(_.getLong(2) == 0), "not every doc should be flagged")
  }

  test("oovRate: counts bounded, nonzero corpus OOV, direct recompute agrees") {
    val out = TextPipeline.oovRate(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 10000 / r.getLong(1))
    }
    assert(out.map(_.getLong(2)).sum > 0,
      "the vocab cut must leave real OOV tokens, or the audit is vacuous")
    // recompute one doc directly against the collected top-20 vocabulary
    val vocab = TextPipeline.vocabTopk(spark, dir).limit(20)
      .collect().map(_.getString(0)).toSet
    val sample = Tables.documents(spark, dir).filter(col("doc_id") === out.head.getLong(0))
      .select(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .collect().head.getString(0).split(" ").filter(_.nonEmpty)
    assert(sample.count(w => !vocab.contains(w)).toLong == out.head.getLong(2))
  }

  test("knnPq: pivots reconstruct to themselves exactly; top-k is complete") {
    // pivot rows' sub-vectors ARE codewords with self-distance exactly 0,
    // so their reconstruction must be bit-identical to the original vector
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val recon = Similarity.pqReconstruct(spark, dir)
    val pivots = recon.filter(col("vec_id") % 25 === 0).join(e, "vec_id")
    assert(pivots.count() > 0)
    assert(pivots.filter(col("remb") =!= col("emb")).count() == 0,
      "pivot reconstruction must be exact")
    // non-pivots generally do NOT reconstruct exactly (the compression is real)
    assert(recon.filter(col("vec_id") % 25 =!= 0).join(e, "vec_id")
      .filter(col("remb") =!= col("emb")).count() > 0)
    val out = Similarity.knnPq(spark, dir)
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    // tolerance, not 0: d2 = (qsq - 2*q.r) + rsq can cancel to a tiny
    // negative double when a reconstruction nearly equals the query; both
    // engines compute it bit-identically, so the cross-engine gate is
    // unaffected — only this sanity floor needs the epsilon
    assert(out.filter(col("pqd6") < -1e-6).count() == 0)
  }

  test("knnIvfPq: LUT-summed ADC distance equals the flat reconstruction L2^2") {
    // the per-query LUT path sums PqM per-subspace partials; the flat path
    // computes one 64-dim composition against the reconstruction — equal
    // mathematically, different floating-point order, so compare within an
    // epsilon far below any ranking gap
    val out = Similarity.knnIvfPq(spark, dir)
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    assert(out.filter(col("pqd6") < -1e-6).count() == 0)
    val recon = Similarity.pqReconstruct(spark, dir)
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("qemb"))
    val checked = out.join(recon, "vec_id").join(q, "query_id")
      .withColumn("flat", expr(
        "aggregate(zip_with(qemb, remb, (a, b) -> (a - b) * (a - b)), 0D, (s, x) -> s + x)"))
      .filter(abs(col("pqd6") - round(col("flat"), 6)) > 1e-6)
    assert(checked.count() == 0, "LUT distance must match the reconstruction distance")
  }

  test("kmeans assigns every vector to a live centroid and improves on init") {
    val out = Similarity.kmeans(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val n = e.count()
    assert(out.count() == n, "every vector gets exactly one assignment")
    // clusters are identified by their seed pivot id
    assert(out.filter(col("cluster_id") % 25 =!= 0).count() == 0)
    assert(out.agg(countDistinct(col("cluster_id"))).head().getLong(0) > 1)
    // Lloyd's step: total within-cluster distance after the mean update
    // must not exceed assigning everything to the INIT centroids (the
    // 2^-20 quantization perturbs means by ~1e-6 per coord — use a slack
    // far above that, far below real movement)
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum(col("d6"))).head().getDouble(0)
    val afterUpdate = total(out)
    val qs = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    val initAssign = e.crossJoin(broadcast(qs))
      .withColumn("d2", expr(
        "aggregate(zip_with(emb, cemb, (a, b) -> (a - b) * (a - b)), 0D, (s, x) -> s + x)"))
      .groupBy(col("vec_id")).agg(min(col("d2")).as("d"))
    val initTotal = initAssign.agg(sum(round(col("d"), 6))).head().getDouble(0)
    assert(afterUpdate <= initTotal + 1e-3,
      s"mean update must not worsen the objective: $afterUpdate vs $initTotal")
  }

  test("kmeansIterate runs to a converged fixed point with near-monotone inertia") {
    val (out, trace) = Similarity.kmeansIterate(spark, dir, maxRounds = 30)
    val n = Tables.embeddings(spark, dir).count()
    // converged: the final round moved zero points — and because the
    // quantized centroids are a pure function of the assignment, that IS
    // an exact fixed point (the next round would recompute identical
    // centroids, distances and argmins)
    assert(trace.last.changed == 0, s"not converged: $trace")
    assert(trace.length >= 2, "fixture should need at least one mean update")
    assert(out.count() == n)
    assert(out.groupBy(col("vec_id")).count().filter(col("count") > 1).count() == 0)
    // Lloyd's improvement, quantization-aware: true inertia never
    // increases; the 2^-20-quantized mean is the exact minimizer only up
    // to one coordinate quantum, so allow <= 1 quantum per point per round
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b.inertiaQ <= a.inertiaQ + n,
        s"inertia rose beyond quantization slack: $a -> $b")
    }
    // strict improvement happened somewhere (init assignment is not optimal)
    assert(trace.last.inertiaQ < trace.head.inertiaQ)
  }

  test("bloom prefilter returns exactly the unfiltered decontamination result") {
    // no false negatives => prefilter + exact verify == plain exact join;
    // the bloom may only prune work, never change rows
    val bloom = TextPipeline.bloomDecontaminate(spark, dir)
      .collect().map(_.toSeq).toSet
    val exact = TextPipeline.decontaminate(spark, dir)
      .select(col("doc_id"), col("n_overlap"), col("is_contaminated"))
      .collect().map(_.toSeq).toSet
    assert(bloom == exact && bloom.nonEmpty)
    assert(bloom.exists(_(2) == 1), "fixture should have contaminated docs")
  }

  test("piiRedact counts match the redaction placeholders in the output hash inputs") {
    val out = TextPipeline.piiRedact(spark, dir)
    val n = out.count()
    assert(n > 0)
    // enriched docs must be detected: every doc_id % 7 == 0 doc got an email
    assert(out.filter(col("doc_id") % 7 === 0 && col("n_emails") === 0).count() == 0)
    assert(out.filter(col("doc_id") % 11 === 0 && col("n_ipv4") === 0).count() == 0)
    assert(out.filter(col("doc_id") % 13 === 0 && col("n_phones") === 0).count() == 0)
    // unenriched word-salad docs carry no PII
    assert(out.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 =!= 0 &&
      col("doc_id") % 13 =!= 0 && (col("n_emails") + col("n_ipv4") + col("n_phones")) =!= 0)
      .count() == 0)
  }

  test("incrementalDedup: keep iff first unseen occurrence; corpus untouched") {
    val out = TextPipeline.incrementalDedup(spark, dir)
    // only delta docs appear
    assert(out.filter(col("doc_id") % 3 === 0).count() == 0)
    // keep == not-in-corpus AND first-in-delta, row by row
    assert(out.filter(col("keep") =!=
      ((col("dup_of_corpus") === 0) && (col("dup_in_delta") === 0)).cast("int"))
      .count() == 0)
    // every fingerprint kept at most once across the delta
    assert(out.filter(col("keep") === 1).groupBy(col("fp")).count()
      .filter(col("count") > 1).count() == 0)
    assert(out.count() > 0)
  }

  test("incrementalNearDup: exact-dup recall floor, verify precision, corpus untouched") {
    val out = TextPipeline.incrementalNearDup(spark, dir).localCheckpoint(true)
    // only delta docs appear; canonical pointers go to the corpus
    assert(out.filter(col("doc_id") % 3 === 0).count() == 0)
    assert(out.filter(col("dup_of") =!= -1 && col("dup_of") % 3 =!= 0).count() == 0)
    // keep and dup_of are consistent with the dup count, row by row
    assert(out.filter(col("keep") =!= (col("n_corpus_dups") === 0).cast("int"))
      .count() == 0)
    assert(out.filter((col("dup_of") === -1) =!= (col("n_corpus_dups") === 0))
      .count() == 0)
    // recall FLOOR: an exact duplicate has an identical shingle set, hence an
    // identical signature, hence every band collides — banding can never miss
    // it. Cross-check against the fingerprint-exact screen on the same split.
    val exactCorpusDups = TextPipeline.incrementalDedup(spark, dir)
      .filter(col("dup_of_corpus") === 1).select(col("doc_id"))
    val missed = exactCorpusDups.join(out.filter(col("keep") === 1), "doc_id")
    assert(missed.count() == 0,
      "a fingerprint-exact corpus duplicate escaped the LSH screen")
    assert(out.filter(col("keep") === 0).count() > 0)
    assert(out.count() > 0)
  }

  test("dimStats: one row per dimension, full counts, non-negative variance") {
    val out = Similarity.dimStats(spark, dir).collect()
    assert(out.length == 64)
    val n = Tables.embeddings(spark, dir).count()
    assert(out.forall(_.getLong(1) == n), "every dim sees every vector")
    assert(out.forall(_.getDouble(3) >= 0.0), "variance must be non-negative")
    // fixture embeddings are ~N(0,1)-ish: means near 0, variance well away
    // from degenerate 0 (a collapsed-dimension regression would trip this)
    assert(out.forall(r => math.abs(r.getDouble(2)) < 1.0))
    assert(out.forall(_.getDouble(3) > 1e-4))
  }

  test("ccIterate on an empty bucket table converges at round 0 (no NPE on null SUM)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int, Long)].toDF("doc_id", "band", "bkey")
    val (labels, rounds) = TextPipeline.ccIterate(empty)
    assert(labels.isEmpty && rounds == 0)
  }

  test("ccIterate collapses a 4-link chain the 1-hop pass cannot") {
    import spark.implicits._
    // bucket chain 1-2, 2-3, 3-4, 4-5: docs 3/4/5 are >= 2 hops from the
    // canonical 1, so the 1-hop bucket-min pass must NOT reach it while
    // the fixed point must label everything 1
    val bands = Seq(
      (1L, 0, 100L), (2L, 0, 100L),
      (2L, 0, 200L), (3L, 0, 200L),
      (3L, 0, 300L), (4L, 0, 300L),
      (4L, 0, 400L), (5L, 0, 400L),
      (9L, 0, 900L) // singleton stays its own cluster
    ).toDF("doc_id", "band", "bkey")
    val (labels, rounds) = TextPipeline.ccIterate(bands)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 9L -> 9L))
    // hop + pointer-doubling shortcut per round: the 4-link chain closes in
    // one propagating round plus the no-change confirmation
    assert(rounds == 2, s"expected 2 rounds (1 propagating + 1 confirming), got $rounds")
  }

  test("pointer doubling converges a 16-link chain in O(log) rounds, not 16") {
    import spark.implicits._
    // docs 1..17 chained via 16 two-member buckets: plain one-hop-per-round
    // label propagation needs ~16 rounds; the doubling shortcut must close
    // it in ~log2(17)
    val bands = (1L to 16L).flatMap(i =>
      Seq((i, 0, 1000L + i), (i + 1, 0, 1000L + i))).toDF("doc_id", "band", "bkey")
    val (labels, rounds) = TextPipeline.ccIterate(bands)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 17L).map(_ -> 1L).toMap)
    assert(rounds <= 7, s"doubling must close a 16-link chain in O(log) rounds, got $rounds")
  }

  test("dupClustersCC refines dupClusters: same components, canonical labels everywhere") {
    val oneHop = TextPipeline.dupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id").as("one_hop"))
    val cc = TextPipeline.dupClustersCC(spark, dir)
    // CC labels are <= the 1-hop labels (monotone min propagation), and a
    // doc's CC label is itself canonical (labels of labels are fixed)
    val j = cc.join(oneHop, "doc_id")
    assert(j.filter(col("cluster_id") > col("one_hop")).count() == 0)
    val lbl = cc.select(col("cluster_id")).distinct()
      .join(cc.select(col("doc_id"), col("cluster_id").as("own")),
        col("cluster_id") === col("doc_id"))
    assert(lbl.filter(col("own") =!= col("cluster_id")).count() == 0,
      "every emitted cluster_id must itself be labeled with itself")
  }

  test("semanticDedup = brute-force min cosine-partner within each kmeans cell") {
    val out = Similarity.semanticDedup(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    // independent reconstruction: public kmeans assignment + all-pairs
    // cosine within a cluster, min qualifying partner
    val assign = Similarity.kmeans(spark, dir).select("vec_id", "cluster_id")
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("n", sqrt(aggregate(transform(col("emb"), x => x * x),
        lit(0.0), (a, x) => a + x)))
      .filter(col("n") > 0)
    val m = assign.join(e, "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray)).toSeq
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = m.map { case (v, c, emb) =>
      val partners = m.filter { case (o, oc, oemb) =>
        oc == c && o < v && cos(oemb, emb) >= 0.15
      }.map(_._1)
      v -> ((c, if (partners.isEmpty) v else partners.min))
    }.toMap
    assert(out.size == m.size && m.nonEmpty)
    expected.foreach { case (v, (c, canon)) =>
      val (oc, ocanon, oflag) = out(v)
      assert(oc == c && ocanon == canon && oflag == (if (canon == v) 1 else 0),
        s"vec $v: got cluster=$oc canon=$ocanon, want cluster=$c canon=$canon")
    }
    assert(out.values.exists(_._3 == 0), "fixture must contain semantic dups")
  }

  test("clusterBest keeps exactly the top-quality doc of every dup cluster") {
    val out = TextPipeline.clusterBest(spark, dir)
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(col("is_best")).as("n_best"),
           max(col("score_scaled")).as("max_s"))
    assert(perCluster.filter(col("n_best") =!= 1).count() == 0,
      "each cluster elects exactly one representative")
    // the elected doc carries the cluster max score, and among max-score
    // ties the lowest doc_id wins
    val best = out.filter(col("is_best") === 1)
      .select(col("cluster_id"), col("doc_id").as("b"), col("score_scaled").as("bs"))
    val viol = out.join(best, "cluster_id")
      .filter(col("score_scaled") > col("bs") ||
        (col("score_scaled") === col("bs") && col("doc_id") < col("b")))
    assert(viol.count() == 0)
    // cluster labels agree with dupClustersCC where the doc is in the graph
    val cc = TextPipeline.dupClustersCC(spark, dir)
      .select(col("doc_id"), col("cluster_id").as("cc_id"))
    assert(out.join(cc, "doc_id").filter(col("cluster_id") =!= col("cc_id")).count() == 0)
    assert(out.filter(col("is_best") === 0).count() > 0, "fixture must contain non-kept dups")
  }

  test("winnowPairs: every pair shares >= 2 rare fingerprints, recompute agrees") {
    val out = TextPipeline.winnowPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.nonEmpty && out.keys.forall { case (a, b) => a < b })
    // reconstruct from the winnow fingerprint surface with the df cap
    val w = TextPipeline.winnowFingerprint(spark, dir)
      .select(col("doc_id"), col("min_hash")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val df = w.groupBy(_._2).view.mapValues(_.length).toMap
    val byDoc = w.filter(p => df(p._2) <= 50).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      (a, sa) <- byDoc.toSeq; (b, sb) <- byDoc.toSeq if a < b
      k = (sa & sb).size if k >= 2
    } yield (a, b) -> k.toLong).toMap
    assert(out == expected)
  }

  test("annRecall agrees with a direct overlap of the two top-k surfaces") {
    val out = Similarity.annRecall(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val b = Similarity.knnBrute(spark, dir).select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val i = Similarity.knnIvf(spark, dir).select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out.keySet == b.keySet)
    out.foreach { case (q, (nb, ni, ov, bp)) =>
      val (bs, is) = (b(q), i.getOrElse(q, Set.empty[Long]))
      assert(nb == bs.size && ni == is.size && ov == (bs & is).size)
      assert(bp == ov * 10000 / nb && bp >= 0 && bp <= 10000)
    }
  }

  test("crossSourceDup: normalized pairs, totals match the thresholded pair count") {
    val out = TextPipeline.crossSourceDup(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(out.nonEmpty && out.forall { case ((a, b), n) => a <= b && n > 0 })
    // total matrix mass == number of jaccard>=1/2 pairs from the pair surface
    val pairs = TextPipeline.minhashPairs(spark, dir)
      .filter(col("jaccard") >= 0.5).count()
    assert(out.map(_._2).sum == pairs)
  }

  test("docFreq: df >= 1 per word, direct recompute of one doc agrees") {
    val out = TextPipeline.docFreq(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out.nonEmpty && out.values.forall { case (n, s) => s >= n && n > 0 })
    // recompute one doc by hand from the normalized corpus
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"),
        split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ").as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).distinct.filter(_.nonEmpty).toSet))
    val dfMap = words.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (docId, vocab) = words.head
    assert(out(docId) == ((vocab.size.toLong, vocab.toSeq.map(dfMap).sum)))
  }

  test("curationE2e composes its stages: exact survivors, one winner per cluster, threshold") {
    val out = TextPipeline.curationE2e(spark, dir)
    // stage 2: output rows are exactly the exact-dedup canonicals
    val canon = TextPipeline.fingerprintDedup(spark, dir).filter(col("is_canonical") === 1)
    assert(out.count() == canon.count())
    assert(out.join(canon.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)
    // stages 4-5: at most one kept doc per cluster; every kept doc clears
    // the threshold AND carries its cluster's max score (ties to lowest id)
    val perCluster = out.groupBy(col("cluster_id")).agg(sum(col("is_kept")).as("k"))
    assert(perCluster.filter(col("k") > 1).count() == 0)
    assert(out.filter(col("is_kept") === 1 && col("score_scaled") < 3500).count() == 0)
    val kept = out.filter(col("is_kept") === 1)
      .select(col("cluster_id"), col("doc_id").as("b"), col("score_scaled").as("bs"))
    val viol = out.join(kept, "cluster_id")
      .filter(col("score_scaled") > col("bs") ||
        (col("score_scaled") === col("bs") && col("doc_id") < col("b")))
    assert(viol.count() == 0)
    // a cluster with NO kept doc is one whose elected winner missed the
    // threshold — its member scores must ALL be below it
    val unkept = perCluster.filter(col("k") === 0).select("cluster_id")
    assert(out.join(unkept, "cluster_id").filter(col("score_scaled") >= 3500).count() == 0)
    assert(kept.count() > 0 && out.count() > kept.count(), "verdicts must be non-trivial")
  }

  // shared hand-recompute basis for the term-statistics tests: per doc,
  // the normalized token sequence (duplicates kept, empties dropped —
  // the operator's exact token universe)
  private def handTokens(): Array[(Long, Seq[String])] =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ").as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).filter(_.nonEmpty)))

  test("tfidfTopk: exact tf/df recompute, true per-doc top-K in the tie order") {
    val out = TextPipeline.tfidfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(out.nonEmpty)
    val words = handTokens()
    val tf = words.flatMap { case (d, ws) => ws.map(w => (d, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.toSeq.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = tf.keys.groupBy(_._1).flatMap { case (d, ks) =>
      ks.toSeq.map { case (_, w) => (w, tf((d, w)), df(w), tf((d, w)) * 10000 / df(w)) }
        .sortBy { case (w, _, _, s) => (-s, w) }.take(3).zipWithIndex
        .map { case ((w, t, f, s), i) => (d, w, t, f, s, i + 1L) }
    }.toSet
    assert(out == expect)
  }

  test("collocations: exact lift recompute, true global top-K among cbg >= 3 pairs") {
    val out = TextPipeline.collocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty && out.length <= 50)
    val words = handTokens()
    val uni = words.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bg = words.flatMap { case (_, ws) =>
      ws.sliding(2).collect { case Seq(a, b) => (a, b) } }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = bg.values.sum
    val expect = bg.collect { case ((a, b), c) if c >= 3 =>
      (a, b, c, uni(a), uni(b), c * t * 10000 / (uni(a) * uni(b))) }
      .toSeq.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }.take(50)
    assert(out.toSeq.sortBy { case (a, b, _, _, _, l) => (-l, a, b) } == expect)
    // lift separates: the top pair must beat independence (> 10000 bp)
    assert(expect.head._6 > 10000)
  }

  test("mixtureWeights: exact recompute, sqrt flattens shares, allocation within budget") {
    val out = TextPipeline.mixtureWeights(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out.nonEmpty)
    // hand recompute from the token universe (empties kept: the operator
    // counts size(words) like tokenStats, where an empty doc yields [""])
    val toks = Tables.documents(spark, dir)
      .select(col("source"),
        split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ").as("w"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).size.toLong))
    val bySrc = toks.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val q = bySrc.view.mapValues { case (_, t) =>
      math.round(math.sqrt(t.toDouble) * 10000) }.toMap
    val (totQ, totT) = (q.values.sum, bySrc.values.map(_._2).sum)
    bySrc.foreach { case (s, (nd, nt)) =>
      assert(out(s) == ((nd, nt, nt * 10000 / totT, q(s) * 10000 / totQ,
        1000000L * q(s) / totQ)))
    }
    // integer floor allocation never exceeds the budget
    assert(out.values.map(_._5).sum <= 1000000L)
    // sqrt flattening: the biggest source's share shrinks, the smallest grows
    val big = bySrc.maxBy(_._2._2)._1; val small = bySrc.minBy(_._2._2)._1
    assert(out(big)._4 <= out(big)._3 && out(small)._4 >= out(small)._3)
  }

  test("mixtureSample: bucketed two-pass prefix == independent Scala recompute; budget binds") {
    val out = TextPipeline.mixtureSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // independent recompute: collect the doc universe, do the whole
    // allocation + greedy prefix in plain Scala
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      size(split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " "))
        .cast("long").as("n_tokens"),
      element_at(call_function("md5_words", col("text")), 1).as("skey"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = d.groupBy(_._2)
    val srcTok = bySrc.view.mapValues(_.map(_._3).sum).toMap
    val q = srcTok.view.mapValues(t => math.round(math.sqrt(t.toDouble) * 10000)).toMap
    val (totQ, totT) = (q.values.sum, srcTok.values.sum)
    val alloc = q.view.mapValues(qs => (totT / 2) * qs / totQ).toMap
    val expect = bySrc.toSeq.flatMap { case (s, docs) =>
      var cum = 0L
      docs.toSeq.sortBy(r => (r._4, r._1)).flatMap { r =>
        cum += r._3
        if (cum <= alloc(s)) Some((r._1, s, r._3, cum)) else None
      }
    }.toSet
    assert(out.nonEmpty && out == expect)
    // the budget binds: some docs are rejected, and what survives per
    // source never exceeds its allocation
    assert(out.size < d.length)
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sum <= alloc(s))
    }
  }

  test("qualityCut: bucketed rank == independent Scala recompute; adaptive per-source threshold") {
    val out = TextPipeline.qualityCut(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // independent recompute: score every doc in Scala, rank per source
    val sw = Set("the", "a", "of", "and", "in")
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ").as("ws"))
      .collect().map { r =>
        val ws = r.getSeq[String](2)
        val (n, st, dt) = (ws.size.toLong, ws.count(sw).toLong, ws.distinct.size.toLong)
        val score = BigDecimal((40.0 * math.min(n, 100) * n + 3000.0 * (st + dt)) / n)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (r.getLong(0), r.getString(1), score)
      }
    val expect = d.groupBy(_._2).toSeq.flatMap { case (s, docs) =>
      val ranked = docs.toSeq.sortBy(r => (-r._3, r._1)).zipWithIndex
        .map { case ((id, _, sc), i) => (id, s, sc, i + 1L) }
      ranked.take(((docs.length + 1) / 2))
    }.toSet
    assert(out.nonEmpty && out == expect)
    // adaptivity is real on the fixture: per-source minimum kept score differs
    val minKept = out.groupBy(_._2).view.mapValues(_.map(_._3).min).values.toSet
    assert(minKept.size > 1, "per-source thresholds should differ")
  }

  test("labelDrift: exact recompute of cohort means; spread separates cohorts") {
    val out = Similarity.labelDrift(spark, dir).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.size == 64)
    // independent recompute from the raw vectors
    val raw = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding").cast("array<double>").as("emb"))
      .where(expr("sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x)) > 0"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val nLabels = raw.map(_._1).distinct.size.toLong
    val q = 1048576.0
    // Spark/DuckDB ROUND is HALF_UP on the double's exact value —
    // math.round (floor(x + 0.5)) disagrees on negative halves
    def rnd(x: Double, scale: Int): BigDecimal =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    for (dim <- Seq(0, 17, 63)) {
      val means = raw.groupBy(_._1).values.map { g =>
        g.map(v => rnd(v._2(dim) * q, 0).toLong).sum.toDouble / g.length
      }
      val (lo, hi) = (means.min, means.max)
      val (nl, lo6, hi6, d6) = out(dim)
      assert(nl == nLabels)
      assert(lo6 == rnd(lo / q, 6).toDouble && hi6 == rnd(hi / q, 6).toDouble)
      assert(d6 == rnd((hi - lo) / q, 6).toDouble && d6 >= 0)
    }
    // drift is a real signal on the fixture: some dimension separates cohorts
    assert(out.values.map(_._4).max > 0)
  }

  test("pcaPower: quantized power iteration == plain-Scala recompute; Rayleigh norm monotone") {
    val (outDf, lams) = Similarity.pcaIterate(spark, dir, 6)
    val out = outDf.collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(out.length == 64)
    // independent recompute in plain Scala from the raw vectors
    val raw = Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>").as("emb"))
      .where(expr("sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x)) > 0"))
      .collect().map(_.getSeq[Double](0).toArray)
    val Q = 1048576.0
    def rnd(y: Double): Long =
      BigDecimal(y).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var v = Array.fill(64)(0.125)
    var s = Array.empty[Double]
    for (_ <- 1 to 6) {
      val qs = Array.fill(64)(0L)
      raw.foreach { x =>
        val dot = x.indices.foldLeft(0.0)((a, d) => a + x(d) * v(d))
        for (d <- 0 until 64) qs(d) += rnd(x(d) * dot * Q)
      }
      s = qs.map(_.toDouble / Q)
      val norm = math.sqrt(s.map(x => x * x).reduceLeft(_ + _))
      v = s.map(_ / norm)
    }
    val norm = math.sqrt(s.map(x => x * x).reduceLeft(_ + _))
    def r6(y: Double): Double = rnd(y * 1e6).toDouble / 1e6
    out.foreach { case (d, loading6, lam6) =>
      assert(loading6 == r6(s(d) / norm), s"dim $d loading mismatch")
      assert(lam6 == r6(norm))
    }
    // ‖A·v_k‖ is monotone non-decreasing for PSD A (Cauchy-Schwarz);
    // quantization can wobble it only below the fixture's eigengap
    assert(lams.size == 5)
    (lams :+ out.head._3).sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a * (1 - 1e-9), s"Rayleigh norm decreased: $a -> $b")
    }
    // the final vector is unit up to 6dp rounding
    val nsq = out.map(_._2).map(x => x * x).sum
    assert(math.abs(nsq - 1.0) < 1e-4)
  }

  test("truncRecall: recall matches window-rank recompute of both top-k sets") {
    val out = Similarity.truncRecall(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent recompute: plain window-rank top-k on full and truncated
    // cosine (no salted merge), overlap counted in Scala
    import org.apache.spark.sql.expressions.Window
    def topk(trunc: Boolean): Map[Long, Set[Long]] = {
      val e0 = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("full"))
        .where(expr("sqrt(aggregate(transform(full, x -> x * x), 0D, (a, x) -> a + x)) > 0"))
        .withColumn("emb", if (trunc) slice(col("full"), 1, 16) else col("full"))
        .where(expr("sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x)) > 0"))
      val q = e0.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc_nulls_last, col("vec_id").asc)
      e0.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", call_function("cosine_sim", col("qemb"), col("emb")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val (full, tr) = (topk(trunc = false), topk(trunc = true))
    assert(out.nonEmpty && out.keySet == full.keySet)
    out.foreach { case (qid, (nFull, nTrunc, ov, bp)) =>
      assert(nFull == full(qid).size.toLong)
      assert(nTrunc == tr.getOrElse(qid, Set.empty[Long]).size.toLong)
      assert(ov == (full(qid) & tr.getOrElse(qid, Set.empty[Long])).size.toLong)
      assert(bp == ov * 10000 / nFull)
    }
    // truncation must actually lose something on the fixture — otherwise
    // this evaluation is measuring nothing
    assert(out.values.exists(_._4 < 10000))
  }

  test("cdcChunks: Scala recompute matches; boundaries survive insertion where fixed windows shift") {
    def w1(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    def cdc(ws: IndexedSeq[String]): Seq[String] = {
      val starts = 1 +: (2 to ws.size - 2)
        .filter(i => w1(s"${ws(i - 1)} ${ws(i)} ${ws(i + 1)}") % 16 == 0)
      starts.zipWithIndex.map { case (s, j) =>
        val end = if (j + 1 < starts.size) starts(j + 1) - 1 else ws.size
        ws.slice(s - 1, end).mkString(" ")
      }
    }
    // 1) the distributed entry equals the plain-Scala model on the fixture
    val out = TextPipeline.cdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase
        .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim.split(" ").toIndexedSeq))
    val rows = docs.flatMap { case (id, ws) => cdc(ws).zipWithIndex.map { case (c, i) => (id, i, c) } }
    val dupPerDoc = rows.groupBy(_._3).values
      .flatMap(g => g.sortBy(r => (r._1, r._2)).drop(1)).toSeq
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(out.size == docs.length)
    docs.foreach { case (id, ws) =>
      val n = cdc(ws).size.toLong; val nd = dupPerDoc.getOrElse(id, 0L)
      assert(out(id) == ((n, nd, nd * 10000 / n)), s"doc $id")
    }
    // 2) the CDC property, on a synthetic stream big enough to measure:
    // one mid-sequence insertion perturbs only the chunk(s) at the edit,
    // while fixed-width windows shift every chunk after it
    // distinct words: a periodic vocabulary would let SHIFTED fixed
    // windows coincide textually and mask the contrast being tested
    val ws = (0 until 500).map(i => s"w$i")
    val ws2 = (ws.take(250) :+ "inserted") ++ ws.drop(250)
    def shared(a: Seq[String], b: Seq[String]): Int = {
      val bc = scala.collection.mutable.Map(b.groupBy(identity).view.mapValues(_.size).toSeq: _*)
      a.count(c => bc.get(c).exists(_ > 0) && { bc(c) -= 1; true })
    }
    val (c1, c2) = (cdc(ws), cdc(ws2))
    val cdcShared = shared(c1, c2)
    assert(cdcShared >= c1.size - 3, s"CDC lost ${c1.size - cdcShared} of ${c1.size} chunks")
    val (f1, f2) = (ws.grouped(16).map(_.mkString(" ")).toSeq, ws2.grouped(16).map(_.mkString(" ")).toSeq)
    assert(shared(f1, f2) < cdcShared, "fixed windows should lose more chunks than CDC")
  }

  test("lshRecall: inverted-index truth == brute force; caught == production banding") {
    val out = TextPipeline.lshRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getLong(5)))
    // independent recompute: sample + shingle + all-pairs Jaccard in Scala
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ").as("ws"),
        element_at(call_function("md5_words", col("text")), 1).as("h1"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2)))
    val shing = docs.filter(d => d._2.size >= 3 && java.lang.Math.floorMod(d._3, 4L) == 0L)
      .map { case (id, ws, _) => id -> ws.sliding(3).map(_.mkString(" ")).toSet }.toMap
    val ids = shing.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      inter = (shing(i) & shing(j)).size
      if 3 * inter >= shing(i).size + shing(j).size
    } yield (i, j, inter.toLong, shing(i).size, shing(j).size)).toSet
    assert(out.nonEmpty && out.map(t => (t._1, t._2, t._3, t._4, t._5)).toSet == brute)
    // `caught` must agree with the PRODUCTION banding: a sampled pair
    // collides in lshRecall's bands iff it collides in minhashPairs'
    // (band keys are per-doc, so restricting the corpus to the sample
    // cannot change any pair's collision outcome)
    val prod = TextPipeline.minhashPairs(spark, dir).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (a, b, _, _, _, caught) =>
      assert((caught == 1L) == prod((a, b)),
        s"pair ($a,$b): audit caught=$caught disagrees with production banding")
    }
  }
}
