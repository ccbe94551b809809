package graft

import graft.nexmark.SparkSpec
import graft.queries.TextPipeline
import org.apache.spark.sql.functions._

/** Semantics pins for the round-11 profile operators:
  *
  *   - `t_suffix_dedup` — differential test against an O(n²) brute-force
  *     twin on a PLANTED corpus (golden by construction, no hand-computed
  *     numbers): the sort-neighbor formulation must equal "max tiered
  *     common prefix against EVERY other suffix", which is the
  *     prefix-order monotonicity property the one-shuffle design rests
  *     on. Plus ladder/threshold invariants on real testdata.
  *
  *   - `t_quantile_sketch` — octave-histogram estimates on a planted
  *     1..100 corpus where every bin boundary is known (est_p50 lands
  *     EXACTLY on 50 because rank interpolation inside [32,64) is exact
  *     for a dense run), and the structural error bound est/exact < 2
  *     (same-octave containment) on real testdata.
  */
class SuffixAndQuantileSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sufq").toFile
    dir.deleteOnExit()
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
    dir.getPath
  }

  /** Scala twin of the normalized-text token-start suffix extraction. */
  private def suffixes(docs: Seq[(Long, String)]): Seq[(Long, Int, String)] =
    docs.flatMap { case (id, text) =>
      val nc = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim
      val starts = (1 to math.max(nc.length, 1))
        .filter(p => p == 1 || nc.charAt(p - 2) == ' ')
      starts.map(p => (id, p, nc.substring(p - 1).take(TextPipeline.SufCap)))
    }.filter(_._3.length >= TextPipeline.SufMinRep)

  private def tier(a: String, b: String): Int =
    TextPipeline.SufTiers.filter(t => a.length >= t && a.take(t) == b.take(t))
      .foldLeft(0)(math.max)

  test("suffix dedup equals the all-pairs brute force on a planted corpus") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      1L -> s"intro words here $shared trailing tail",
      2L -> s"$shared completely different ending material",
      3L -> "nothing in common with anything else zebra quartz vortex nymph",
      4L -> "short",
      5L -> "xylophone jukebox wizard glyphs vexing daft quartz flummox",
    )
    val dir = writeDocs(docs.map { case (id, t) => (id, t, "en", "s") })
    val got = TextPipeline.suffixDedup(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4), r.getLong(5))))
      .toMap

    val sufs = suffixes(docs)
    val expected = sufs.groupBy(_._1).map { case (id, ss) =>
      val reps = ss.map { case (i, p, win) =>
        sufs.collect { case (i2, p2, w2) if (i2, p2) != (i, p) => tier(win, w2) }
          .foldLeft(0)(math.max)
      }
      val dups = reps.count(_ >= TextPipeline.SufMinRep)
      id -> (ss.size.toLong, dups.toLong, reps.foldLeft(0)(math.max),
        reps.map(_.toLong).sum, dups.toLong * 10000 / ss.size)
    }
    assert(got == expected, s"got=$got\nexpected=$expected")
    // the planted share must actually exercise the dup path on both docs
    assert(got(1L)._2 > 0 && got(2L)._2 > 0)
    assert(got(3L)._2 == 0 && got(5L)._2 == 0)
    assert(!got.contains(4L), "sub-threshold doc must have no eval positions")
  }

  test("suffix dedup invariants on real testdata (sf0.001)") {
    val rows = TextPipeline.suffixDedup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nEval, nDup, maxRep, sumRep, dupBp) =
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4), r.getLong(5))
      assert(nDup <= nEval && nEval > 0)
      assert(maxRep == 0 || TextPipeline.SufTiers.contains(maxRep))
      assert(sumRep >= maxRep.toLong && (nDup > 0 || sumRep == 0))
      assert(dupBp == nDup * 10000 / nEval)
    }
    // synthetic docs share template phrasing: the corpus-level dup signal
    // must be non-trivial, or the entry is testing nothing
    assert(rows.map(_.getLong(2)).sum > 0, "no duplicated position anywhere")
  }

  test("quantile sketch is exact-by-construction on a planted dense run") {
    val docs = (1 to 100).map(i =>
      (i.toLong, "x" * i, "en", "s")) // n_chars = 1..100, one source
    val dir = writeDocs(docs)
    val r = TextPipeline.quantileSketch(spark, dir).collect()
    assert(r.length == 1)
    val m = r.head
    assert(m.getLong(1) == 100L) // n_docs
    // dense 1..100: p50 rank 50 interpolates EXACTLY inside [32,64)
    assert(m.getLong(2) == 50L && m.getLong(3) == 50L && m.getLong(4) == 0L,
      s"p50 est/exact/err = ${m.getLong(2)}/${m.getLong(3)}/${m.getLong(4)}")
    // p90/p99 land in the ragged top octave [64,128): bounded, not exact
    for (i <- Seq(5, 8)) {
      val (est, exact, err) = (m.getLong(i), m.getLong(i + 1), m.getLong(i + 2))
      assert(est >= 64L && est < 128L && exact >= 64L)
      assert(err < 10000L, s"octave bound violated: est=$est exact=$exact")
    }
  }

  test("quantile sketch octave bound holds per source on real testdata") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = TextPipeline.quantileSketch(spark, dir).collect()
      assert(rows.nonEmpty)
      for (r <- rows; i <- Seq(2, 5, 8)) {
        val (est, exact, err) = (r.getLong(i), r.getLong(i + 1), r.getLong(i + 2))
        // same-octave containment: the estimate can never leave the bin
        // holding the true rank value, so it is within 2x of the truth
        assert(err < 10000L,
          s"${r.getString(0)} col$i est=$est exact=$exact err_bp=$err")
        assert(est > 0 && exact > 0)
      }
    }
  }
}
