package graft

import graft.nexmark.SparkSpec
import graft.queries.TextPipeline

/** Differential pin for `t_cm_sketch`: the Spark grid must equal a
  * straight-line Scala Count-Min twin (same normalization, same md5-word
  * buckets, same top-20 probe cut) on real sf0.001 data — plus the two
  * properties that define a CM sketch: it NEVER under-counts, and the
  * over-count is bounded by the colliding mass (total occurrences minus
  * the word's own count, the degenerate worst case).
  */
class CmSketchSpec extends SparkSpec {

  private val Depth = 4
  private val Width = 256

  private def md5words(s: String): Seq[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until Depth).map(j => java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16))
  }

  test("CM sketch equals the Scala twin on sf0.001; never under-counts") {
    val dir = "/root/testdata/sf0.001"
    val out = TextPipeline.cmSketch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // Scala twin: same normalization as docsNorm, same counts, same grid
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val words = texts.flatMap(t =>
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
        .split(" ").filter(_.nonEmpty))
    val wc = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val cells = scala.collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    for ((w, c) <- wc; j <- 0 until Depth)
      cells((j, md5words(w)(j) % Width)) += c
    val probe = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
    val expected = probe.map { case (w, c) =>
      val est = (0 until Depth).map(j => cells((j, md5words(w)(j) % Width))).min
      (w, c, est, (est - c) * 10000 / c)
    }.toSet
    assert(out.toSet == expected,
      s"diff=${(out.toSet -- expected).take(3)} / ${(expected -- out.toSet).take(3)}")

    for ((w, exact, est, overBp) <- out) {
      assert(est >= exact, s"$w under-counted: est=$est exact=$exact")
      // the CM bound, tested against the ACTUAL colliding mass: Spark's
      // estimate can exceed the word's own count by at most the smallest
      // per-depth colliding mass at the word's cells (computed from the
      // Scala twin's grid — a cross-implementation check, since `est`
      // comes from the Spark output and `cells` from the twin)
      val collidingBound = (0 until Depth)
        .map(j => cells((j, md5words(w)(j) % Width)) - exact).min
      assert(est - exact <= collidingBound,
        s"$w over-count ${est - exact} exceeds colliding mass $collidingBound")
      assert(overBp == (est - exact) * 10000 / exact)
    }
    assert(out.length == 20)
  }
}
