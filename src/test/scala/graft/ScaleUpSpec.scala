package graft

import graft.nexmark.SparkSpec
import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

/** Regression guard for the ScaleUp→selfcheck workflow (r11 VERDICT Next
  * #7; the r10 ADVICE medium class was a fixture dir missing
  * events.parquet, which broke `tools/selfcheck.py`'s eager per-table
  * view creation): run the real ScaleUp build on sf0.001 into a temp dir
  * and assert
  *
  *   - every table in [[ScaleUp.FixtureTables]] (= selfcheck.py's TABLES
  *     list, which fixture_manifest.json also enumerates) materializes
  *     with at least one parquet part file — the property view creation
  *     needs;
  *   - each table is readable back with the expected cardinality (facts
  *     ×k, dims ×1) and its schema column set survives the replication;
  *   - the pinned-fixture invariants hold: replicas add NO new query
  *     vectors (vec_id % 50 = 0) and NO new pivot centroids
  *     (vec_id % 25 = 0), and vec_ids stay unique — the r10 VERDICT
  *     Next #2 construction every ANN decade row depends on;
  *   - `Tables.events` normalizes the scaled events table (the dtype the
  *     oracle views rely on).
  */
class ScaleUpSpec extends SparkSpec {

  test("ScaleUp materializes every selfcheck table with pinned ANN fixtures") {
    val src = "/root/testdata/sf0.001"
    val k = 2
    val dst = java.nio.file.Files.createTempDirectory("graft_scaleup_spec")
      .resolve("sf0.002").toString
    ScaleUp.scale(spark, src, dst, k)

    val dims = Set("region", "nation", "part", "supplier")
    for (t <- ScaleUp.FixtureTables) {
      val d = new java.io.File(s"$dst/$t.parquet")
      assert(d.exists, s"$t.parquet missing from scaled fixture")
      val parts = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      assert(d.isFile || parts.nonEmpty, s"$t.parquet has no part files")
      val scaled = spark.read.parquet(s"$dst/$t.parquet")
      val base = spark.read.parquet(s"$src/$t.parquet")
      val factor = if (dims.contains(t)) 1L else k.toLong
      assert(scaled.count() == base.count() * factor,
        s"$t: expected ${base.count() * factor} rows")
      assert(scaled.columns.sorted.sameElements(base.columns.sorted),
        s"$t: column set changed: ${scaled.columns.mkString(",")}")
    }

    // pinned ANN fixture invariants (serving workload must not scale)
    val embS = spark.read.parquet(s"$dst/embeddings.parquet")
    val embB = spark.read.parquet(s"$src/embeddings.parquet")
    def countMod(df: org.apache.spark.sql.DataFrame, m: Int): Long =
      df.filter(col("vec_id") % m === 0).count()
    assert(countMod(embS, 50) == countMod(embB, 50), "query batch scaled with SF")
    assert(countMod(embS, 25) == countMod(embB, 25), "pivot centroids scaled with SF")
    assert(embS.select("vec_id").distinct().count() == embS.count(),
      "replica vec_id remap collided")

    // the dtype-normalized read the oracle workflow depends on
    val ev = graft.Tables.events(spark, dst)
    assert(ev.count() == spark.read.parquet(s"$src/events.parquet").count() * k)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
  }

  test("aniso mode: power-law per-dim energy profile, ids/labels/counts untouched") {
    val src = "/root/testdata/sf0.001"
    val dst = java.nio.file.Files.createTempDirectory("graft_scaleup_aniso")
      .resolve("sf0.001").toString
    ScaleUp.scale(spark, src, dst, 1, aniso = true)
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val prof = spark.read.parquet(s"$dst/embeddings.parquet")
    // same rows, ids and labels — only the per-dim scale changes
    assert(prof.count() == base.count(), "aniso changed the row count")
    assert(prof.select("vec_id", "label").exceptAll(base.select("vec_id", "label")).isEmpty,
      "aniso changed ids/labels")
    // the profile IS the documented gain: x' = x / sqrt(d + 1) exactly
    val mism = prof.alias("p").join(base.alias("b"), "vec_id")
      .select(expr(
        """size(filter(transform(p.embedding, (x, i) ->
          |  x = cast(element_at(b.embedding, i + 1) / sqrt(cast(i + 1 as double)) as float)),
          |  ok -> not ok))""".stripMargin).as("bad"))
      .agg(sum(col("bad"))).head.getLong(0)
    assert(mism == 0L, s"$mism per-dim values diverge from the documented gain")
    // per-dim energy is strictly decreasing in expectation: pin head >> tail
    val e = prof.select(posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(col("x") * col("x")).as("en"))
      .orderBy(col("d")).collect().map(_.getDouble(1))
    assert(e(0) > e(63) * 16,
      f"profile too flat: dim0 ${e(0)}%.3f vs dim63 ${e(63)}%.3f")
  }

  test("scaled embeddings preserve navigable geometry: no replica cliques, beam recall measurable") {
    // the r12 finding this construction replaces: noise-replica fixtures
    // decompose into ~N/k clique islands (every replica's top-k is its
    // own clique, cos ~ 1), so graph-ANN recall was structurally
    // unmeasurable above the driver fixtures. Build at the FULL k = 10
    // (the decade factor — clique degeneracy only binds when clique size
    // exceeds the graph degree) and pin the two sides of "geometry
    // preserved":
    val src = "/root/testdata/sf0.001"
    val dst = java.nio.file.Files.createTempDirectory("graft_scaleup_geo")
      .resolve("sf0.01").toString
    ScaleUp.scale(spark, src, dst, 10)

    // (1) NO near-clone pairs anywhere: interpolants at lambda in
    // [0.25, 0.75) sit on same-label chords, never on top of a parent —
    // the old fixture had thousands of cos >= 0.9999 replica pairs
    val e = spark.read.parquet(s"$dst/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) AS emb")
      .selectExpr("vec_id", "emb",
        "sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x)) AS nrm")
      .filter(col("nrm") > 0)
    val clones = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(call_function("cosine_sim", col("a.emb"), col("b.emb")) >= 0.9999)
      .count()
    assert(clones == 0L, s"$clones near-clone pairs (cos >= 0.9999) in the scaled corpus")

    // (2) recall is MEASURABLE: the beam walk over the scaled fixture's
    // own nav index finds most of the true top-5 (clique islands pinned
    // this at 0.000 — seeds sit in other islands, no walk reaches truth)
    val truth = graft.queries.Similarity.knnBrute(spark, dst)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val beam = graft.queries.Similarity.knnBeam(spark, dst)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      (beam.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
    val macroRecall = recalls.sum / recalls.size
    assert(macroRecall >= 0.7,
      f"beam recall@5 $macroRecall%.3f on the scaled fixture — geometry not navigable")
  }
}
