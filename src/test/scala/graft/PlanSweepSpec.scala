package graft

import graft.nexmark.SparkSpec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.SortAggregateExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Table-driven plan-pin sweep over EVERY batch entry in
  * [[SparkEntry.queries]] (VERDICT r8 Next #2). ScalePlanSpec pins ~20
  * hand-picked plan shapes; this sweep is the backstop that makes the
  * t_chunk_dedup class of regression un-landable: an entry that silently
  * plans a SortAggregate (the non-mutable-agg-buffer trap), a real
  * CartesianProduct, or an unpruned wide scan fails `sbt test` the moment
  * it lands — no hand-picking required for new entries.
  *
  * Checks per entry, on the STATIC physical plan (AQE disabled for the
  * sweep so the pre-execution operator choice is inspected — exactly where
  * the t_chunk_dedup SortAggregate appeared):
  *
  *   1. zero [[SortAggregateExec]] nodes (allowlist below for entries that
  *      legitimately sort-aggregate, currently empty);
  *   2. zero [[CartesianProductExec]] nodes — the broadcast-bounded
  *      crossJoins in Similarity plan as BroadcastNestedLoopJoin, never a
  *      shuffled cartesian;
  *   3. every parquet [[FileSourceScanExec]] reads at most
  *      [[maxScanWidth]] columns — column pruning must reach the scan
  *      (entries over the wide `documents`/`events` tables get explicit
  *      per-entry bounds; everything else defaults to [[DefaultWidth]]).
  *
  * The `stream_*` entries are excluded by name: their `queries` functions
  * EXECUTE the streaming topology and return a parquet read of the
  * results, so the returned frame's plan says nothing about the stateful
  * topology — those plans are pinned where they are built
  * (StreamingMultiBatchSpec, RocksDBStateSpec, NexmarkStreamingSpec).
  * Subquery plans are included via collectWithSubqueries.
  */
class PlanSweepSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  /** Entries allowed to plan a SortAggregate, with the reason. Keep this
    * minimal — adding a name here is a reviewed decision, not a
    * convenience. The current four are the documented argmin/argmax
    * aggregates whose ordering key is a (double, id) pair: a struct in
    * the agg buffer is immutable, so HashAggregate is impossible, and the
    * alternatives are strictly worse at scale — a row_number window or a
    * max-then-join-back second pass shuffles the full N×K similarity
    * table, while the SortAggregate keeps map-side partials and ships
    * only one pre-reduced row per group (rationale in the
    * `ivfCandidates` scaladoc, Similarity.scala). */
  private val sortAggAllowed: Map[String, String] = Map(
    "s_knn_ivf" -> "IVF cell-assignment argmax over (cos, -cid) — ivfCandidates scaladoc",
    "s_knn_ivfpq" -> "ivfCandidates assignment + PQ code argmin over (d2, code)",
    "s_knn_pq" -> "PQ code-assignment argmin over (d2, code)",
    "s_kmeans" -> "Lloyd's assignment argmin over (d2, cid)",
    "s_knn_graph" -> "IVF cell-assignment argmax (same ivfCandidates rationale) over the full corpus",
    "s_knn_graph_scaled" -> "same build argmax as s_knn_graph, sqrt(N)-stride centroids",
    "s_ood_outliers" -> "contains the s_kmeans assignment subplan (Lloyd's argmin)",
    "s_incremental_index" -> "base/delta cell-assignment argmax over (cos, -cid) — ivfCandidates rationale",
    "s_index_delete" -> "cell-assignment argmax over (cos, -cid) — ivfCandidates rationale",
    "s_knn_pagerank" -> "contains the knnGraph subplan (cell-assignment argmax)",
    "s_hard_negatives" -> "contains the ivfCandidates assignment argmax (same rationale)",
    "s_triplet_mine" -> "ivfCandidates assignment + per-anchor pos/neg argmax over (cos6, -vec_id)",
    "s_knn_filtered" -> "contains the ivfCandidates assignment argmax (same rationale)",
    "s_knn_range_filtered" -> "global ivfCandidates assignment argmax + per-bucket cell-assignment argmax over (cos, -cid) — same ivfCandidates rationale",
    "s_serve_ndcg" -> "contains the knnIvf subplan (cell-assignment argmax) as the audited serve",
    "s_index_merge" -> "per-segment + merged cell-assignment argmax over (cos, -cid) — ivfCandidates rationale",
    "s_cell_split" -> "cell-assignment argmax over (cos, -cid) — ivfCandidates rationale (seed argmins are BIGINT-packed HashAggregates)",
    "s_opq_permute" -> "PQ code-assignment argmin over (d2, code) in BOTH layouts — same pqEncode node class as s_knn_pq")

  private val DefaultWidth = 8

  /** Per-entry scan-width overrides: entries whose semantics genuinely
    * need more columns from one table than [[DefaultWidth]]. */
  private val maxScanWidth: Map[String, Int] = Map.empty

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def batchEntries: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.filterNot(_._1.startsWith("stream_")).toSeq.sortBy(_._1)

  test("every batch entry: no SortAggregate, no CartesianProduct, pruned scans") {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      for ((name, fn) <- batchEntries) {
        val plan: SparkPlan = fn(spark, SfDir).queryExecution.executedPlan
        val sortAggs = plan.collectWithSubqueries { case s: SortAggregateExec => s }
        if (sortAggs.nonEmpty && !sortAggAllowed.contains(name))
          violations += s"$name: ${sortAggs.size} SortAggregate node(s) — " +
            "hash aggregation lost (non-mutable agg buffer type?)"
        val carts = plan.collectWithSubqueries { case c: CartesianProductExec => c }
        if (carts.nonEmpty)
          violations += s"$name: CartesianProduct — unbroadcast cross join"
        val bound = maxScanWidth.getOrElse(name, DefaultWidth)
        val wide = plan.collectWithSubqueries {
          case f: FileSourceScanExec if f.requiredSchema.size > bound =>
            s"${f.requiredSchema.size} cols (${f.requiredSchema.fieldNames.mkString(",")})"
        }
        wide.foreach(w => violations += s"$name: unpruned scan reads $w > $bound")
      }
    }
    assert(violations.isEmpty,
      s"\nplan sweep violations (${violations.size}):\n  " + violations.mkString("\n  "))
  }
}
