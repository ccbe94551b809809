package graft.queries

import graft.nexmark.{GenConfig, NexmarkSources}
import graft.nexmark.queries.{NexmarkQueries, NexmarkStateful}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming THROUGHPUT surface: bounded generator volumes
  * through the real Structured Streaming topologies, measured by the same
  * driver bench that times the batch queries. These are the artifacts
  * behind "matches the reference's single-node throughput": each entry
  * drives `rows(sf)` events through source → query → file sink inside the
  * query function, so the bench's wall-second number IS events ÷ seconds.
  *
  * Design choices, all scale-first:
  *   - the source is the DSv2 `format("nexmark")` generator — one input
  *     partition per reference subtask, admission-controlled batches
  *     (deterministic batch boundaries → deterministic watermark sequence
  *     → deterministic append-mode output, which the driver's rows-only
  *     check relies on);
  *   - the sink is a PARQUET FILE SINK, not a memory sink: results stay
  *     executor-side exactly as they would on a cluster; the returned
  *     DataFrame just re-reads the sink directory;
  *   - append mode + watermark: the final, unfinalized window is withheld
  *     — honest streaming semantics (the reference's sinks also only see
  *     fired windows). Volumes are sized so multiple windows finalize at
  *     every tested sf ≥ 0.01.
  *
  * Oracle gate: DuckDB cannot RUN a watermark/trigger pipeline, but it can
  * verify one. Every event the DSv2 generator emits is a pure function of
  * (seed, subtask, eventId) — so each entry also persists its EXACT input
  * event set to parquet (batch-mode read of the same source options), and
  * the oracle SQL recomputes the streaming result over that parquet:
  * batch semantics + an explicit watermark cutoff. For the window-shaped
  * entries the cutoff is the FINAL watermark — "all windows finalized
  * under max event time − delay" — which IS expressible in SQL:
  *   - tumbling windows:  emitted iff window_end ≤ max(ts) − 2000;
  *   - session windows:   emitted iff last_ts + gap ≤ max(ts) − 2000;
  *   - two-source joins:  the global watermark is the MIN of the
  *     per-source watermarks (multipleWatermarkPolicy=min default);
  *   - event-time timers (flatMapGroupsWithState): fire iff the timeout
  *     timestamp < the final watermark. qxStateful re-arms its timer on
  *     every auction event (last end wins → MAX(end) per key) while the
  *     transformWithState port registers once on the first (→ MIN(end)) —
  *     both modeled exactly below.
  * Multi-batch exactness (round 7): each source is batched into ~3
  * micro-batches at EVERY scale factor ([[rowsPerBatchFor]]), so the
  * correctness gate itself exercises intermediate watermark advances —
  * [[runToParquet]] refuses to return unless the committed batch count
  * reaches the expected multi-batch plan. The final-watermark oracle model
  * stays exact under multi-batching for two reasons, one unconditional and
  * one volume-checked:
  *   - windows/sessions/joins/dedup: generator event time is GLOBALLY
  *     non-decreasing across batches — every subtask emits the same affine
  *     timestamp sequence ts(eventId) = base + eventId*1000/eps over the
  *     same eventId range, and batch N covers eventIds strictly after
  *     batch N-1 (NexmarkMicroBatchStream.latestOffset). So no event is
  *     ever below the watermark when it arrives, and state an intermediate
  *     watermark closes could never have received a late extension (any
  *     later event's timestamp ≥ the max timestamp that advanced that
  *     watermark). Batching-invariant at ANY volume.
  *   - event-time timers (the qx ports): an armed timer fires as soon as
  *     any intermediate watermark crosses it, and late bids may reference
  *     an auction long after its end — batching-invariance holds only
  *     while every armed end stays above every intermediate watermark
  *     (event-time span ≤ 12 s · k/(k−1); the sf0.01 gate's 12.5 s span
  *     sits inside it). BEYOND the bound (sf0.1: 125 s span, timers fire
  *     mid-stream) the qx oracles don't assume invariance at all: they
  *     REPLAY the per-batch watermark sequence — reconstructed from the
  *     dump alone — against each key's timer ([[qxTimerSql]]), so they
  *     are exact at every scale. Verified ALL GREEN at sf0.001, sf0.01
  *     and sf0.1.
  * StreamingMultiBatchSpec pins the batching-invariance per stateful shape
  * (1-batch output == 4-batch output), and validates the timer replay
  * against both real ports at a deliberately-divergent fixture with a
  * Scala twin of the SQL model; the `<`/`<=` boundary choices are pinned
  * by StreamingOracleBoundarySpec.
  */
object StreamingBench extends QueryModule {

  private val Parallelism = 8
  /** Per-subtask admission-control batch size: ceil(rows/3), so every
    * source runs THREE data micro-batches (two intermediate watermark
    * advances) at every scale factor — the correctness gate at sf0.01
    * verifies genuine multi-batch watermark interleaving, not a one-shot
    * batch. A pure function of `rows` (itself a pure function of sf), so
    * batch boundaries — and therefore the watermark sequence — stay
    * deterministic per sf.
    *
    * GRAFT_STREAM_ROWS_PER_BATCH (opt-in, measurement only — the gate
    * always runs the default): pins the per-subtask batch size to a
    * CONSTANT, so a decade-up run admits ×10 the batches instead of ×10
    * the rows per batch. This is the probe that separates operator cost
    * from the replay protocol's artifact (r11 VERDICT Next #3): under
    * the fixed 3-batch plan, per-batch admitted volume — and therefore
    * per-commit state churn — grows with SF, which is NOT how a
    * production stream scales (volume growth means a longer run at
    * bounded per-batch size, not fatter batches). The oracles whose
    * model depends only on the FINAL watermark (stream_topk, q5, …) stay
    * exact under any batching; the timer-replay oracles reconstruct the
    * watermark sequence from the admission plan, so the knob must not be
    * set for a correctness run.
    */
  private def rowsPerBatchFor(rows: Long): Long = {
    val dflt = math.max(1L, (rows + 2) / 3)
    sys.env.get("GRAFT_STREAM_ROWS_PER_BATCH") match {
      case Some(v) =>
        // ENFORCED, not just documented: the knob is a measurement-only
        // probe. A correctness run (= any run that dumps inputs for the
        // DuckDB oracle; the bench sets graft.stream.dumpInputs=false)
        // must fail fast rather than silently collapse the multi-batch
        // plan the watermark-interleaving guard exists to exercise.
        if (sys.props.getOrElse("graft.stream.dumpInputs", "true").toBoolean)
          throw new IllegalStateException(
            "GRAFT_STREAM_ROWS_PER_BATCH is set but this is a correctness " +
            "run (input dump enabled) — the knob is bench-probe only; unset it")
        math.max(1L, v.toLong)
      case None => dflt
    }
  }

  /** Data micro-batches the admission plan yields: ceil(rows / rpb). */
  private def expectedBatches(rows: Long): Int =
    math.ceil(rows.toDouble / rowsPerBatchFor(rows)).toInt

  /** Scale factor encoded in the test-data dir name ("…/sf0.1"). */
  private def sfOf(dir: String): Double =
    "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.01)

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Sink/checkpoint temp dirs live until JVM exit (the returned DataFrame
    * lazily re-reads the sink parquet, so they can't be deleted inline);
    * a shutdown hook bounds the accumulation across bench/verify/spec
    * invocations on the shared box.
    */
  private val tmpDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    sys.addShutdownHook {
      tmpDirs.forEach { base =>
        try {
          java.nio.file.Files.walk(base)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => try java.nio.file.Files.deleteIfExists(p) catch { case _: Throwable => () })
        } catch { case _: Throwable => () }
      }
    }
  }

  /** Where each entry dumps its deterministic input events for the DuckDB
    * oracle. A single `current` dir (not per-sf): the oracle must read the
    * inputs of the SAME run that produced the outputs being compared, and
    * every consumer (the driver, tools/selfcheck.py) runs the DuckDB
    * compare immediately after the Verify run that wrote both — so
    * last-write-wins is exactly right at any scale factor. The one writer
    * that is NOT followed by a compare, the bench, skips the dump entirely
    * (see [[dumpInput]]). Overridable via -Dgraft.stream.dumpBase for a
    * checkout outside /root/repo (set it for BOTH the Verify run and any
    * process reading the emitted oracle SQL — the path is baked into the
    * SQL at dump time).
    */
  private val InputDumpBase = sys.props.getOrElse(
    "graft.stream.dumpBase", "/root/repo/target/stream_inputs")

  /** Persist the EXACT event set the DSv2 streaming source will emit: the
    * same `format("nexmark")` table read in BATCH mode with identical
    * options plans the identical per-subtask [0, rows) id ranges, and every
    * field is a pure function of (seed, subtask, eventId) — so this parquet
    * is the streaming input, byte for byte, not a re-simulation of it.
    *
    * Benchmarks skip the dump (graft.stream.dumpInputs=false, set by
    * [[graft.Bench]]): it is part of the correctness surface, not of the
    * measured pipeline.
    */
  private def dumpInput(spark: SparkSession, dir: String, name: String,
                        entity: String, cfg: GenConfig, rows: Long,
                        label: String = null): Unit =
    if (sys.props.getOrElse("graft.stream.dumpInputs", "true").toBoolean) {
      spark.read.format("nexmark")
        .options(NexmarkSources.nexmarkOptions(entity, cfg, Parallelism, rows,
          rowsPerBatchFor(rows)))
        .load()
        .write.mode("overwrite")
        .parquet(s"$InputDumpBase/current/$name/${Option(label).getOrElse(entity)}")
    }

  /** DuckDB-side reference to a dumped input (see [[InputDumpBase]] for
    * why `current`). The single-micro-batch watermark model in the oracles
    * is exact at every driver-verified scale: the gate runs at sf0.01
    * (≤ 50k rows per subtask = one batch) and the local probe at sf0.001.
    */
  private def inPath(name: String, entity: String): String =
    s"read_parquet('$InputDumpBase/current/$name/$entity/*.parquet')"

  /** Run a bounded streaming DataFrame to a parquet file sink with
    * Trigger.AvailableNow, return the sink contents (empty-but-typed if no
    * window finalized).
    *
    * shuffle.partitions is pinned to the source parallelism for the run:
    * every stateful operator creates one state store PER shuffle partition
    * and commits each of them EVERY micro-batch, so a 3-stateful-operator
    * pipeline (agg → join → agg) at 32 partitions × 7 batches pays ~700
    * state commits of pure overhead. Sizing stores to the actual
    * parallelism is the same knob a cluster deployment tunes (state store
    * count ≈ cores, not default-200). Restored after the run so batch
    * queries in the same session keep their own setting.
    */
  private def runToParquet(spark: SparkSession, df: DataFrame, name: String,
                           minBatches: Int): DataFrame = {
    val id = s"${name}_${runSeq.incrementAndGet()}"
    val base = java.nio.file.Files.createTempDirectory(s"graftstream_$id")
    tmpDirs.add(base)
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    // GRAFT_STATE_PARTITIONS overrides the state-store instance count
    // (shuffle partitions = stores per stateful operator) WITHOUT touching
    // source parallelism or volume — the knob the r10 partition-count
    // sweep turns to measure how per-instance working-set size drives
    // RocksDB LSM amplification (BASELINE.md §Scaling), and the same
    // lever a cluster deployment sizes (cluster.conf: 2000)
    val statePartitions = sys.env.get("GRAFT_STATE_PARTITIONS")
      .map(_.toInt).getOrElse(Parallelism)
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    // GRAFT_STREAM_CONF (measurement-only): semicolon-separated k=v Spark
    // confs applied for this run and restored after — the lever the r13
    // commit-floor mitigation sweep turns (minBatchesToRetain, state
    // maintenanceInterval) without baking any sweep point into the gate
    // path. NOT for `fileSink.log.*` confs: the sink's metadata-log READER
    // derives expected `.compact` ids from the session conf AT READ TIME,
    // and the restore below runs before the final spark.read of the sink —
    // a compactInterval override would make that read fail with
    // "N.compact doesn't exist". Inject sink-log confs as `-Dspark.*`
    // system properties instead (tools/commit_floor_sweep.sh does).
    val extraConf: Seq[(String, String)] = sys.env.get("GRAFT_STREAM_CONF").toSeq
      .flatMap(_.split(";")).filter(_.contains("="))
      .map { kv => val a = kv.split("=", 2); (a(0).trim, a(1).trim) }
    val prevExtra = extraConf.map { case (k, _) => k -> spark.conf.getOption(k) }
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
    // GRAFT_STATE_PROVIDER=rocksdb switches every entry to the disk-backed
    // provider (the companion lever to GRAFT_STATE_PARTITIONS). The default
    // HDFSBackedStateStoreProvider holds each store's versioned maps ON
    // HEAP — at decade-up volumes a local[32] single JVM hosts ALL state
    // store instances, so heap usage is ∝ TOTAL retained state regardless
    // of partition count (the sf10 stream_q8_join OOM that motivated this
    // knob). RocksDB bounds heap at the block-cache size; on a cluster the
    // same setting is what cluster.conf ships.
    // GRAFT_STREAM_SINK=foreachBatch (measurement-only): the NO-METADATA
    // sink control for the commit-floor attribution — per-batch direct
    // parquet appends, no `_spark_metadata` log to compact, so the delta
    // vs the default file sink isolates the sink-log term of the commit
    // floor. Bench-probe only: without the transactional log, task
    // retries could duplicate files, so a correctness run must fail fast
    // (same enforcement as GRAFT_STREAM_ROWS_PER_BATCH).
    val sinkMode = sys.env.getOrElse("GRAFT_STREAM_SINK", "parquet")
    if (sinkMode != "parquet" &&
        sys.props.getOrElse("graft.stream.dumpInputs", "true").toBoolean)
      throw new IllegalStateException(
        "GRAFT_STREAM_SINK is set but this is a correctness run — unset it")
    def run(): Unit = {
      val base = if (sinkMode == "foreachBatch")
        df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
      else
        df.writeStream.format("parquet").option("path", out)
      base.option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    try {
      if (sys.env.get("GRAFT_STATE_PROVIDER").contains("rocksdb"))
        withRocksDB(spark)(run())
      else run()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevExtra.foreach {
        case (k, Some(p)) => spark.conf.set(k, p)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    // GRAFT_STREAM_COMMIT_STATS=1: print the per-batch completion-time
    // trend — batch id → file mtime from the commit log AND the sink
    // metadata log (whichever retains more ids; the commit log keeps only
    // the last minBatchesToRetain, sink deltas survive until cleanupDelay)
    // — as decile-averaged per-batch seconds. This is the direct evidence
    // surface for "does the commit floor grow with batches elapsed".
    if (sys.env.contains("GRAFT_STREAM_COMMIT_STATS")) {
      def mtimes(dir: String): Array[(Long, Long)] =
        Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
          .flatMap(f => f.getName.split("\\.")(0).toLongOption.map(id => (id, f.lastModified())))
          .groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).max) }
          .toArray.sortBy(_._1)
      val src = Seq(mtimes(s"$ckpt/commits"), mtimes(s"$out/_spark_metadata"))
        .maxBy(_.length)
      if (src.length >= 20) {
        // normalize by id gap: retained ids are NOT consecutive (old sink
        // deltas survive only as every-compactInterval-th .compact), so an
        // interval spanning g batches contributes its PER-BATCH time
        val durs = src.sliding(2).collect {
          case Array((ia, a), (ib, b)) if ib > ia => (b - a) / 1000.0 / (ib - ia)
        }.toArray
        val dec = (0 until 10).map { d =>
          val lo = d * durs.length / 10
          val hi = math.max(lo + 1, (d + 1) * durs.length / 10)
          val s = durs.slice(lo, hi)
          "%.3f".formatLocal(java.util.Locale.ROOT, s.sum / s.length)
        }
        println(s"""COMMITSTATS {"name":"$name","ids":${src.head._1}-${src.last._1},"batches":${src.length},"per_batch_decile_sec":[${dec.mkString(",")}]}""")
      }
    }
    // multi-batch invariant: the admission plan ([[rowsPerBatchFor]]) must
    // actually have executed — an entry that silently collapsed to one
    // micro-batch would pass the oracle without exercising intermediate
    // watermark advances, which is the behavior this surface verifies.
    // Count as MAX id + 1, not file count: the commit log retains only
    // the last spark.sql.streaming.minBatchesToRetain (100) entries, so
    // a >100-batch run (the GRAFT_STREAM_ROWS_PER_BATCH decade probe)
    // would otherwise read as ~101 and trip the guard spuriously.
    val committed = Option(new java.io.File(s"$ckpt/commits").listFiles())
      .map(_.flatMap(f => f.getName.toLongOption).foldLeft(-1L)(math.max) + 1)
      .getOrElse(0L)
    if (committed < minBatches) throw new IllegalStateException(
      s"$name: $committed committed micro-batches < expected $minBatches — " +
        "multi-batch watermark interleaving was not exercised")
    val wrote = new java.io.File(out).listFiles() != null &&
      new java.io.File(out).listFiles().exists(f => f.getName.endsWith(".parquet"))
    if (wrote) spark.read.schema(df.schema).parquet(out)
    else // no finalized window at this volume: empty but schema-typed
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
  }

  /** Q5 hot-auctions windowed agg over a generated bid stream.
    * sf0.1 → 1,000,000 bids (125k per subtask × 8).
    */
  def streamQ5Hot(spark: SparkSession, dir: String): DataFrame = {
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_q5_hot", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark, NexmarkQueries.q5HotAuctions(bids, "5 seconds"), "q5hot",
      expectedBatches(rows))
  }

  /** q5HotAuctions over the dumped bids: 5 s tumbling windows, emitted iff
    * window_end ≤ final watermark = max(ts) − 2000 (the 2 s delay).
    */
  private val streamQ5HotSql: String =
    s"""WITH b AS (SELECT * FROM ${inPath("stream_q5_hot", "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM b)
      |SELECT (timestamp // 5000) * 5000 AS windowStartMs,
      |       auctionId,
      |       MAX(bid) AS maxPrice,
      |       COUNT(*) AS bidCount,
      |       MAX(timestamp) AS lastTimestamp,
      |       MAX(ingestionTimestamp) AS lastIngestionTimestamp
      |FROM b
      |GROUP BY 1, 2
      |HAVING (timestamp // 5000) * 5000 + 5000 <= (SELECT w FROM wm)
      |""".stripMargin

  /** Q8 new-users windowed two-stream join: persons ⋈ auctions per window.
    * Person and auction streams cover the SAME event-time span (person
    * eps scaled by the 1:4 volume ratio) so the min-watermark across the
    * two sources advances steadily instead of stalling on the smaller
    * stream.  sf0.1 → 250k persons + 1M auctions.
    */
  def streamQ8Join(spark: SparkSession, dir: String): DataFrame = {
    val sf = sfOf(dir)
    val aRows = math.max(1L, (10000000L * sf / Parallelism).toLong)
    val pRows = math.max(1L, aRows / 4)
    val pCfg = GenConfig(eventsPerSecond = 250L)
    val aCfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_q8_join", "persons", pCfg, pRows)
    dumpInput(spark, dir, "stream_q8_join", "auctions", aCfg, aRows)
    val persons = NexmarkSources.personStreamDsv2(spark, pCfg, Parallelism, pRows, rowsPerBatchFor(pRows))
    val auctions = NexmarkSources.auctionStreamDsv2(spark, aCfg, Parallelism, aRows, rowsPerBatchFor(aRows))
    runToParquet(spark, NexmarkQueries.q8NewUsers(persons, auctions, "5 seconds"), "q8join",
      math.max(expectedBatches(pRows), expectedBatches(aRows)))
  }

  /** q8NewUsers over the dumped persons/auctions: per (5 s window, person)
    * the latest person stamps joined to the latest-ingested auction. Two
    * watermarked sources → the global watermark is the MIN of the two
    * per-source (max − 2000) watermarks; windows emit iff end ≤ that.
    * The argmax ordering (ingestion DESC, creation DESC) mirrors the
    * Spark side's max_by(creation, struct(ingestion, creation)).
    */
  private val streamQ8JoinSql: String =
    s"""WITH p AS (SELECT * FROM ${inPath("stream_q8_join", "persons")}),
      |a AS (SELECT * FROM ${inPath("stream_q8_join", "auctions")}),
      |wm AS (SELECT LEAST((SELECT MAX(timestamp) FROM p),
      |                    (SELECT MAX(timestamp) FROM a)) - 2000 AS w),
      |pw AS (
      |  SELECT (timestamp // 5000) * 5000 AS windowStartMs, personId,
      |         MAX(timestamp) AS personCreation,
      |         MAX(ingestionTimestamp) AS personIngestion
      |  FROM p GROUP BY 1, 2
      |), j AS (
      |  SELECT pw.windowStartMs, pw.personId, pw.personCreation, pw.personIngestion,
      |         a.timestamp AS auctionCreation,
      |         ROW_NUMBER() OVER (PARTITION BY pw.windowStartMs, pw.personId
      |                            ORDER BY a.ingestionTimestamp DESC, a.timestamp DESC) AS rn,
      |         MAX(a.ingestionTimestamp) OVER (PARTITION BY pw.windowStartMs, pw.personId)
      |           AS auctionIngestion
      |  FROM pw JOIN a ON pw.personId = a.personId
      |                AND pw.windowStartMs = (a.timestamp // 5000) * 5000
      |)
      |SELECT windowStartMs, personId, personCreation, personIngestion,
      |       auctionCreation, auctionIngestion
      |FROM j
      |WHERE rn = 1 AND windowStartMs + 5000 <= (SELECT w FROM wm)
      |""".stripMargin

  /** QX winning-bid arbitrary-state port (flatMapGroupsWithState with
    * event-time timers at auction end): the stateful-throughput number.
    * eps 100 stretches the event-time span (~125 s at sf0.1) so most
    * 10-second auctions END inside the stream and resolve via their timer.
    * sf0.1 → 100k auctions + 400k bids.
    */
  def streamQxWinning(spark: SparkSession, dir: String): DataFrame = {
    val (bids, auctions, batches) = qxSources(spark, dir, "stream_qx_winning")
    runToParquet(spark, NexmarkStateful.qxStateful(bids, auctions).toDF, "qxwin", batches)
  }

  /** QX winner over the dumped bids/auctions — the MULTI-BATCH-EXACT
    * model (round 7): instead of the final watermark only, the oracle
    * reconstructs the full per-batch watermark sequence from the dump and
    * replays each key's timer against it, so it is exact at ANY scale —
    * including spans where timers fire mid-stream and later bids miss the
    * fired state (the sf0.1 regime the old final-watermark model could
    * not express).
    *
    * Reconstruction needs no extra dump columns: every subtask emits the
    * SAME timestamp sequence over the same eventId range, so an event's
    * per-subtask id is `dense_rank(ts) − 1`, its micro-batch is
    * `id // rpb` with rpb = ceil(rows/3) mirroring [[rowsPerBatchFor]],
    * and the watermark DURING batch k is max ts over batches < k minus
    * the 2 s delay (0 for k = 0 — Spark's initial watermark). The two
    * entities share one watermark node (union) → max across both.
    *
    * Timer replay per auctionId (arrival order = generation order: one
    * subtask = one map partition):
    *   - qxStateful (maxEnd=true): re-arms at every data batch j with
    *     timeout = max(MAX(end), wm_j + 1) (the setTimeoutTimestamp
    *     clamp), and flatMapGroupsWithState fires only in a batch where
    *     the key has NO data — so the fire batch fk is the first no-data
    *     batch k after the last auction batch with
    *     wm_k > max(E, wm_j + 1), j = the key's last data batch < k.
    *     Winner = argmax over bids with batch < fk; post-fire bids
    *     re-create auction-less state and never emit.
    *   - transformWithState (maxEnd=false): registers ONCE at the first
    *     auction's end (= MIN(end)); real timers fire regardless of key
    *     data, after the batch's input, and fire INCLUSIVELY (wm ≥ ts —
    *     unlike flatMapGroupsWithState's strict-below timeouts; pinned
    *     empirically at sf0.1 by the q11 tws boundary) — fk = first batch
    *     with wm_k ≥ MIN(end), winner over bids with batch ≤ fk (the fire
    *     batch's own bids are appended before the timer handler runs);
    *     the `resolved` tombstone drops everything later.
    * The finalize batch (first no-data batch after the last data batch,
    * wm = global max − 2000) is appended to the batch axis, which reduces
    * this model to the old final-watermark one whenever no timer fires
    * early. Timers fire strictly below the watermark; winner order is
    * (price DESC, ts DESC, bidder ASC). StreamingMultiBatchSpec validates
    * the replay against the real ports at a deliberately-divergent
    * fixture with a Scala twin of this model.
    */
  private def qxTimerSql(name: String, maxEnd: Boolean): String = {
    val prelude =
      s"""WITH b0 AS (
      |  SELECT *, (DENSE_RANK() OVER (ORDER BY timestamp) - 1) AS id
      |  FROM ${inPath(name, "bids")}
      |), b1 AS (
      |  SELECT *, id // (((SELECT MAX(id) + 1 FROM b0) + 2) // 3) AS batch FROM b0
      |), a0 AS (
      |  SELECT *, (DENSE_RANK() OVER (ORDER BY timestamp) - 1) AS id
      |  FROM ${inPath(name, "auctions")}
      |), a1 AS (
      |  SELECT *, id // (((SELECT MAX(id) + 1 FROM a0) + 2) // 3) AS batch FROM a0
      |), bm AS (
      |  SELECT batch, MAX(timestamp) AS mx FROM (
      |    SELECT batch, timestamp FROM a1 UNION ALL SELECT batch, timestamp FROM b1
      |  ) GROUP BY batch
      |), wmd AS (
      |  SELECT batch, COALESCE(MAX(mx) OVER (ORDER BY batch
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 2000, 0) AS w
      |  FROM bm
      |), wmx AS (
      |  SELECT batch, w FROM wmd
      |  UNION ALL
      |  SELECT (SELECT MAX(batch) + 1 FROM bm), (SELECT MAX(mx) - 2000 FROM bm)
      |), keyE AS (
      |  SELECT auctionId, MAX("end") AS emax, MIN("end") AS emin,
      |         MAX(batch) AS la FROM a1 GROUP BY auctionId
      |), kb AS (
      |  SELECT auctionId, batch FROM (
      |    SELECT auctionId, batch FROM a1 UNION SELECT auctionId, batch FROM b1
      |  ) GROUP BY auctionId, batch
      |)""".stripMargin
    val fire =
      if (maxEnd)
        s"""cand AS (
      |  SELECT k.auctionId, w.batch AS fk, w.w AS wk, k.emax, k.la,
      |         (SELECT MAX(kb.batch) FROM kb
      |          WHERE kb.auctionId = k.auctionId AND kb.batch < w.batch) AS j
      |  FROM keyE k, wmx w
      |  WHERE NOT EXISTS (SELECT 1 FROM kb
      |                    WHERE kb.auctionId = k.auctionId AND kb.batch = w.batch)
      |), fire AS (
      |  -- j >= la assumes each auctionId's auction events are contiguous
      |  -- within one subtask (true for the generator: one key = one
      |  -- subtask, per-subtask ids are monotone), so state always holds
      |  -- the full MAX(end) by the key's last auction batch and no fire
      |  -- can precede it. A partial-MAX early fire cannot occur here.
      |  SELECT c.auctionId, MIN(c.fk) AS fk
      |  FROM cand c JOIN wmd jw ON jw.batch = c.j
      |  WHERE c.j IS NOT NULL AND c.j >= c.la
      |    AND c.wk > GREATEST(c.emax, jw.w + 1)
      |  GROUP BY c.auctionId
      |), eligible AS (
      |  SELECT b1.auctionId, b1.personId, b1.bid, b1.timestamp
      |  FROM b1 JOIN fire f ON b1.auctionId = f.auctionId AND b1.batch < f.fk
      |)""".stripMargin
      else
        s"""fire AS (
      |  -- transformWithState timers fire INCLUSIVELY (wm >= ts; pinned
      |  -- empirically by the q11 tws boundary rows at sf0.1), unlike
      |  -- flatMapGroupsWithState's strict-below rule in the maxEnd branch
      |  SELECT k.auctionId, MIN(w.batch) AS fk
      |  FROM keyE k, wmx w WHERE w.w >= k.emin GROUP BY k.auctionId
      |), eligible AS (
      |  SELECT b1.auctionId, b1.personId, b1.bid, b1.timestamp
      |  FROM b1 JOIN fire f ON b1.auctionId = f.auctionId AND b1.batch <= f.fk
      |)""".stripMargin
    s"""$prelude, $fire, ranked AS (
      |  SELECT auctionId, personId AS bidderId, bid, timestamp AS bidTimestamp,
      |         ROW_NUMBER() OVER (PARTITION BY auctionId
      |                            ORDER BY bid DESC, timestamp DESC, personId ASC) AS rn
      |  FROM eligible
      |)
      |SELECT auctionId, bidderId, bid, bidTimestamp FROM ranked WHERE rn = 1
      |""".stripMargin
  }

  /** Shared QX source volumes: stream_qx_winning and stream_qx_tws are a
    * state-backend HEAD-TO-HEAD, so their inputs must stay identical —
    * one definition, no drift.
    */
  private def qxSources(spark: SparkSession, dir: String, name: String) = {
    val sf = sfOf(dir)
    val aRows = math.max(1L, (1000000L * sf / Parallelism).toLong)
    val bRows = aRows * 4
    val aCfg = GenConfig(eventsPerSecond = 100L)
    val bCfg = GenConfig(eventsPerSecond = 400L)
    dumpInput(spark, dir, name, "auctions", aCfg, aRows)
    dumpInput(spark, dir, name, "bids", bCfg, bRows)
    val auctions = NexmarkSources.auctionStreamDsv2(spark, aCfg, Parallelism, aRows, rowsPerBatchFor(aRows))
    val bids = NexmarkSources.bidStreamDsv2(spark, bCfg, Parallelism, bRows, rowsPerBatchFor(bRows))
    (bids, auctions, math.max(expectedBatches(aRows), expectedBatches(bRows)))
  }

  /** Q11 session windows over a generated bid stream — the heaviest
    * stateful aggregation (merging session state, not fixed panes):
    * rounds out the streaming surface next to the fixed-window agg (Q5),
    * the stream-stream join (Q8) and arbitrary state (QX).
    * sf0.1 → 1,000,000 bids, 5 s gap.
    */
  def streamQ11Sessions(spark: SparkSession, dir: String): DataFrame = {
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_q11_sessions", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark, NexmarkQueries.sessions(bids, "5 seconds"), "q11sess",
      expectedBatches(rows))
  }

  /** Per-bidder 5 s-gap session windows over the dumped bids:
    * gaps-and-islands with a STRICT break — a session breaks only when the
    * gap to the previous bid EXCEEDS the gap duration. Spark merges
    * [ts, ts+gap) intervals that overlap OR TOUCH (exact-gap successor
    * EXTENDS the session — pinned by StreamingOracleBoundarySpec; the
    * `>=` break this replaced was a latent oracle bug that only surfaced
    * at sf0.1, the first scale whose generated bids contain exact-gap
    * pairs). Session end = last ts + gap, emitted iff
    * end ≤ max(ts) − 2000.
    */
  private def sessionsOracleSql(name: String): String =
    s"""WITH b AS (SELECT * FROM ${inPath(name, "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM b),
      |o AS (
      |  SELECT personId, timestamp, ingestionTimestamp,
      |         CASE WHEN lag(timestamp) OVER (PARTITION BY personId ORDER BY timestamp) IS NULL
      |                OR timestamp - lag(timestamp) OVER (PARTITION BY personId ORDER BY timestamp) > 5000
      |              THEN 1 ELSE 0 END AS brk
      |  FROM b
      |), s AS (
      |  SELECT personId, timestamp, ingestionTimestamp,
      |         SUM(brk) OVER (PARTITION BY personId ORDER BY timestamp ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o
      |)
      |SELECT MIN(timestamp) AS sessionStartMs,
      |       MAX(timestamp) + 5000 AS sessionEndMs,
      |       personId,
      |       COUNT(*) AS bidCount,
      |       MAX(timestamp) AS maxTimestamp,
      |       MAX(ingestionTimestamp) AS maxIngestionTimestamp
      |FROM s GROUP BY personId, sid
      |HAVING MAX(timestamp) + 5000 <= (SELECT w FROM wm)
      |""".stripMargin

  /** Q7 global-window argmax over a generated bid stream: per 5 s tumbling
    * window, THE highest bid across all keys — the all-keys-into-one-group
    * aggregation shape (a two-level agg under the hood: partial argmax per
    * partition, final merge). sf0.1 → 1,000,000 bids.
    */
  def streamQ7Highest(spark: SparkSession, dir: String): DataFrame = {
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_q7_highest", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark, NexmarkQueries.q7HighestBid(bids, "5 seconds"), "q7high",
      expectedBatches(rows))
  }

  /** q7HighestBid over the dumped bids: per-window argmax under the
    * deterministic (bid DESC, ts DESC, bidder ASC) order, windows emitted
    * iff end ≤ max(ts) − 2000.
    */
  private val streamQ7HighestSql: String =
    s"""WITH b AS (SELECT * FROM ${inPath("stream_q7_highest", "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM b),
      |r AS (
      |  SELECT (timestamp // 5000) * 5000 AS windowStartMs,
      |         auctionId, personId AS bidderId, bid, timestamp AS bidTimestamp,
      |         ROW_NUMBER() OVER (PARTITION BY (timestamp // 5000) * 5000
      |                            ORDER BY bid DESC, timestamp DESC, personId ASC) AS rn
      |  FROM b
      |)
      |SELECT windowStartMs, auctionId, bidderId, bid, bidTimestamp
      |FROM r
      |WHERE rn = 1 AND windowStartMs + 5000 <= (SELECT w FROM wm)
      |""".stripMargin

  /** Watermarked streaming dedup (W7): dropDuplicates on the full bid
    * identity within the watermark horizon — the at-least-once ingestion
    * guard. Unlike the windowed aggs, dedup emits first occurrences
    * IMMEDIATELY (state holds keys back, not results), so every distinct
    * bid appears in the output regardless of the final watermark.
    * sf0.1 → 1,000,000 generated bids (the generator never collides, so
    * output cardinality = input cardinality — verified exactly by the
    * oracle's DISTINCT).
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_dedup", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark, NexmarkQueries.dedupBids(bids).toDF, "dedup",
      expectedBatches(rows))
  }

  private val streamDedupSql: String =
    s"""SELECT DISTINCT ingestionTimestamp, timestamp, auctionId, personId, bidId, bid
      |FROM ${inPath("stream_dedup", "bids")}
      |""".stripMargin

  /** Streaming incremental dedup — the production ingest-guard shape, the
    * streaming twin of [[TextPipeline.incrementalDedup]]: the DELTA arrives
    * as a stream while the already-indexed CORPUS is a static fingerprint
    * index, and the guard emits each first-seen delta fingerprint with its
    * dup-of-corpus verdict.
    *
    *   - dup-in-delta: watermarked `dropDuplicates(fp)` — first occurrence
    *     per fingerprint passes, later ones are swallowed by dedup state.
    *     The key deliberately EXCLUDES event time: a corpus guard admits a
    *     fingerprint once ever, not once per horizon, so state is bounded
    *     by the delta's distinct-fp count (what the next index compaction
    *     absorbs), not evicted by the watermark.
    *   - dup-of-corpus: stream-static LEFT join against the index — the
    *     static side is DISTINCT fingerprints only (no corpus payload
    *     moves; broadcast here, a shuffle semi-join at 100 TB).
    *
    * The fingerprint is md5 of the auctionId — the generator's hot-auction
    * skew makes fingerprints genuinely repeat within the delta, and the
    * corpus (a batch read of the SAME generator's first-half prefix —
    * yesterday's ingest) genuinely overlaps the stream. Output = one row
    * per distinct delta fingerprint (fp determines auctionId, so the
    * surviving row's payload is deterministic under arrival races).
    * sf0.1 → 1,000,000 streamed bids vs a 500,000-bid corpus index.
    */
  def streamIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cRows = math.max(1L, rows / 2)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_incremental_dedup", "bids", cfg, rows)
    dumpInput(spark, dir, "stream_incremental_dedup", "bids", cfg, cRows, label = "corpus")
    // static corpus fingerprint index: the stream's first-half prefix read
    // in batch mode (same (seed, subtask, eventId) purity as dumpInput)
    val corpusFp = spark.read.format("nexmark")
      .options(NexmarkSources.nexmarkOptions("bids", cfg, Parallelism, cRows,
        rowsPerBatchFor(cRows)))
      .load()
      .select(md5(col("auctionId").cast("string")).as("fp"))
      .distinct()
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    val guarded = bids.toDF
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "2 seconds")
      .withColumn("fp", md5(col("auctionId").cast("string")))
      .dropDuplicates("fp")
      .join(broadcast(corpusFp.withColumn("in_corpus", lit(1))), Seq("fp"), "left")
      .select(col("auctionId"), col("fp"),
        coalesce(col("in_corpus"), lit(0)).as("dup_of_corpus"),
        (coalesce(col("in_corpus"), lit(0)) === 0).cast("int").as("keep"))
    runToParquet(spark, guarded, "incdedup", expectedBatches(rows))
  }

  /** One row per distinct delta fingerprint with its corpus verdict: dedup
    * emits first occurrences immediately (state holds keys back, not
    * results), so every distinct fp appears regardless of the watermark.
    */
  private val streamIncrementalDedupSql: String =
    s"""WITH s AS (
      |  SELECT auctionId, md5(CAST(auctionId AS VARCHAR)) AS fp
      |  FROM ${inPath("stream_incremental_dedup", "bids")} GROUP BY auctionId
      |), c AS (
      |  SELECT DISTINCT md5(CAST(auctionId AS VARCHAR)) AS fp
      |  FROM ${inPath("stream_incremental_dedup", "corpus")}
      |)
      |SELECT s.auctionId, s.fp,
      |       CAST(c.fp IS NOT NULL AS INT) AS dup_of_corpus,
      |       CAST(c.fp IS NULL AS INT) AS keep
      |FROM s LEFT JOIN c ON s.fp = c.fp
      |""".stripMargin

  /** Synthetic per-event token sets for the streaming NEAR-dup guard:
    * [[NearUniqToks]] tokens unique to the auctionId plus
    * [[NearGroupToks]] tokens shared by the auction's
    * ÷[[NearGroupDiv]] group. Two distinct auctions of one group have
    * exact Jaccard 9/15 = 0.6 (near-dups above the ½ verify threshold
    * without being identical); cross-group overlap is 0; an id present
    * in both corpus and delta is an exact dup (J = 1). bidAuction ids
    * are dense over the recent-20k window, so both members of a group
    * genuinely occur. The generic machinery (MinHash over a token set,
    * banded buckets, exact set-intersection verify) is what production
    * runs over real shingles — the token generator is the fixture.
    */
  private val NearGroupToks = 9
  private val NearUniqToks = 3
  private val NearGroupDiv = 2
  private def nearToksExpr(c: String): String =
    s"concat(" +
      s"transform(sequence(1, $NearGroupToks), i -> " +
      s"concat('g', cast($c div $NearGroupDiv as string), '_', cast(i as string))), " +
      s"transform(sequence(1, $NearUniqToks), i -> " +
      s"concat('u', cast($c as string), '_', cast(i as string))))"
  private def nearToksSql(c: String): String =
    s"list_concat(" +
      s"list_transform(range(1, ${NearGroupToks + 1}), i -> " +
      s"'g' || CAST($c // $NearGroupDiv AS VARCHAR) || '_' || CAST(i AS VARCHAR)), " +
      s"list_transform(range(1, ${NearUniqToks + 1}), i -> " +
      s"'u' || CAST($c AS VARCHAR) || '_' || CAST(i AS VARCHAR)))"

  /** Streaming incremental NEAR-dup — [[streamIncrementalDedup]] lifted
    * from exact fingerprints to MinHash-LSH (the streaming twin of
    * [[TextPipeline.incrementalNearDup]], closing the r12 VERDICT's
    * ingest-guard gap): the delta arrives as a stream; the already-
    * indexed corpus is reachable ONLY through its static (band, bkey)
    * posting lists; each admitted delta doc is screened against the
    * buckets its own row-wise band keys probe, and bucket candidates are
    * verified with the exact integer Jaccard-≥-½ rule before they count.
    *
    * Stage order is the production one: (1) watermarked exact-identity
    * dedup FIRST (`dropDuplicates(auctionId)` — the at-least-once guard;
    * state = distinct ids, the same bounded-state argument as the exact
    * twin), so banding work is paid once per distinct doc, not once per
    * arrival; (2) row-wise tokens → signature → band keys
    * ([[TextPipeline.rowSigExpr]] — map-only, identical bits to the
    * batch aggregation); (3) [[TextPipeline.NumBands]] broadcast LEFT
    * joins against the per-band posting lists (stream-static, stateless;
    * at 100 TB the postings are a bucketed table and these are
    * shuffle-free bucket probes); (4) per-row candidate-union + verify
    * with higher-order functions — NO second stateful stage, so the
    * output is deterministic under arrival races (every column is a pure
    * function of auctionId).
    *
    * Within-delta NEAR-dup verdicts are deliberately absent: "which doc
    * claimed this bucket first" is processing-order-dependent under
    * parallel arrival, so no engine-independent oracle can pin it —
    * within-corpus near-dup is the batch entries' job
    * (`t_minhash_pairs`), and the within-delta EXACT guard is stage (1).
    * sf0.1 → 1,000,000 streamed bids vs a 500,000-bid corpus index.
    */
  def streamIncrementalNearDup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cRows = math.max(1L, rows / 2)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_incremental_neardup", "bids", cfg, rows)
    dumpInput(spark, dir, "stream_incremental_neardup", "bids", cfg, cRows, label = "corpus")
    val corpusIds = spark.read.format("nexmark")
      .options(NexmarkSources.nexmarkOptions("bids", cfg, Parallelism, cRows,
        rowsPerBatchFor(cRows)))
      .load()
      .select(col("auctionId").as("corpus_id")).distinct()
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark, nearDupGuard(bids.toDF, corpusIds), "incneardup",
      expectedBatches(rows))
  }

  /** The guard dataflow itself, over any bid stream and corpus-id set
    * (split out so StreamingMultiBatchSpec can pin 1-batch == 4-batch on
    * its own bounded fixture): stages (1)-(4) of the entry doc above.
    */
  private[graft] def nearDupGuard(bids: DataFrame, corpusIds: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val nb = TextPipeline.NumBands
    // static corpus posting lists (band b: bkey -> sorted distinct ids) —
    // in production the incrementally-maintained index table, bucketed by
    // bkey; recomputed here because entries are self-contained
    // fan out BEFORE the banding kernel (r16): the distinct's output is
    // small in BYTES (8 B/id), so AQE coalesces it to one partition and
    // the 12-md5-per-id banding pass runs single-threaded (measured
    // 3-6 s of the entry at sf0.1). The id set is CHECKPOINTED at the
    // pinned partition count — a bare repartition is not enough, the
    // optimizer re-fuses the banding below it into the single coalesced
    // stage (r16 plan inspection); the checkpoint's lineage cut pins the
    // 1-id-block-per-core layout the kernel then runs over.
    val ids = corpusIds
      .repartition(corpusIds.sparkSession.sparkContext.defaultParallelism,
        col("corpus_id"))
      .localCheckpoint(true)
    val corpusBands = ids
      .withColumn("toks", expr(nearToksExpr("corpus_id")))
      .withColumn("bks", expr("minhash_bands(toks)"))
      .select(col("corpus_id"), posexplode(col("bks")).as(Seq("band", "bkey")))
    // ONE aggregation over all bands, checkpointed once (r16: the
    // previous per-band slice materialization paid nb=12 separate
    // shuffle+checkpoint jobs ≈ 5 s at sf0.1; this is the identical
    // posting content in a single (band, bkey) hash-agg). Materialized
    // because a stream-static join re-evaluates its static side EVERY
    // micro-batch — an uncheckpointed posting table would re-run the
    // banding aggregation nb × batches times.
    val posted = corpusBands
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_set(col("corpus_id"))).as("cands"))
      .localCheckpoint(true)
    val postings = (0 until nb).map(b =>
      posted.filter(col("band") === b)
        .select(col("bkey").as(s"bk_$b"), col("cands").as(s"cands_$b")))
    var s = bids
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "2 seconds")
      .dropDuplicates("auctionId")
      .withColumn("toks", expr(nearToksExpr("auctionId")))
      .withColumn("bks", expr("minhash_bands(toks)"))
    for (b <- 0 until nb)
      s = s.withColumn(s"bk_$b", element_at(col("bks"), b + 1))
        .join(broadcast(postings(b)), Seq(s"bk_$b"), "left")
    val candsExpr = (0 until nb)
      .map(b => s"coalesce(cands_$b, cast(array() as array<bigint>))")
      .mkString("array_distinct(sort_array(concat(", ", ", ")))")
    s.withColumn("cands", expr(candsExpr))
      // build each candidate's token set ONCE (r16): the filter lambda
      // previously interpolated nearToksExpr(c) twice — the intersect arm
      // and the size arm — doubling the dominant per-candidate cost (24
      // string concats per build); same predicate via a (cand, ctoks)
      // struct pass
      .withColumn("verified", expr(
        s"transform(filter(transform(cands, c -> struct(c AS c, ${nearToksExpr("c")} AS ct)), " +
          "p -> size(array_intersect(toks, p.ct)) * 3 >= size(toks) + size(p.ct)), p -> p.c)"))
      .select(col("auctionId"),
        size(col("cands")).cast("long").as("n_bucket_cands"),
        size(col("verified")).cast("long").as("n_corpus_dups"),
        coalesce(array_min(col("verified")), lit(-1L)).as("dup_of"),
        (size(col("verified")) === 0).cast("int").as("keep"))
  }

  /** One row per distinct delta auctionId (dedup emits first occurrences
    * immediately; every output column is a pure function of the id, so
    * arrival races never change a value). Bands/sigs recomputed by the
    * aggregated formulation over the SAME dumped inputs.
    */
  private val streamIncrementalNearDupSql: String =
    s"""WITH sdel AS (
      |  SELECT DISTINCT auctionId AS id FROM ${inPath("stream_incremental_neardup", "bids")}
      |), scor AS (
      |  SELECT DISTINCT auctionId AS id FROM ${inPath("stream_incremental_neardup", "corpus")}
      |), ids AS (
      |  SELECT DISTINCT id FROM (SELECT id FROM sdel UNION ALL SELECT id FROM scor)
      |), tl AS MATERIALIZED (
      |  SELECT id, ${nearToksSql("id")} AS tk FROM ids
      |), sh AS (
      |  SELECT id AS doc_id, UNNEST(tk) AS sh FROM tl
      |), ${TextPipeline.sqlSigStages}, bands AS MATERIALIZED (
      |  ${TextPipeline.sqlBandSelects}
      |), db AS (
      |  SELECT b.doc_id, b.band, b.bkey FROM bands b SEMI JOIN sdel ON b.doc_id = sdel.id
      |), cb AS (
      |  SELECT b.doc_id AS corpus_id, b.band, b.bkey FROM bands b SEMI JOIN scor ON b.doc_id = scor.id
      |), cands AS MATERIALIZED (
      |  SELECT DISTINCT db.doc_id, cb.corpus_id
      |  FROM db JOIN cb ON db.band = cb.band AND db.bkey = cb.bkey
      |), nbc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bucket_cands FROM cands GROUP BY doc_id
      |), v AS (
      |  SELECT c.doc_id, c.corpus_id
      |  FROM cands c JOIN tl a ON c.doc_id = a.id JOIN tl b2 ON c.corpus_id = b2.id
      |  WHERE LEN(list_filter(a.tk, s -> list_contains(b2.tk, s))) * 3 >= LEN(a.tk) + LEN(b2.tk)
      |), agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_corpus_dups, MIN(corpus_id) AS dup_of
      |  FROM v GROUP BY doc_id
      |)
      |SELECT sdel.id AS auctionId,
      |       COALESCE(nbc.n_bucket_cands, 0) AS n_bucket_cands,
      |       COALESCE(agg.n_corpus_dups, 0) AS n_corpus_dups,
      |       COALESCE(agg.dup_of, -1) AS dup_of,
      |       CAST(COALESCE(agg.n_corpus_dups, 0) = 0 AS INT) AS keep
      |FROM sdel LEFT JOIN nbc ON sdel.id = nbc.doc_id LEFT JOIN agg ON sdel.id = agg.doc_id
      |""".stripMargin

  /** Same QX topology on the Spark 4 transformWithState API (named
    * state + real per-key timers) over RocksDB — the 1:1 Flink
    * KeyedProcessFunction mapping's throughput number, measured against
    * [[streamQxWinning]]'s flatMapGroupsWithState at identical volume.
    * Provider conf is set/restored around the run (transformWithState
    * requires multi-column-family state, i.e. RocksDB).
    */
  def streamQxTws(spark: SparkSession, dir: String): DataFrame = {
    val (bids, auctions, batches) = qxSources(spark, dir, "stream_qx_tws")
    withRocksDB(spark)(runToParquet(spark,
      graft.nexmark.queries.NexmarkTws.qxWinningBidsTws(bids, auctions).toDF, "qxtws", batches))
  }

  /** transformWithState requires multi-column-family state, i.e. RocksDB;
    * provider conf is set/restored around the run. Changelog
    * checkpointing rides along, exactly as in production
    * (conf/cluster.conf): each commit uploads the batch's delta instead
    * of a full RocksDB snapshot. Without it the per-batch commit cost is
    * ∝ TOTAL accumulated state, which the r9 10× scale-stress measured
    * as stream_q11_tws's superlinearity (13.5× wall for 10× rows,
    * exponent 1.13); with the delta commit the entry scales ~linearly
    * (BASELINE.md §Scaling).
    */
  private def withRocksDB[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
      "spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB" -> "128")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(p)) => spark.conf.set(k, p)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Q11 session merge on transformWithState over RocksDB — the
    * state-backend-and-API head-to-head for the HEAVIEST state shape
    * (session merge), measured against [[streamQ11Sessions]]'s declarative
    * `session_window` at identical volume, exactly as the qx pair compares
    * the two APIs for the timer shape. Identical input volumes and
    * identical output columns → one oracle model, two dump names.
    */
  def streamQ11Tws(spark: SparkSession, dir: String): DataFrame = {
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_q11_tws", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    withRocksDB(spark)(runToParquet(spark,
      graft.nexmark.queries.NexmarkTws.sessionsTws(bids).toDF, "q11tws",
      expectedBatches(rows)))
  }

  /** Conversion funnel as keyed CEP state (signup → first listing →
    * first sale-bid within a 5 s conversion window of signup,
    * [[NexmarkStateful.funnelStateful]]) over the three entity streams.
    *
    * Volumes are forced to a multiple of 12 so the three streams'
    * micro-batch boundaries land on IDENTICAL event-time instants
    * (persons: rows/4 events at 4 ms spacing; auctions/bids: rows events
    * at 1 ms — each batch then covers the same half-open time range in
    * all three streams). That makes equal-timestamp cross-stream pairs
    * arrive in the SAME batch, where the state machine's (ts, kind) sort
    * orders them deterministically — the one interleaving the
    * monotone-time argument alone does not fix.
    */
  def streamFunnel(spark: SparkSession, dir: String): DataFrame = {
    val raw = (10000000L * sfOf(dir) / Parallelism).toLong
    val rows = math.max(12L, raw / 12L * 12L)
    val pRows = rows / 4
    val pCfg = GenConfig(eventsPerSecond = 250L)
    val abCfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_funnel", "persons", pCfg, pRows)
    dumpInput(spark, dir, "stream_funnel", "auctions", abCfg, rows)
    dumpInput(spark, dir, "stream_funnel", "bids", abCfg, rows)
    val persons = NexmarkSources.personStreamDsv2(spark, pCfg, Parallelism, pRows, rowsPerBatchFor(pRows))
    val auctions = NexmarkSources.auctionStreamDsv2(spark, abCfg, Parallelism, rows, rowsPerBatchFor(rows))
    val bids = NexmarkSources.bidStreamDsv2(spark, abCfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark,
      NexmarkStateful.funnelStateful(persons, auctions, bids, windowMs = 5000L).toDF,
      "funnel", expectedBatches(rows))
  }

  /** Funnel oracle: the timer arms once at signup + 5000 and the clamp
    * only delays emission past window close (class doc of
    * [[NexmarkStateful.funnelStateful]]), so a funnel row is emitted iff
    * signup + 5000 < the final min-across-sources watermark; stages are
    * conditional mins inside [signup, signup + 5000). Persons keep the
    * earliest event per personId (generator ids are unique per stream,
    * but MIN matches the state machine's first-wins exactly).
    *
    * The LEAST(per-stream MAX) - 2000 watermark model is the ENGINE's
    * semantics by construction, not a coincidence: funnelStateful
    * watermarks each stream before the union, so Spark's default
    * multipleWatermarkPolicy=min makes the global watermark exactly the
    * min across the three sources. (Persons' last event trails
    * auctions/bids by 3 ms at these spacings — with a single post-union
    * watermark the engine would use the overall MAX and could emit
    * windows closing inside that gap that this oracle excludes.)
    */
  private val streamFunnelSql: String =
    s"""WITH p AS (SELECT personId, MIN(timestamp) AS s_ms
      |           FROM ${inPath("stream_funnel", "persons")} GROUP BY personId),
      |a AS (SELECT personId, timestamp FROM ${inPath("stream_funnel", "auctions")}),
      |b AS (SELECT personId, timestamp FROM ${inPath("stream_funnel", "bids")}),
      |wm AS (SELECT LEAST(
      |         (SELECT MAX(timestamp) FROM ${inPath("stream_funnel", "persons")}),
      |         (SELECT MAX(timestamp) FROM a),
      |         (SELECT MAX(timestamp) FROM b)) - 2000 AS w),
      |v AS (
      |  SELECT p.personId, MIN(a.timestamp) AS v_ms
      |  FROM p JOIN a ON a.personId = p.personId
      |   AND a.timestamp >= p.s_ms AND a.timestamp < p.s_ms + 5000
      |  GROUP BY p.personId
      |), pp AS (
      |  SELECT p.personId, MIN(b.timestamp) AS p_ms
      |  FROM p JOIN v ON v.personId = p.personId
      |  JOIN b ON b.personId = p.personId
      |   AND b.timestamp >= v.v_ms AND b.timestamp < p.s_ms + 5000
      |  GROUP BY p.personId
      |)
      |SELECT p.personId, p.s_ms AS sMs,
      |       COALESCE(v.v_ms, -1) AS vMs, COALESCE(pp.p_ms, -1) AS pMs,
      |       1 + CAST(v.v_ms IS NOT NULL AS INT) + CAST(pp.p_ms IS NOT NULL AS INT) AS stage
      |FROM p LEFT JOIN v USING (personId) LEFT JOIN pp USING (personId)
      |WHERE p.s_ms + 5000 < (SELECT w FROM wm)
      |""".stripMargin

  /** Declarative stream-stream INTERVAL join (bid ⋈ auction events within
    * [auction, auction + 5 s]) — the built-in watermark-bounded range-join
    * operator next to the hand-built QX state machine: same qx sources and
    * volumes (the differential control for what the built-in costs vs
    * arbitrary state), state horizon derived from the range condition.
    * sf0.1 → 100k auctions + 400k bids.
    */
  def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val (bids, auctions, batches) = qxSources(spark, dir, "stream_interval_join")
    runToParquet(spark, NexmarkQueries.qIntervalJoin(bids, auctions), "intjoin", batches)
  }

  /** qIntervalJoin over the dumped streams: a plain range join, NO
    * watermark cutoff — inner-join matches are emitted immediately, and
    * eviction can never drop a future match under globally non-decreasing
    * event time (argument in qIntervalJoin's scaladoc; 1-batch == N-batch
    * pinned by StreamingMultiBatchSpec).
    */
  private val streamIntervalJoinSql: String =
    s"""WITH a AS (SELECT * FROM ${inPath("stream_interval_join", "auctions")}),
      |b AS (SELECT * FROM ${inPath("stream_interval_join", "bids")})
      |SELECT b.auctionId, b.personId AS bidderId, b.bid,
      |       b.timestamp AS bidTimestamp, a.timestamp AS auctionCreation,
      |       b.timestamp - a.timestamp AS bidDelayMs
      |FROM b JOIN a ON b.auctionId = a.auctionId
      |              AND b.timestamp >= a.timestamp
      |              AND b.timestamp <= a.timestamp + 5000
      |""".stripMargin

  /** LEFT OUTER interval join — the semantics the inner entry can't
    * exercise: an unmatched bid's null row is withheld until the
    * WATERMARK proves no in-range auction can still arrive (Spark emits
    * it when the global watermark passes the bid's last possible match
    * instant; the final no-data micro-batch flushes the last horizon).
    * Same sources/volumes as the inner entry.
    */
  def streamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val (bids, auctions, batches) = qxSources(spark, dir, "stream_outer_join")
    runToParquet(spark,
      NexmarkQueries.qIntervalJoin(bids, auctions, joinType = "left_outer"),
      "intouter", batches)
  }

  /** Matched rows as in the inner oracle; null rows for bids with NO
    * in-range auction whose event time is STRICTLY below the final global
    * watermark = LEAST(per-source MAX ts) − 2000 (multipleWatermarkPolicy
    * = min; strict `<` pinned empirically at all three SFs — a bid AT the
    * watermark still has its state retained).
    */
  private val streamOuterJoinSql: String =
    s"""WITH a AS (SELECT * FROM ${inPath("stream_outer_join", "auctions")}),
      |b AS (SELECT * FROM ${inPath("stream_outer_join", "bids")}),
      |wm AS (SELECT LEAST((SELECT MAX(timestamp) FROM a), (SELECT MAX(timestamp) FROM b)) - 2000 AS w)
      |SELECT b.auctionId, b.personId AS bidderId, b.bid,
      |       b.timestamp AS bidTimestamp, a.timestamp AS auctionCreation,
      |       b.timestamp - a.timestamp AS bidDelayMs
      |FROM b JOIN a ON b.auctionId = a.auctionId
      |              AND b.timestamp >= a.timestamp
      |              AND b.timestamp <= a.timestamp + 5000
      |UNION ALL
      |SELECT b.auctionId, b.personId, b.bid, b.timestamp,
      |       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      |FROM b
      |WHERE NOT EXISTS (SELECT 1 FROM a WHERE b.auctionId = a.auctionId
      |                    AND b.timestamp >= a.timestamp
      |                    AND b.timestamp <= a.timestamp + 5000)
      |  AND b.timestamp < (SELECT w FROM wm)
      |""".stripMargin

  /** Chained stateful windowed top-3 over the Q5 bid stream (two
    * stateful aggs in one append pipeline — the multi-stateful-operator
    * shape). Same volumes as stream_q5_hot.
    */
  def streamTopK(spark: SparkSession, dir: String): DataFrame = {
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_topk", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark, NexmarkQueries.qWindowTopK(bids, "5 seconds"), "topk",
      expectedBatches(rows))
  }

  /** qWindowTopK over the dumped bids: both stages finalize under the
    * same watermark, so the emitted windows are exactly those with
    * window_end ≤ final wm = max(ts) − 2000 (the q5 cutoff), ranked
    * top-3 by (bidCount DESC, auctionId ASC).
    */
  private val streamTopKSql: String =
    s"""WITH b AS (SELECT * FROM ${inPath("stream_topk", "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM b),
      |s1 AS (
      |  SELECT (timestamp // 5000) * 5000 AS windowStartMs, auctionId,
      |         CAST(COUNT(*) AS BIGINT) AS bidCount, MAX(bid) AS maxPrice
      |  FROM b GROUP BY 1, 2
      |  HAVING (timestamp // 5000) * 5000 + 5000 <= (SELECT w FROM wm)
      |)
      |SELECT windowStartMs,
      |       ROW_NUMBER() OVER (PARTITION BY windowStartMs ORDER BY bidCount DESC, auctionId ASC) AS rk,
      |       auctionId, bidCount, maxPrice
      |FROM s1 QUALIFY rk <= 3
      |""".stripMargin

  /** Streaming SCD2 enrichment — the point-in-time dimension join every
    * production event pipeline runs: each streamed bid picks the dimension
    * VERSION that was valid at its event time (not the latest one), via a
    * stream-static join whose residual is the validity-interval predicate
    *   bid.personId = dim.personId AND valid_from ≤ ts < valid_to.
    *
    * The dimension is built from a batch read of the person generator
    * (same (seed, subtask, eventId) purity as every other dump), whose
    * id space genuinely RE-EMITS each person over time (~9 emissions per
    * personId at sf0.01, each with a new city) — a real change stream.
    * The SCD2 unroll is the standard gaps construction: one version per
    * (personId, emission), valid from that emission's timestamp until
    * the next one (lead() over the per-person timeline), plus a genesis
    * version [0, first emission) with the attribute still 'pending'.
    * Versions partition [0, ∞) per person, so every streamed bid matches
    * EXACTLY one version; bids referencing persons outside the dim fall
    * through the LEFT join as vn −1 — the completeness accounting a real
    * enrichment job reports.
    *
    * Scale shape: STATELESS — no watermark, no state store; the dim
    * broadcasts (a real deployment broadcasts the SCD2 dim or pre-buckets
    * it; either way no per-record state), so throughput is pure join
    * bandwidth. The one subtlety a cluster hits is dim STALENESS on long
    * runs — static-side re-read per micro-batch is not guaranteed by
    * Spark; the entry models the standard deploy-time-snapshot contract.
    * sf0.1 → 1,000,000 streamed bids against a 250,000-emission dim.
    */
  def streamScd2Enrich(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val pRows = math.max(1L, rows / 4)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_scd2_enrich", "bids", cfg, rows)
    dumpInput(spark, dir, "stream_scd2_enrich", "persons", cfg, pRows)
    // one change event per (personId, timestamp): ties across subtasks
    // collapse deterministically (MAX city)
    val pev = spark.read.format("nexmark")
      .options(NexmarkSources.nexmarkOptions("persons", cfg, Parallelism, pRows,
        rowsPerBatchFor(pRows)))
      .load()
      .groupBy(col("personId"), col("timestamp").as("created"))
      .agg(max(col("city")).as("city"))
    val w = Window.partitionBy(col("personId")).orderBy(col("created").asc)
    val vers = pev
      .withColumn("vn", row_number().over(w))
      .withColumn("valid_to",
        coalesce(lead(col("created"), 1).over(w), lit(Long.MaxValue)))
      .select(col("personId"), col("created").as("valid_from"),
        col("valid_to"), col("vn"), col("city"))
    val genesis = pev.groupBy(col("personId"))
      .agg(min(col("created")).as("valid_to"))
      .select(col("personId"), lit(0L).as("valid_from"), col("valid_to"),
        lit(0).as("vn"), lit("pending").as("city"))
    val dim = genesis.unionByName(vers)
    val b = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows,
      rowsPerBatchFor(rows)).toDF
    val enriched = b
      .join(broadcast(dim),
        b("personId") === dim("personId") &&
          b("timestamp") >= dim("valid_from") &&
          b("timestamp") < dim("valid_to"),
        "left")
      .select(b("auctionId"), b("personId"), b("timestamp"), b("bid"),
        coalesce(dim("vn"), lit(-1)).as("vn"),
        coalesce(dim("city"), lit("")).as("city"))
    runToParquet(spark, enriched, "scd2enrich", expectedBatches(rows))
  }

  /** Mirror join over the dumped bids and persons: the same SCD2 unroll
    * (per-person lead() timeline + genesis row), the same interval
    * predicate. Stateless ⇒ no watermark model needed — every input bid
    * appears exactly once.
    */
  private val streamScd2EnrichSql: String =
    s"""WITH pev AS (
      |  SELECT personId, timestamp AS created, MAX(city) AS city
      |  FROM ${inPath("stream_scd2_enrich", "persons")}
      |  GROUP BY personId, timestamp
      |), vers AS (
      |  SELECT personId, created AS valid_from,
      |         COALESCE(LEAD(created, 1) OVER (PARTITION BY personId
      |                  ORDER BY created ASC), ${Long.MaxValue}) AS valid_to,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY personId
      |                  ORDER BY created ASC) AS INT) AS vn,
      |         city
      |  FROM pev
      |), genesis AS (
      |  SELECT personId, 0 AS valid_from, MIN(created) AS valid_to,
      |         0 AS vn, 'pending' AS city
      |  FROM pev GROUP BY personId
      |), dim AS (
      |  SELECT * FROM genesis UNION ALL SELECT * FROM vers
      |), b AS (SELECT * FROM ${inPath("stream_scd2_enrich", "bids")})
      |SELECT b.auctionId, b.personId, b.timestamp, b.bid,
      |       COALESCE(dim.vn, -1) AS vn,
      |       COALESCE(dim.city, '') AS city
      |FROM b LEFT JOIN dim
      |  ON b.personId = dim.personId
      | AND b.timestamp >= dim.valid_from AND b.timestamp < dim.valid_to
      |""".stripMargin

  /** Streaming quantile profile — the streaming twin of
    * [[TextPipeline.quantileSketch]]: per 5 s tumbling window, an OCTAVE
    * histogram of the bid price (k = length(bin(cents)), the same pure
    * string-op octave both engines compute identically) aggregated in ONE
    * stateful operator, then P50/P90/P99 read off the finalized
    * histograms with the same integer within-bin interpolation. The
    * histogram IS the state: ≤ ~40 rows per window regardless of volume,
    * so state size is windows × octaves, not events — the
    * profile-as-you-ingest shape a 100 TB feed monitors price/length
    * distributions with (alerting on distribution drift without ever
    * sorting the stream).
    *
    * The quantile extraction runs as a BATCH post-pass over the sink's
    * closed windows (cumulative sum + interpolation over ≤ 40 rows per
    * window) — the standard sketch-serving split: the stream maintains
    * the mergeable summary, the reader derives the percentile view.
    * sf0.1 → 1,000,000 bids.
    */
  def streamQuantileProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    val cfg = GenConfig(eventsPerSecond = 1000L)
    dumpInput(spark, dir, "stream_quantile_profile", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows,
      rowsPerBatchFor(rows))
    val hist = bids.toDF
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "2 seconds")
      .withColumn("k", expr(
        "length(bin(greatest(CAST(ROUND(bid * 100) AS BIGINT), 1)))"))
      .groupBy(window(col("eventTime"), "5 seconds"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("windowStartMs"),
        col("k"), col("cnt"))
    val sink = runToParquet(spark, hist, "qprof", expectedBatches(rows))
    val n = sink.groupBy(col("windowStartMs")).agg(sum(col("cnt")).as("n_bids"))
    val cum = sink
      .withColumn("cum", sum(col("cnt")).over(
        W.partitionBy(col("windowStartMs")).orderBy(col("k").asc)
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("cumb", col("cum") - col("cnt"))
      .join(broadcast(n), "windowStartMs")
    val withRanks = Seq(50, 90, 99).foldLeft(cum) { (df, p) =>
      df.withColumn(s"r$p", expr(s"(n_bids * $p + 99) div 100"))
    }
    val estAggs = Seq(50, 90, 99).map { p =>
      max(expr(
        s"""CASE WHEN cumb < r$p AND cum >= r$p THEN
           |  CAST(pow(2, k - 1) AS BIGINT)
           |  + (r$p - cumb - 1) * CAST(pow(2, k - 1) AS BIGINT) div cnt
           |END""".stripMargin)).as(s"est_p$p")
    }
    withRanks.groupBy(col("windowStartMs"))
      .agg(max(col("n_bids")).as("n_bids"), estAggs: _*)
  }

  /** Octave histogram over the dumped bids per closed tumbling window
    * (end ≤ max(ts) − 2000 — the same final-watermark model as the other
    * window entries), then the identical integer interpolation.
    */
  private val streamQuantileProfileSql: String = {
    val rDefs = Seq(50, 90, 99).map(p => s"(n_bids * $p + 99) // 100 AS r$p")
      .mkString(", ")
    val estCols = Seq(50, 90, 99).map(p =>
      s"""MAX(CASE WHEN cumb < r$p AND cum >= r$p THEN
         |  CAST(pow(2, k - 1) AS BIGINT)
         |  + (r$p - cumb - 1) * CAST(pow(2, k - 1) AS BIGINT) // cnt
         |END) AS est_p$p""".stripMargin).mkString(",\n")
    s"""WITH b AS (SELECT * FROM ${inPath("stream_quantile_profile", "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM b),
      |h AS (
      |  SELECT (timestamp // 5000) * 5000 AS windowStartMs,
      |         length(bin(greatest(CAST(ROUND(bid * 100) AS BIGINT), 1))) AS k,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM b GROUP BY 1, 2
      |), f AS (
      |  SELECT * FROM h WHERE windowStartMs + 5000 <= (SELECT w FROM wm)
      |), c AS (
      |  SELECT windowStartMs, k, cnt,
      |         CAST(SUM(cnt) OVER (PARTITION BY windowStartMs ORDER BY k ASC
      |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM f
      |), n AS (
      |  SELECT windowStartMs, CAST(SUM(cnt) AS BIGINT) AS n_bids
      |  FROM f GROUP BY windowStartMs
      |)
      |SELECT windowStartMs, n_bids,
      |$estCols
      |FROM (SELECT c.*, cum - cnt AS cumb, n_bids, $rDefs
      |      FROM c JOIN n USING (windowStartMs))
      |GROUP BY windowStartMs, n_bids
      |""".stripMargin
  }

  /** `stream_quality_gate`: streaming INGESTION QUALITY GATE — the
    * admission-control stage a production ingest runs AHEAD of the dedup
    * guards: reject low-quality arrivals before paying dedup state for
    * them. Streamed events map to documents (auctionId mod D — the
    * `stream_knn_serve` id idiom), a STATIC quality-scored gate table
    * ([[TextPipeline.qualityGateStatic]]: the batch keep-half policy
    * frozen to per-source thresholds — the batch job decides, the stream
    * applies) is broadcast stream-static joined (STATELESS), and the only
    * stateful stage is ONE watermarked 5 s tumbling aggregation per
    * (window, source): admitted/rejected counts + admitted score mass.
    * State is windows × sources — never events. Every output column is a
    * pure function of (auctionId, timestamp), so arrival races never
    * change a value; emission is the q5 window model (end ≤ final wm).
    * sf0.1 → 1,000,000 streamed events gated by the static battery.
    */
  def streamQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    // 100 events/s: the sf0.001 probe's 1,250 events then span 12.5 s of
    // event time, so whole 5 s windows close beyond the 2 s watermark
    // delay (end ≤ max − 2000 needs span ≥ 7 s) at EVERY fixture scale —
    // at the q5 entries' 1000 eps that probe spans 1.25 s and emits
    // nothing (the stream_knn_serve generator-clock rule)
    val cfg = GenConfig(eventsPerSecond = 100L)
    dumpInput(spark, dir, "stream_quality_gate", "bids", cfg, rows)
    // eager localCheckpoint: a stream-static join re-evaluates its static
    // side every micro-batch; the scoring + threshold windows must be
    // paid once at gate-build time, like the serve entries' index tables
    val gate = TextPipeline.qualityGateStatic(spark, dir).localCheckpoint(true)
    val d = gate.count()
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    runToParquet(spark, qualityGateStream(bids.toDF, gate, d), "qualitygate",
      expectedBatches(rows))
  }

  /** The gate dataflow itself (split out so StreamingMultiBatchSpec can
    * pin 1-batch == 4-batch over its own bounded fixture). */
  private[graft] def qualityGateStream(bids: DataFrame, gate: DataFrame, d: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    bids
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "2 seconds")
      .withColumn("doc_id", pmod(col("auctionId"), lit(d)))
      .join(broadcast(gate), Seq("doc_id"))
      .groupBy(window(col("eventTime"), "5 seconds"), col("source"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("pass")).as("n_pass"),
        sum(lit(1L) - col("pass")).as("n_fail"),
        sum(col("score_scaled") * col("pass")).as("admitted_score_sum"))
      .select(unix_millis(col("window.start")).as("windowStartMs"), col("source"),
        col("n_events"), col("n_pass"), col("n_fail"), col("admitted_score_sum"))
  }

  /** Gate accounting over the dumped events: per (5 s window, source) the
    * admitted/rejected split, windows emitted iff end ≤ final wm = max(ts)
    * − 2000 (the q5 model); pass/threshold recomputed by the SAME CTE
    * chain the batch battery uses ([[TextPipeline.qualityGateStaticSql]]).
    */
  private val streamQualityGateSql: String =
    s"""WITH braw AS (SELECT * FROM ${inPath("stream_quality_gate", "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM braw),
      |${TextPipeline.qualityGateStaticSql}, ev AS (
      |  SELECT timestamp, auctionId % (SELECT COUNT(*) FROM documents) AS doc_id
      |  FROM braw
      |), j AS (
      |  SELECT (timestamp // 5000) * 5000 AS windowStartMs, g.source, g.pass, g.score_scaled
      |  FROM ev JOIN gate g USING (doc_id)
      |)
      |SELECT windowStartMs, source,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(pass) AS BIGINT) AS n_pass,
      |       CAST(SUM(1 - pass) AS BIGINT) AS n_fail,
      |       CAST(SUM(score_scaled * pass) AS BIGINT) AS admitted_score_sum
      |FROM j GROUP BY 1, 2
      |HAVING windowStartMs + 5000 <= (SELECT w FROM wm)
      |""".stripMargin

  /** Streaming ANN SERVING — the online twin of the batch `s_knn_serve`:
    * a query stream (each admitted bid event becomes a vector query via
    * qv = auctionId mod V) served from the STATIC IVF index the batch
    * entries build, with per-event top-[[Similarity.TopK]] ranking done
    * in-stream.
    *
    * Dataflow: (1) watermarked exact dedup on (auctionId, eventTime) —
    * the at-least-once guard, same bounded-state argument as
    * `stream_incremental_dedup`; (2) THREE stream-static joins against
    * the index statics ([[Similarity.ivfServeStatics]], each
    * localCheckpointed once — query-vector lookup, probe map, posting
    * cells with embeddings; all broadcast here, bucketed Exchange-free
    * probes at 100 TB exactly like the persisted batch serve); (3) one
    * codegen'd cosine per (event, candidate) — stateless; (4) per-event
    * top-k via a watermarked aggregation keyed by (eventTime,
    * auctionId, qv) whose state is bounded by the probe's candidate
    * count (~NProbe cells) per in-flight event, evicted as the
    * watermark passes. Every output column is a pure function of
    * (auctionId, timestamp), so arrival races never change a value; the
    * final-watermark cutoff (events with eventTime ≥ max − 2 s never
    * finalize) is the q5/topk oracle model.
    *
    * sf0.1 → 100,000 streamed queries × ~75 scored candidates each
    * against the 2,000-vector index.
    */
  def streamKnnServe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Query volume scales with SF up to the bench scale and is CAPPED
    // there: a serving tier's query RATE is a deployment constant while
    // the CORPUS is the scale variable, and the fixture's pinned 80-cell
    // index makes per-query scan grow ∝ corpus — an uncapped query count
    // would make total serve work Q×N quadratic in SF (the r10 ScaleUp
    // benchmark-quadratic class; uncapped, the sf1 sweep OOM'd scoring
    // 1M events × ~790 candidates). At sf1 the capped entry measures the
    // honest serving question: constant 100k-query load against a 10×
    // corpus = 10× per-query scan.
    val rows = math.max(1L, (1000000L * math.min(sfOf(dir), 0.1) / Parallelism).toLong)
    // 50 events/s (20 ms spacing): the 2 s watermark delay must stay well
    // inside the stream's event-time span at EVERY fixture scale — at the
    // q5 entries' 1000 events/s the sf0.01 gate's 1,250 events span only
    // 1.25 s and the final watermark would drop every event
    val cfg = GenConfig(eventsPerSecond = 50L)
    dumpInput(spark, dir, "stream_knn_serve", "bids", cfg, rows)
    val (qembs, probes, cells, v) = Similarity.ivfServeStatics(spark, dir)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    val served = bids.toDF
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "2 seconds")
      .dropDuplicates("auctionId", "eventTime")
      .withColumn("qv", pmod(col("auctionId"), lit(v)))
      .join(broadcast(qembs), Seq("qv"))
      .join(broadcast(probes), Seq("qv"))
      .join(broadcast(cells), Seq("cid"))
      .filter(col("vec_id") =!= col("qv"))
      .withColumn("cos6", round(call_function("cosine_sim", col("qemb"), col("cemb")), 6))
      .groupBy(col("eventTime"), col("auctionId"), col("qv"))
      .agg(count(lit(1)).as("n_cands"),
        slice(array_sort(collect_list(struct(negate(col("cos6")).as("nc"), col("vec_id")))),
              1, Similarity.TopK).as("top"))
      .select(col("auctionId"), unix_millis(col("eventTime")).as("ts"), col("qv"),
        col("n_cands"), posexplode(col("top")))
      .select(col("auctionId"), col("ts"), col("qv"), col("n_cands"),
        (col("pos") + 1).cast("long").as("rk"),
        col("col.vec_id").as("vec_id"), negate(col("col.nc")).as("cos6"))
    runToParquet(spark, served, "knnserve", expectedBatches(rows))
  }

  /** One row per (distinct admitted query event, rank): the aggregation
    * finalizes exactly the events with eventTime ≤ final wm = max(ts) −
    * 2000 (a raw event-time KEY finalizes at wm ≥ key — one tick earlier
    * than the q5 WINDOW model's end ≤ wm, verified against the engine at
    * sf0.001 where the boundary carries 8 events); qv/candidates/ranks
    * are pure functions of the event key, recomputed by the same IVF CTE
    * chain the batch oracles use over the `embeddings` table.
    */
  private val streamKnnServeSql: String =
    s"""WITH braw AS (SELECT * FROM ${inPath("stream_knn_serve", "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM braw),
      |b AS (
      |  SELECT DISTINCT auctionId, timestamp FROM braw
      |  WHERE timestamp <= (SELECT w FROM wm)
      |), e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      |  WHERE sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) > 0
      |), cent AS (
      |  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id % 25 = 0
      |), sims AS (
      |  SELECT e.vec_id, cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_cosine_similarity(cemb, emb) DESC NULLS LAST, cid ASC) AS crk
      |  FROM e, cent
      |), assign AS (
      |  SELECT vec_id, cid FROM sims WHERE crk = 1
      |), probes AS (
      |  SELECT vec_id AS qv, cid FROM sims WHERE crk <= ${Similarity.NProbe}
      |), ev AS (
      |  SELECT auctionId, timestamp AS ts,
      |         auctionId % (SELECT COUNT(*) FROM embeddings) AS qv
      |  FROM b
      |), qvs AS MATERIALIZED (
      |  -- score per DISTINCT query vector, not per event: candidates and
      |  -- ranks are pure functions of qv, and event-granular scoring at
      |  -- sf1 materializes ~75M rows x two 64-double lists (a spill cliff)
      |  SELECT DISTINCT qv FROM ev
      |), scored AS MATERIALIZED (
      |  SELECT q.qv, a.vec_id,
      |         ROUND(list_cosine_similarity(qe.emb, ce.emb), 6) AS cos6
      |  FROM qvs q JOIN e qe ON qe.vec_id = q.qv
      |          JOIN probes p ON p.qv = q.qv
      |          JOIN assign a ON a.cid = p.cid AND a.vec_id <> q.qv
      |          JOIN e ce ON ce.vec_id = a.vec_id
      |), ranked AS MATERIALIZED (
      |  SELECT qv,
      |         CAST(COUNT(*) OVER (PARTITION BY qv) AS BIGINT) AS n_cands,
      |         ROW_NUMBER() OVER (PARTITION BY qv
      |                            ORDER BY cos6 DESC NULLS LAST, vec_id ASC) AS rk,
      |         vec_id, cos6
      |  FROM scored QUALIFY rk <= ${Similarity.TopK}
      |)
      |SELECT ev.auctionId, ev.ts, ev.qv, r.n_cands, r.rk, r.vec_id, r.cos6
      |FROM ev JOIN ranked r ON r.qv = ev.qv
      |""".stripMargin

  /** Streaming CDC APPLY — the streaming twin of the batch
    * `r_upsert_apply`: a sequenced change stream (key = auctionId, seq =
    * event time, op = delete when personId ≡ 0 (mod 10) else upsert — a
    * pure function of the event, so both engines derive identical ops)
    * applied continuously with LAST-WRITE-WINS per key, then materialized
    * as a snapshot.
    *
    * Two stages, the production change-data architecture:
    *   1. STREAMING COMPACTION: one watermarked 5 s tumbling aggregation
    *      per (window, key) — the newest change (total order (seq, bid,
    *      bidder, bidId); full ties carry identical payloads since op is
    *      a function of the key ordering fields, so races can't change a
    *      value) plus the change count. This is the per-commit-window
    *      change-log compaction every CDC ingest (Delta/Hudi-style) runs:
    *      state is (windows × keys-in-horizon), evicted by the watermark
    *      — NEVER proportional to the key universe, which is what makes
    *      continuous apply feasible at 100 TB. An emit-on-quiet
    *      fGWS/timer formulation was considered and rejected: its output
    *      granularity depends on WHERE batch boundaries fall (a key
    *      quiet in batch k emits, then re-emits when it reappears), so no
    *      engine-independent oracle can pin it — the windowed compaction
    *      is batching-invariant under monotone event time
    *      (StreamingMultiBatchSpec pins 1-batch == 4-batch).
    *   2. SNAPSHOT SERVE: a batch post-pass over the sink's closed
    *      windows — per key the newest compacted row wins; a final
    *      `delete` leaves the key dead (live = 0, the tombstone a real
    *      snapshot reader filters). n_versions counts the key's closed
    *      change windows — the compaction-debt metric a store tracks.
    *
    * sf0.1 → 1,000,000 changes; hot-auction skew makes keys genuinely
    * multi-version. Output = one row per key with a closed change window.
    */
  def streamUpsertApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val rows = math.max(1L, (10000000L * sfOf(dir) / Parallelism).toLong)
    // 100 events/s (the stream_quality_gate generator-clock rule): the
    // sf0.001 probe's 1,250 events then span 12.5 s of event time, so
    // whole 5 s windows close beyond the 2 s watermark delay at EVERY
    // fixture scale — at 1000 eps that probe spans 1.25 s and emits nothing
    val cfg = GenConfig(eventsPerSecond = 100L)
    dumpInput(spark, dir, "stream_upsert_apply", "bids", cfg, rows)
    val bids = NexmarkSources.bidStreamDsv2(spark, cfg, Parallelism, rows, rowsPerBatchFor(rows))
    val sink = runToParquet(spark, upsertCompact(bids.toDF), "upsertapply",
      expectedBatches(rows))
    val w = W.partitionBy(col("auctionId"))
    sink
      .withColumn("n_versions", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(w.orderBy(col("windowStartMs").desc)))
      .filter(col("rk") === 1)
      .select(col("auctionId"), col("n_versions"), col("seq").as("last_ts"),
        col("bid"), col("bidder"),
        (col("op") =!= "delete").cast("int").as("live"))
  }

  /** Stage-1 dataflow (split out so StreamingMultiBatchSpec can pin
    * 1-batch == 4-batch): windowed per-key change-log compaction. */
  private[graft] def upsertCompact(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    changes
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "2 seconds")
      .withColumn("op",
        when(pmod(col("personId"), lit(10)) === 0, lit("delete")).otherwise(lit("upsert")))
      .groupBy(window(col("eventTime"), "5 seconds"), col("auctionId"))
      .agg(count(lit(1)).as("n_changes"),
        max(col("timestamp")).as("seq"),
        max_by(struct(col("op"), col("bid"), col("personId").as("bidder")),
               struct(col("timestamp"), col("bid"), col("personId"), col("bidId"))).as("last"))
      .select(unix_millis(col("window.start")).as("windowStartMs"), col("auctionId"),
        col("n_changes"), col("seq"), col("last.op").as("op"),
        col("last.bid").as("bid"), col("last.bidder").as("bidder"))
  }

  /** Snapshot over the dumped changes: closed windows (end ≤ final wm =
    * max(ts) − 2000 — the q5 model), per (window, key) the newest change
    * under the identical total order, per key the newest window's row.
    */
  private val streamUpsertApplySql: String =
    s"""WITH b AS (SELECT * FROM ${inPath("stream_upsert_apply", "bids")}),
      |wm AS (SELECT MAX(timestamp) - 2000 AS w FROM b),
      |cw AS (
      |  SELECT (timestamp // 5000) * 5000 AS wms, auctionId, timestamp, bid,
      |         personId, bidId,
      |         CASE WHEN personId % 10 = 0 THEN 'delete' ELSE 'upsert' END AS op
      |  FROM b
      |  WHERE (timestamp // 5000) * 5000 + 5000 <= (SELECT w FROM wm)
      |), comp AS (
      |  SELECT wms, auctionId,
      |         CAST(COUNT(*) OVER (PARTITION BY wms, auctionId) AS BIGINT) AS n_changes,
      |         MAX(timestamp) OVER (PARTITION BY wms, auctionId) AS seq,
      |         op, bid, personId AS bidder,
      |         ROW_NUMBER() OVER (PARTITION BY wms, auctionId
      |                            ORDER BY timestamp DESC, bid DESC, personId DESC, bidId DESC) AS rn
      |  FROM cw QUALIFY rn = 1
      |), snap AS (
      |  SELECT auctionId,
      |         CAST(COUNT(*) OVER (PARTITION BY auctionId) AS BIGINT) AS n_versions,
      |         seq AS last_ts, bid, bidder, op,
      |         ROW_NUMBER() OVER (PARTITION BY auctionId ORDER BY wms DESC) AS krn
      |  FROM comp
      |)
      |SELECT auctionId, n_versions, last_ts, bid, bidder,
      |       CAST(op <> 'delete' AS INT) AS live
      |FROM snap WHERE krn = 1
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_q5_hot" -> (streamQ5Hot _),
    "stream_q8_join" -> (streamQ8Join _),
    "stream_qx_winning" -> (streamQxWinning _),
    "stream_qx_tws" -> (streamQxTws _),
    "stream_q11_sessions" -> (streamQ11Sessions _),
    "stream_q11_tws" -> (streamQ11Tws _),
    "stream_q7_highest" -> (streamQ7Highest _),
    "stream_dedup" -> (streamDedup _),
    "stream_incremental_dedup" -> (streamIncrementalDedup _),
    "stream_funnel" -> (streamFunnel _),
    "stream_interval_join" -> (streamIntervalJoin _),
    "stream_outer_join" -> (streamOuterJoin _),
    "stream_topk" -> (streamTopK _),
    "stream_scd2_enrich" -> (streamScd2Enrich _),
    "stream_quantile_profile" -> (streamQuantileProfile _),
    "stream_incremental_neardup" -> (streamIncrementalNearDup _),
    "stream_knn_serve" -> (streamKnnServe _),
    "stream_quality_gate" -> (streamQualityGate _),
    "stream_upsert_apply" -> (streamUpsertApply _),
  )

  /** DuckDB oracles over each entry's dumped input events (see the class
    * doc): exact at the correctness gate's sf0.01 single-micro-batch scale.
    */
  val oracles: Map[String, String] = Map(
    "stream_q5_hot" -> streamQ5HotSql,
    "stream_q8_join" -> streamQ8JoinSql,
    "stream_qx_winning" -> qxTimerSql("stream_qx_winning", maxEnd = true),
    "stream_qx_tws" -> qxTimerSql("stream_qx_tws", maxEnd = false),
    "stream_q11_sessions" -> sessionsOracleSql("stream_q11_sessions"),
    "stream_q11_tws" -> sessionsOracleSql("stream_q11_tws"),
    "stream_q7_highest" -> streamQ7HighestSql,
    "stream_dedup" -> streamDedupSql,
    "stream_incremental_dedup" -> streamIncrementalDedupSql,
    "stream_funnel" -> streamFunnelSql,
    "stream_interval_join" -> streamIntervalJoinSql,
    "stream_outer_join" -> streamOuterJoinSql,
    "stream_topk" -> streamTopKSql,
    "stream_scd2_enrich" -> streamScd2EnrichSql,
    "stream_quantile_profile" -> streamQuantileProfileSql,
    "stream_incremental_neardup" -> streamIncrementalNearDupSql,
    "stream_knn_serve" -> streamKnnServeSql,
    "stream_quality_gate" -> streamQualityGateSql,
    "stream_upsert_apply" -> streamUpsertApplySql,
  )
}
