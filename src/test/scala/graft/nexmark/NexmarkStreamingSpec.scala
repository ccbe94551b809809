package graft.nexmark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.nexmark.queries.{NexmarkQueries, NexmarkStateful}

/** Structured Streaming correctness: each topology runs on a MemoryStream
  * (micro-batched, watermarked, append-mode — the real streaming engine,
  * state store included) and its final output is compared to the batch
  * flavor / an in-memory oracle over the same data.
  *
  * Watermark mechanics: a far-future sentinel advances the watermark so all
  * real windows close; sentinel-keyed output is filtered out of assertions.
  */
class NexmarkStreamingSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  val cfg = GenConfig()
  val SentinelTs = 1893456000000L // 2030-01-01, far beyond generated data
  val SentinelKey = Long.MaxValue / 2

  private var nameCounter = 0
  def runToCompletion[T](stream: MemoryStream[T], batches: Seq[Seq[T]],
                         result: DataFrame): Seq[org.apache.spark.sql.Row] = {
    nameCounter += 1
    val name = s"memsink$nameCounter"
    val q: StreamingQuery = result.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally {
      q.processAllAvailable()
      q.stop()
    }
    spark.table(name).collect().toSeq
  }

  test("streaming q5 == batch q5 once the watermark closes the windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bids = NexmarkGen.bids(cfg, 5000).toSeq
    val sentinel = Bid(SentinelTs, SentinelTs, SentinelKey, 1L, -1L, 1.0)
    val ms = MemoryStream[Bid]
    val out = runToCompletion(ms, bids.grouped(1000).toSeq :+ Seq(sentinel),
      NexmarkQueries.q5HotAuctions(ms.toDS(), "1 hour"))
    val got = out.filter(_.getLong(1) != SentinelKey)
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val batch = NexmarkQueries.q5HotAuctions(
        NexmarkSources.bidsDs(spark, cfg, 5000), "1 hour").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stateful q5 port flushes each auction exactly once on its timer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bids = NexmarkGen.bids(cfg, 3000).toSeq
    val sentinel = Bid(SentinelTs, SentinelTs, SentinelKey, 1L, -1L, 1.0)
    val sentinel2 = Bid(SentinelTs + 60000, SentinelTs + 60000, SentinelKey + 1, 1L, -1L, 1.0)
    val ms = MemoryStream[Bid]
    val out = runToCompletion(ms,
      Seq(bids, Seq(sentinel), Seq(sentinel2)),
      NexmarkStateful.q5Stateful(ms.toDS(), windowDurationMs = 10000L).toDF)
    val got = out.filter(r => r.getLong(0) < SentinelKey)
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val want = bids.groupBy(_.auctionId)
      .view.mapValues(bs => (bs.map(_.bid).max, bs.size.toLong)).toMap
    assert(got == want)
    // exactly-once flush: no duplicate auction rows
    assert(out.count(r => r.getLong(0) < SentinelKey) == want.size)
  }

  test("streaming sliding-window q5 (dur/2 slide) matches batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bids = NexmarkGen.bids(cfg, 4000).toSeq
    val sentinel = Bid(SentinelTs, SentinelTs, SentinelKey, 1L, -1L, 1.0)
    val ms = MemoryStream[Bid]
    val out = runToCompletion(ms, bids.grouped(1500).toSeq :+ Seq(sentinel),
      NexmarkQueries.q5HotAuctionsSliding(ms.toDS(), "1 hour", "30 minutes"))
    val got = out.filter(_.getLong(1) != SentinelKey)
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val batch = NexmarkQueries.q5HotAuctionsSliding(
        spark.createDataset(bids), "1 hour", "30 minutes").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got == batch)
    // every (window, auction) appears in exactly two overlapping windows
    val perAuction = got.keySet.groupBy(_._2).view.mapValues(_.size)
    assert(perAuction.values.forall(_ >= 1))
    assert(got.nonEmpty)
  }

  test("q5b processing-time timer port flushes after wall-clock inactivity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bids = NexmarkGen.bids(cfg, 1000).toSeq
    val ms = MemoryStream[Bid]
    nameCounter += 1
    val name = s"memsink$nameCounter"
    val q = NexmarkStateful.q5bStateful(ms.toDS(), flushIntervalMs = 100L).toDF
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(bids)
      // NOTE: no processAllAvailable here — with ProcessingTimeTimeout the
      // engine keeps scheduling timer batches, so `noNewData` never latches
      // and processAllAvailable livelocks (observed via jstack). Poll the
      // sink instead; timers fire on the engine's own no-data batches.
      val expected = bids.map(_.auctionId).distinct.size
      var tries = 0
      while (spark.table(name).count() < expected && tries < 150) {
        Thread.sleep(200)
        tries += 1
      }
    } finally q.stop()
    val got = spark.table(name).collect()
      .filter(_.getLong(0) < SentinelKey)
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val want = bids.groupBy(_.auctionId)
      .view.mapValues(bs => (bs.map(_.bid).max, bs.size.toLong)).toMap
    assert(got == want)
  }

  test("joinUdfStateful TTL mode bounds state under rotating keys; outputs unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 3 waves of 200 NEVER-REPEATING person keys: the retain-forever
    // default would hold 600 state rows at the end; the idle TTL must
    // expire earlier waves (only reachable keys stay), so the final state
    // footprint is bounded by ~one wave, not by total key cardinality
    def wave(from: Long): Seq[NexmarkStateful.PA] =
      (from until from + 200L).map(k =>
        NexmarkStateful.PA(k, isPerson = true, 1000L + k, 1000L + k))
    val ms = MemoryStream[NexmarkStateful.PA]
    nameCounter += 1
    val name = s"memsink$nameCounter"
    val q = NexmarkStateful.joinUdfStateful(ms.toDS(), stateTtlMs = Some(200L)).toDF
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // poll the sink, not processAllAvailable — ProcessingTimeTimeout keeps
      // scheduling timer batches and processAllAvailable livelocks (see the
      // q5b test note)
      def waitFor(n: Long): Unit = {
        var tries = 0
        while (spark.table(name).count() < n && tries < 150) { Thread.sleep(200); tries += 1 }
        assert(spark.table(name).count() == n, s"expected $n outputs")
      }
      ms.addData(wave(1L)); waitFor(200)
      Thread.sleep(500) // > TTL: wave 1 goes idle past its timeout
      ms.addData(wave(201L)); waitFor(400)
      Thread.sleep(500)
      ms.addData(wave(401L)); waitFor(600)
      // timer batches run on the engine's own schedule; poll the reported
      // state size until the expired waves are gone
      def stateRows: Long = Option(q.lastProgress)
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal).getOrElse(Long.MaxValue)
      var tries = 0
      while (stateRows > 400 && tries < 150) { Thread.sleep(200); tries += 1 }
      assert(stateRows <= 400,
        s"TTL must bound state below total key cardinality (600); got $stateRows")
      // every person element still emitted exactly one output — the TTL
      // changes retention, never results
      assert(spark.table(name).count() == 600)
    } finally q.stop()
  }

  test("stateful q8 join emits one output per person and keeps latest person state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // subtask 1 stride keeps every personId > 0 — the reference's sign trick
    // (negative ids mark auction probes) is ambiguous for id 0
    val strided = GenConfig(subtask = 1, parallelism = 50)
    val persons = NexmarkGen.persons(strided, 500).toSeq
    val auctions = NexmarkGen.auctions(strided, 2000).toSeq
    val pa = persons.map(p => NexmarkStateful.PA(p.personId, isPerson = true, p.timestamp, p.ingestionTimestamp)) ++
      auctions.map(a => NexmarkStateful.PA(a.personId, isPerson = false, a.timestamp, a.ingestionTimestamp))
    val ms = MemoryStream[NexmarkStateful.PA]
    val out = runToCompletion(ms, pa.grouped(700).toSeq,
      NexmarkStateful.joinUdfStateful(ms.toDS(), sampleEvery = 500L).toDF)
    // one output per person element (NexmarkQuery8.java:612-633)
    val personOutputs = out.filter(_.getLong(5) > 0)
    assert(personOutputs.size == persons.size)
    // sampled auction probes: negative ids, one per 500 auctions counted
    // across ALL keys (the reference's counter is a per-subtask operator
    // field, NexmarkQuery8.java:610,635 — not keyed state)
    val probes = out.filter(_.getLong(5) < 0)
    assert(probes.size == auctions.size / 500)
  }

  test("stateful qx winning bid matches the declarative interval-join argmax") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // craft auctions + bids strictly inside their auction's [start, end]
    val auctions = NexmarkGen.auctions(cfg, 300).toSeq
      .groupBy(_.auctionId).map(_._2.head).toSeq // unique auction ids
    val bids = auctions.zipWithIndex.flatMap { case (a, i) =>
      (0 until 5).map { j =>
        Bid(a.start + j, a.start + j, a.auctionId, 1000L + (i * 5 + j) % 97,
            -1L, ((i * 31 + j * 7) % 1000).toDouble)
      }
    }
    val sentinelAuction = auctions.head.copy(
      auctionId = SentinelKey, timestamp = SentinelTs, start = SentinelTs,
      end = SentinelTs + 1000)
    val sentinelAuction2 = auctions.head.copy(
      auctionId = SentinelKey + 1, timestamp = SentinelTs + 120000,
      start = SentinelTs + 120000, end = SentinelTs + 121000)
    val msB = MemoryStream[Bid]
    val msA = MemoryStream[Auction]
    val result = NexmarkStateful.qxStateful(msB.toDS(), msA.toDS()).toDF
    nameCounter += 1
    val name = s"memsink$nameCounter"
    val q = result.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      msA.addData(auctions); msB.addData(bids); q.processAllAvailable()
      msA.addData(Seq(sentinelAuction)); q.processAllAvailable()
      msA.addData(Seq(sentinelAuction2)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect()
      .filter(_.getLong(0) < SentinelKey)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = NexmarkQueries.qxWinningBids(
        spark.createDataset(bids), spark.createDataset(auctions)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("QX backup processing-time timer resolves an auction whose watermark stalls") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    // event-time end so far out the watermark never reaches it: only the
    // wall-clock failsafe (reference +4 h proc-time timer) can resolve
    val farEnd = base + 100L * 24 * 3600 * 1000
    val auction = Auction(timestamp = base, auctionId = 7L, personId = 1L,
      itemId = 1L, initialPrice = 10.0, start = base, end = farEnd,
      categoryId = 1L, name = "a", descr = "d", ingestionTimestamp = base)
    val winning = Bid(base, base + 1000L, 7L, 42L, -1L, 500.0)
    val losing = Bid(base, base + 2000L, 7L, 43L, -1L, 100.0)
    var clock = base
    val msB = MemoryStream[Bid]
    val msA = MemoryStream[Auction]
    val result = NexmarkStateful.qxStateful(msB.toDS(), msA.toDS(),
      backupTimeoutMs = 60000L, now = () => clock).toDF
    nameCounter += 1
    val name = s"memsink$nameCounter"
    val q = result.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      msA.addData(Seq(auction)); msB.addData(Seq(winning)); q.processAllAvailable()
      assert(spark.table(name).isEmpty,
        "event-time timer at auction.end must not have fired")
      clock = base + 61000L // wall clock passes the backup deadline
      msB.addData(Seq(losing)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
    assert(rows.length == 1, "backup path must resolve the auction exactly once")
    assert(rows(0).getLong(0) == 7L && rows(0).getLong(1) == 42L &&
      rows(0).getDouble(2) == 500.0)
  }

  test("allowedLateness flavor keeps late events a plain session window drops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    def bid(ts: Long, person: Long) = Bid(ts, ts, 1L, person, -1L, 10.0)
    // A session row is late once its window END (ts + gap) is behind the
    // watermark. Batch 1's person-43 bid pushes the watermark to
    // base+68 s, so the batch-2 event (session end base+61 s) is late by
    // 7 s — inside the 15 s allowedLateness, beyond the plain watermark.
    // Batch 3 is the far-future sentinel closing every session.
    val batches = Seq(
      Seq(bid(base, 42L), bid(base + 5000, 42L), bid(base + 10000, 42L),
          bid(base + 70000, 43L)),
      Seq(bid(base + 1000, 42L)),
      Seq(bid(SentinelTs, SentinelKey)))
    def run(withLateness: Boolean): Map[Long, Long] = {
      val ms = MemoryStream[Bid]
      val q = if (withLateness)
        NexmarkQueries.sessionsWithLateness(ms.toDS(), "60 seconds", "15 seconds")
      else NexmarkQueries.sessions(ms.toDS(), "60 seconds")
      runToCompletion(ms, batches, q)
        .filter(_.getLong(2) != SentinelKey)
        .map(r => r.getLong(2) -> r.getLong(3)).toMap
    }
    assert(run(withLateness = false) == Map(42L -> 3L, 43L -> 1L),
      "without lateness the late bid is dropped")
    assert(run(withLateness = true) == Map(42L -> 4L, 43L -> 1L),
      "within allowedLateness the late bid joins its session")
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bids = NexmarkGen.bids(cfg, 1000).toSeq
    val withDups = bids ++ bids.take(300) // replay 300 duplicates
    val ms = MemoryStream[Bid]
    val out = runToCompletion(ms, withDups.grouped(400).toSeq,
      NexmarkQueries.dedupBids(ms.toDS()).toDF)
    val key = (b: Bid) => (b.timestamp, b.auctionId, b.personId, b.bid)
    assert(out.size == bids.size)
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))
      .toSet.size == bids.map(b => (b.timestamp, b.auctionId, b.personId, b.bid)).toSet.size)
  }

  test("streaming session windows close and match batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bids = NexmarkGen.bids(cfg, 3000).toSeq
    val sentinel = Bid(SentinelTs, SentinelTs, 1L, SentinelKey, -1L, 1.0)
    val ms = MemoryStream[Bid]
    val out = runToCompletion(ms, bids.grouped(1000).toSeq :+ Seq(sentinel),
      NexmarkQueries.sessions(ms.toDS(), "60 seconds"))
    val got = out.filter(_.getLong(2) != SentinelKey)
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val batch = NexmarkQueries.sessions(spark.createDataset(bids), "60 seconds")
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got == batch)
    assert(got.nonEmpty)
  }
}
