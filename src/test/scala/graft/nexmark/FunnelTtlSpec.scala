package graft.nexmark

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.nexmark.queries.NexmarkStateful

/** Tombstone-TTL mode of [[NexmarkStateful.funnelStateful]] (VERDICT r8
  * Next #3): with `tombstoneTtlMs` set, an emitted funnel's `done`
  * tombstone is retired by a second event-time timer, so steady-state
  * state holds at most ~one conversion-window wave of keys — while the
  * emitted rows are IDENTICAL to the retain-forever default (TTL changes
  * retention, never results; the J1 `stateTtlMs` contract).
  *
  * Also pins the r9 state-hygiene fix: keys seen only in auction/bid
  * events (never a signup) create no state at all, so neither run's
  * footprint includes the pure-noise keys.
  */
class FunnelTtlSpec extends SparkSpec {

  private val W = 1000L // conversion window
  private val WaveKeys = 50
  private val WaveGap = 100000L // event-time gap between waves: >> W + TTL + 2s delay

  // wave w (1-based): signup at base, listing at base+10, sale-bid at
  // base+20 — every key converts to stage 3 inside [base, base+W)
  private def base(w: Int): Long = w * WaveGap
  private def pids(w: Int): Seq[Long] = (0 until WaveKeys).map(i => w * 1000L + i)
  private def personsOf(w: Int): Seq[Person] =
    pids(w).map(p => Person(base(w), p, "n", "e", "c", "c", "p", "z", "h", "cc", base(w)))
  private def auctionsOf(w: Int): Seq[Auction] =
    pids(w).map(p => Auction(base(w) + 10, p + 7000000L, p, 1L, 1.0, base(w), base(w) + 9999, 1L, "a", "d", base(w)))
  private def bidsOf(w: Int): Seq[Bid] =
    pids(w).map(p => Bid(base(w) + 20, base(w) + 20, p + 7000000L, p, -1L, 1.0))
  // noise keys: auction/bid traffic for person ids that never sign up —
  // must never materialize state (r9 hygiene fix)
  private def noiseAuctions(w: Int): Seq[Auction] =
    (0 until WaveKeys).map(i => Auction(base(w) + 11, i + 8000000L, w * 1000L + i + 500000L, 1L, 1.0, base(w), base(w) + 9999, 1L, "a", "d", base(w)))

  private val SentinelTs = 1893456000000L // 2030-01-01

  /** Runs 3 waves + a watermark sentinel through funnelStateful; returns
    * (emitted non-sentinel rows keyed by pid, final state row count). */
  private def run(ttl: Option[Long]): (Map[Long, (Long, Long, Long, Int)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mp = MemoryStream[Person]
    val ma = MemoryStream[Auction]
    val mb = MemoryStream[Bid]
    val name = s"funnelttl${ttl.isDefined}"
    val q = NexmarkStateful
      .funnelStateful(mp.toDS(), ma.toDS(), mb.toDS(), windowMs = W, tombstoneTtlMs = ttl)
      .toDF.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      for (w <- 1 to 3) {
        mp.addData(personsOf(w))
        ma.addData(auctionsOf(w) ++ noiseAuctions(w))
        mb.addData(bidsOf(w))
        q.processAllAvailable()
      }
      // min-across-streams watermark: every stream needs the sentinel
      mp.addData(Seq(Person(SentinelTs, Long.MaxValue / 2, "s", "s", "s", "s", "s", "s", "s", "s", SentinelTs)))
      ma.addData(Seq(Auction(SentinelTs, 1L, Long.MaxValue / 2, 1L, 1.0, SentinelTs, SentinelTs, 1L, "s", "s", SentinelTs)))
      mb.addData(Seq(Bid(SentinelTs, SentinelTs, 1L, Long.MaxValue / 2, -1L, 1.0)))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .filter(_.getLong(0) < 500000L)
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .toMap
      val state = Option(q.lastProgress)
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
      (rows, state)
    } finally q.stop()
  }

  test("tombstone TTL: output identical to retain-forever; state bounded by one wave") {
    val (withTtl, stateTtl) = run(Some(W))
    val (without, stateForever) = run(None)
    // 1) results are untouched by retention policy
    assert(withTtl == without)
    assert(withTtl.size == 3 * WaveKeys)
    for (w <- 1 to 3; p <- pids(w))
      assert(withTtl(p) == ((base(w), base(w) + 10, base(w) + 20, 3)),
        s"wave $w key $p wrong stages")
    // 2) retain-forever holds every signup key (3 waves + the sentinel
    //    person) — and NOTHING for the 150 no-signup noise keys
    assert(stateForever == 3L * WaveKeys + 1,
      s"retain-forever should hold all ${3 * WaveKeys} signups + sentinel; got $stateForever")
    // 3) TTL retires waves 1-2 (their tombstone timers fired when later
    //    waves advanced the watermark); only the final wave + sentinel may
    //    remain
    assert(stateTtl <= WaveKeys + 1,
      s"TTL state must stay <= one wave (${WaveKeys + 1}); got $stateTtl")
  }
}
