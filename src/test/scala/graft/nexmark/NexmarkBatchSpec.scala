package graft.nexmark

import graft.nexmark.queries.NexmarkQueries

/** Batch-mode correctness for the declarative Nexmark queries: results are
  * cross-checked against straightforward in-memory Scala oracles over the
  * same generated data (independent of Spark's execution).
  */
class NexmarkBatchSpec extends SparkSpec {
  val cfg = GenConfig()
  val HourMs = 3600 * 1000L
  def hourWindow(ts: Long): Long = ts - Math.floorMod(ts, HourMs)

  lazy val bids: Seq[Bid] = NexmarkGen.bids(cfg, 20000).toSeq
  lazy val persons: Seq[Person] = NexmarkGen.persons(cfg, 3000).toSeq
  lazy val auctions: Seq[Auction] = NexmarkGen.auctions(cfg, 8000).toSeq

  def bidsDs = NexmarkSources.bidsDs(spark, cfg, 20000)
  def personsDs = NexmarkSources.personsDs(spark, cfg, 3000)
  def auctionsDs = NexmarkSources.auctionsDs(spark, cfg, 8000)

  test("q5HotAuctions matches the in-memory windowed max/count") {
    val got = NexmarkQueries.q5HotAuctions(bidsDs, "1 hour").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val want = bids.groupBy(b => (hourWindow(b.timestamp), b.auctionId))
      .view.mapValues(bs => (bs.map(_.bid).max, bs.size.toLong)).toMap
    assert(got == want)
  }

  test("q8NewUsers joins persons to same-window auctions with max-ingestion pick") {
    val got = NexmarkQueries.q8NewUsers(personsDs, auctionsDs, "1 hour").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    val pKeys = persons.map(p => (hourWindow(p.timestamp), p.personId)).toSet
    val want = auctions.groupBy(a => (hourWindow(a.timestamp), a.personId))
      .filter { case (k, _) => pKeys.contains(k) }
      .view.mapValues(as => as.map(_.ingestionTimestamp).max).toMap
    assert(got == want)
  }

  test("q8NewUsersSliding assigns each pair to every overlapping window") {
    val got = NexmarkQueries.q8NewUsersSliding(personsDs, auctionsDs, "1 hour", "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val HalfMs = 1800 * 1000L
    def wins(ts: Long): Seq[Long] = {
      val w1 = ts - Math.floorMod(ts, HalfMs)
      Seq(w1, w1 - HalfMs)
    }
    val pKeys = persons.flatMap(p => wins(p.timestamp).map(w => (w, p.personId))).toSet
    val want = auctions.flatMap(a => wins(a.timestamp).map(w => (w, a.personId)))
      .toSet.intersect(pKeys)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q8NewUsersSession joins persons to auctions in shared union sessions") {
    val got = NexmarkQueries.q8NewUsersSession(personsDs, auctionsDs, "60 seconds")
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    // oracle: sessionize the UNION of both streams per person (gap 60s)
    val gapMs = 60000L
    val want = (persons.map(p => (p.personId, p.timestamp, true)) ++
        auctions.map(a => (a.personId, a.timestamp, false)))
      .groupBy(_._1).toSeq.flatMap { case (pid, evs) =>
        val sorted = evs.sortBy(_._2)
        // split into sessions on >= gap
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          case (acc, e) =>
            if (e._2 - acc.last.last._2 >= gapMs) acc :+ Vector(e)
            else acc.init :+ (acc.last :+ e)
        }
        sessions.filter(s => s.exists(_._3) && s.exists(!_._3))
          .map(s => (pid, s.head._2))
      }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q11BidderActivity counts bids per active (window, person)") {
    val got = NexmarkQueries.q11BidderActivity(personsDs, bidsDs, "1 hour").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pKeys = persons.map(p => (hourWindow(p.timestamp), p.personId)).toSet
    val want = bids.groupBy(b => (hourWindow(b.timestamp), b.personId))
      .filter { case (k, _) => pKeys.contains(k) }
      .view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("qxWinningBids picks the interval-contained argmax bid per auction") {
    val got = NexmarkQueries.qxWinningBids(bidsDs, auctionsDs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // auction ids repeat within an epoch (see GenSpec): a bid matches if ANY
    // auction row with its id has a containing [start, end] interval
    val byAuction = auctions.groupBy(_.auctionId)
    val want = bids
      .filter(b => byAuction.getOrElse(b.auctionId, Nil)
        .exists(a => b.timestamp >= a.start && b.timestamp <= a.end))
      .groupBy(_.auctionId)
      .view.mapValues { bs =>
        val w = bs.maxBy(b => (b.bid, b.timestamp, -b.personId))
        (w.personId, w.bid, w.timestamp)
      }.toMap
    assert(got == want)
  }

  test("q7HighestBid finds the global per-window argmax") {
    val got = NexmarkQueries.q7HighestBid(bidsDs, "1 hour").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val want = bids.groupBy(b => hourWindow(b.timestamp))
      .view.mapValues(_.map(_.bid).max).toMap
    assert(got == want)
  }

  test("sessions merge bids within the gap per bidder") {
    // gap larger than the generated inter-event spacing → per-person session
    // count equals the number of >gap gaps + 1
    val got = NexmarkQueries.sessions(bidsDs, "60 seconds").collect()
      .map(r => (r.getLong(2), r.getLong(0), r.getLong(3)))
    val gapMs = 60000L
    val want = bids.groupBy(_.personId).view.mapValues { bs =>
      val ts = bs.map(_.timestamp).sorted
      // session count = 1 + #gaps >= gapMs (session_window close semantics)
      1 + ts.zip(ts.tail).count { case (a, b) => b - a >= gapMs }
    }.toMap
    val gotCounts = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(gotCounts == want)
    // per-session bid counts must sum to total bids per person
    val sums = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(sums == bids.groupBy(_.personId).view.mapValues(_.size.toLong).toMap)
  }

  test("cmWindowedSum aggregates cpu per job per 2s window") {
    import spark.implicits._
    val recs = (0 until 5000).map { i =>
      CmRecord(1704067200000L + i * 37L, i % 7L, i.toLong, i % 13L,
        0, i % 3, 1, 2, (i % 10) / 10.0f, 0.5f, 0.25f)
    }
    val got = NexmarkQueries.cmWindowedSum(spark.createDataset(recs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (math.rint(r.getDouble(2) * 1e9) / 1e9, r.getLong(3))).toMap
    val want = recs.groupBy(r => (r.timestamp - Math.floorMod(r.timestamp, 2000L), r.jobId))
      .view.mapValues { rs =>
        val s = rs.foldLeft(0.0)((acc, r) => acc + r.cpu.toDouble)
        (math.rint(s * 1e9) / 1e9, rs.size.toLong)
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (s, n)) =>
      assert(n == want(k)._2)
      assert(math.abs(s - want(k)._1) < 1e-6, s"cpu sum mismatch at $k")
    }
  }

  test("bidsFromEvents filters the 4-in-9 bid share of the unified stream") {
    import spark.implicits._
    val c = cfg // local copy: the lambda must not capture the spec class
    val events = spark.range(9000).map(NexmarkGen.event(c, _))
    val key = (b: Bid) => (b.timestamp, b.auctionId, b.personId, b.bid)
    val b = NexmarkQueries.bidsFromEvents(events).collect().toSeq.sortBy(key)
    assert(b.length == 4000)
    val want = NexmarkGen.events(cfg, 9000)
      .filter(_.eventType == Event.BidType).map(_.bid.get).toSeq.sortBy(key)
    assert(b == want)
  }

  test("CmRecord.parse follows the positional whitespace format") {
    val r = CmRecord.parse("123 7 42 9   1 2 3 4  0.5 0.25 0.125")
    assert(r == CmRecord(123L, 7L, 42L, 9L, 1, 2, 3, 4, 0.5f, 0.25f, 0.125f))
  }
}
