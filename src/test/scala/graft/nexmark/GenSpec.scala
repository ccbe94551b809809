package graft.nexmark

import org.scalatest.funsuite.AnyFunSuite

class GenSpec extends AnyFunSuite {
  val cfg = GenConfig()

  test("generator is a pure function of (config, eventId)") {
    val a = NexmarkGen.events(cfg, 1000).toSeq
    val b = NexmarkGen.events(cfg, 1000).toSeq
    assert(a == b)
    val other = NexmarkGen.events(cfg.copy(seed = 7), 1000).toSeq
    assert(a != other)
  }

  test("event mix is persons:auctions:bids = 1:4:4 per 9-event epoch") {
    val counts = NexmarkGen.events(cfg, 9000).toSeq.groupBy(_.eventType)
      .view.mapValues(_.size).toMap
    assert(counts(Event.PersonType) == 1000)
    assert(counts(Event.AuctionType) == 4000)
    assert(counts(Event.BidType) == 4000)
  }

  test("person ids advance one per epoch (PERSON_EVENT_RATIO=1)") {
    // NexmarkPersonSource.java:40-46: id = epoch * 1 + min(offset, 0)
    assert(NexmarkGen.personId(cfg, 0) == 0)
    assert(NexmarkGen.personId(cfg, 8) == 0)
    assert(NexmarkGen.personId(cfg, 9) == 1)
    assert(NexmarkGen.personId(cfg, 900) == 100)
  }

  test("auction ids advance 4 per epoch, same id within an epoch (AUCTION_EVENT_RATIO=4)") {
    // NexmarkAuctionSource.java:41-51: offset is always forced to
    // AUCTION_EVENT_RATIO-1, so all auction events of an epoch share one id
    // (the reference's actual arithmetic, reproduced faithfully).
    assert(NexmarkGen.auctionId(cfg, 9) == 3)  // offset 0 → epoch-- → 0*4+3
    assert(NexmarkGen.auctionId(cfg, 10) == 7) // epoch 1
    assert(NexmarkGen.auctionId(cfg, 13) == 7) // same epoch → same id
    assert(NexmarkGen.auctionId(cfg, 18) == 7) // epoch 2, offset 0 → epoch 1
    assert(NexmarkGen.auctionId(cfg, 19) == 11)
  }

  test("subtask strides do not collide (NexmarkCommon.java:43-59)") {
    val c0 = GenConfig(subtask = 0, parallelism = 50)
    val c1 = GenConfig(subtask = 1, parallelism = 50)
    val p0 = NexmarkGen.persons(c0, 5000).map(_.personId).toSet
    val p1 = NexmarkGen.persons(c1, 5000).map(_.personId).toSet
    assert(p0.intersect(p1).isEmpty)
    assert(c1.minPersonId == NexmarkGen.MaxPersonId / 50)
    assert(c1.minAuctionId == NexmarkGen.MaxAuctionId / 50)
  }

  test("hot auctions concentrate bids (HOT_AUCTION_RATIO quantization)") {
    val n = 90000
    val auctionIds = NexmarkGen.bids(cfg, n).map(_.auctionId).toSeq
    // hot branch quantizes to multiples of 100 (NexmarkBidSource.java:47-49)
    val hotShare = auctionIds.count(_ % 100 == 0).toDouble / auctionIds.size
    // P(hot) = 14/100 plus uniform mass landing on multiples of 100 (~1%)
    assert(hotShare > 0.10 && hotShare < 0.20, s"hotShare=$hotShare")
  }

  test("bid prices are within [0, 10M) (NexmarkBidSource.java:68)") {
    assert(NexmarkGen.bids(cfg, 10000).forall(b => b.bid >= 0 && b.bid < 10000000))
  }

  test("auction end = timestamp + 10s (NexmarkAuctionSource.java:69)") {
    assert(NexmarkGen.auctions(cfg, 1000).forall(a => a.end == a.timestamp + 10000))
  }

  test("sizedPayloads: person text fields length-match the reference means") {
    val sized = GenConfig(sizedPayloads = true)
    (0L until 200L).foreach { i =>
      val p = NexmarkGen.person(sized, i)
      assert(p.name.length == 14 && p.name.count(_ == ' ') == 1)
      assert(p.name.split(" ").map(_.length).toSeq == Seq(6, 7))
      assert(p.email.length == 9 && p.city.length == 7)
      assert(p.country.length == 9 && p.province.length == 9)
      assert(p.homepage.length == 6)
      assert(p.zipcode == "10587" && p.creditcard == "00000000000")
      // everything non-textual is identical to the default mode
      val d = NexmarkGen.person(GenConfig(), i)
      assert(p.personId == d.personId && p.timestamp == d.timestamp)
    }
    // deterministic: same config -> same payloads
    assert(NexmarkGen.person(sized, 7L) == NexmarkGen.person(sized, 7L))
    // auction payloads were already size-exact (20/200) in both modes
    val a = NexmarkGen.auction(sized, 3L)
    assert(a.name.length == 20 && a.descr.length == 200)
  }

  test("event time is monotone non-decreasing in eventId") {
    val ts = NexmarkGen.events(cfg, 5000).map {
      e => e.eventType match {
        case Event.PersonType => e.person.get.timestamp
        case Event.AuctionType => e.auction.get.timestamp
        case _ => e.bid.get.timestamp
      }
    }.toSeq
    assert(ts == ts.sorted)
  }
}
