package graft.nexmark

import org.scalatest.funsuite.AnyFunSuite
import graft.nexmark.codec.BinaryCodec
import graft.nexmark.codec.BinaryCodec.RawPerson

class BinaryCodecSpec extends AnyFunSuite {
  val cfg = GenConfig()

  test("bid frames round-trip exactly (32-byte records)") {
    val bids = NexmarkGen.bids(cfg, 300).toSeq
    val frames = BinaryCodec.frameAll(bids, BinaryCodec.bidsPerFrame)(BinaryCodec.encodeBids)
    assert(frames.size == 2) // 300 / 255 per frame
    assert(frames.forall(_.length == BinaryCodec.FrameSize))
    val decoded = frames.flatMap(BinaryCodec.decodeBids(_, ingestionTimestamp = 777L))
    assert(decoded.size == 300)
    decoded.zip(bids).foreach { case (d, o) =>
      assert(d.auctionId == o.auctionId && d.personId == o.personId &&
        d.bid == o.bid && d.timestamp == o.timestamp && d.bidId == -1L &&
        d.ingestionTimestamp == 777L)
    }
    assert(!BinaryCodec.isLastFrame(frames.head))
    assert(BinaryCodec.isLastFrame(frames.last))
  }

  test("auction frames round-trip (269-byte records)") {
    val auctions = NexmarkGen.auctions(cfg, 45).toSeq
    val frames = BinaryCodec.frameAll(auctions, BinaryCodec.auctionsPerFrame)(BinaryCodec.encodeAuctions)
    assert(frames.size == 2) // 45 / 30 per frame
    val decoded = frames.flatMap(BinaryCodec.decodeAuctions(_, 5L))
    assert(decoded.size == 45)
    decoded.zip(auctions).foreach { case (d, o) =>
      assert(d.auctionId == o.auctionId && d.personId == o.personId &&
        d.start == o.start && d.end == o.end && d.timestamp == o.timestamp &&
        d.categoryId == o.categoryId && d.itemId == o.itemId &&
        d.initialPrice == o.initialPrice.toInt.toDouble &&
        d.name == o.name && d.descr == o.descr)
    }
  }

  test("person frames round-trip with field derivation (PersonDeserializationSchema.java:58-90)") {
    val raw = (0 until 80).map { i =>
      RawPerson(i.toLong, s"first$i", s"last$i", "mail.test", s"city$i",
        s"country$i", 1000L + i, 2000L + i, 10 + i, 20 + i, 3, 1, 999000L + i)
    }
    val frames = BinaryCodec.frameAll(raw, BinaryCodec.personsPerFrame)(BinaryCodec.encodePersons)
    assert(frames.size == 3) // 80 / 39 per frame
    val decoded = frames.flatMap(BinaryCodec.decodePersons(_, 42L))
    assert(decoded.size == 80)
    decoded.zip(raw).foreach { case (d, r) =>
      assert(d.personId == r.id)
      assert(d.name == s"${r.name} ${r.surname}")
      assert(d.email == s"${r.name}.${r.surname}@${r.emailDomain}")
      assert(d.province == ("" + (r.a - r.c)))
      assert(d.zipcode == ("" + (r.b - r.c)))
      assert(d.homepage == d.email)
      assert(d.creditcard == ("" + (r.creditCard0 + r.creditCard1)))
      assert(d.timestamp == r.timestamp && d.ingestionTimestamp == 42L)
    }
  }

  test("sized person payloads round-trip the 206-byte records unchanged") {
    // the size-matched fields (6/7-char name parts, 7-char city, 9-char
    // country) fit the codec's NUL-padded 32-byte slots, so the fixed
    // 206-byte record layout carries them bit-exactly
    val cfg = GenConfig(sizedPayloads = true)
    val raw = NexmarkGen.persons(cfg, 50).toSeq.map { p =>
      val Array(first, last) = p.name.split(" ")
      BinaryCodec.RawPerson(p.personId, first, last, "mail.test",
        p.city, p.country, 0L, 0L, 1, 2, 3, 0, p.timestamp)
    }
    val frames = BinaryCodec.frameAll(raw, BinaryCodec.personsPerFrame)(BinaryCodec.encodePersons)
    val decoded = frames.flatMap(BinaryCodec.decodePersons(_, 7L))
    assert(decoded.size == 50)
    decoded.zip(raw).foreach { case (d, r) =>
      assert(d.name == s"${r.name} ${r.surname}")
      assert(d.name.length == 14)
      assert(d.timestamp == r.timestamp)
    }
  }

  test("frames reject wrong checksums") {
    val bidFrame = BinaryCodec.encodeBids(NexmarkGen.bids(cfg, 3).toSeq, 3)
    intercept[IllegalArgumentException](BinaryCodec.decodePersons(bidFrame, 0L))
    intercept[IllegalArgumentException](BinaryCodec.decodeAuctions(bidFrame, 0L))
  }

  test("sliceFrames splits concatenated frames and drops padding tails") {
    val bids = NexmarkGen.bids(cfg, 300).toSeq
    val frames = BinaryCodec.frameAll(bids, BinaryCodec.bidsPerFrame)(BinaryCodec.encodeBids)
    val blob = frames.flatten.toArray ++ Array.fill[Byte](100)(0) // trailing junk
    val sliced = NexmarkSources.sliceFrames(blob).toSeq
    assert(sliced.size == frames.size)
    assert(sliced.flatMap(BinaryCodec.decodeBids(_, 0L)).size == 300)
  }
}
