package graft.nexmark

import org.scalatest.funsuite.AnyFunSuite
import graft.nexmark.codec.TaggedCodec

class TaggedCodecSpec extends AnyFunSuite {
  val cfg = GenConfig()

  test("unified-topic tagged records round-trip for all three event types") {
    val events = NexmarkGen.events(cfg, 900).toSeq
    events.foreach { e =>
      val decoded = TaggedCodec.decode(TaggedCodec.encode(e))
      assert(decoded == e, s"round-trip mismatch for type ${e.eventType}")
    }
  }

  test("message key is the 8-byte big-endian partition key") {
    val e = NexmarkGen.events(cfg, 9).toSeq
    e.foreach { ev =>
      val key = java.nio.ByteBuffer.wrap(TaggedCodec.encodeKey(ev)).getLong
      assert(key == ev.key)
      // auctions/bids key by auctionId, persons by personId (NexmarkEvent.java:51-53)
      ev.eventType match {
        case Event.AuctionType => assert(key == ev.auction.get.auctionId)
        case Event.BidType => assert(key == ev.bid.get.auctionId)
        case _ => assert(key == ev.person.get.personId)
      }
    }
  }

  test("unknown tag is rejected") {
    intercept[IllegalArgumentException](TaggedCodec.decode(Array[Byte](9, 0, 0)))
  }
}
