package graft.nexmark

import java.sql.Timestamp

/** Nexmark data model (reference: /root/reference/src/main/java/io/ventura/
  * nexmark/beans — NewPersonEvent0.java:16-29, AuctionEvent0.java:30-41,
  * BidEvent0.java:22-27, NexmarkEvent.java:11-33, cm/CmRecord.java:5-18).
  *
  * Flat case classes with product encoders replace the reference's POJOs +
  * hand-written Kryo serializers + Recycler pools (SURVEY §1.3): Tungsten
  * UnsafeRow is the Spark-native equivalent of all of that machinery.
  *
  * Timestamps are kept as epoch-millis longs (the reference's convention)
  * plus a `java.sql.Timestamp` view (`eventTime`) for Structured Streaming
  * watermarks/windows.
  */
case class Person(
    timestamp: Long,
    personId: Long,
    name: String,
    email: String,
    city: String,
    country: String,
    province: String,
    zipcode: String,
    homepage: String,
    creditcard: String,
    ingestionTimestamp: Long) {
  def eventTime: Timestamp = new Timestamp(timestamp)
}

case class Auction(
    timestamp: Long,
    auctionId: Long,
    personId: Long, // seller
    itemId: Long,
    initialPrice: Double,
    start: Long,
    end: Long,
    categoryId: Long,
    name: String,
    descr: String,
    ingestionTimestamp: Long) {
  def eventTime: Timestamp = new Timestamp(timestamp)
}

case class Bid(
    ingestionTimestamp: Long,
    timestamp: Long,
    auctionId: Long,
    personId: Long, // bidder
    bidId: Long,    // always -1 in the reference (BidEvent0.java:25)
    bid: Double) {
  def eventTime: Timestamp = new Timestamp(timestamp)
}

/** Unified tagged event (NexmarkEvent.java:41,88,131: 0=auction, 1=bid,
  * 2=person). Spark has no TaggedUnion TypeInformation; a flat schema with
  * nullable sides is the idiomatic equivalent (SURVEY §2.3 P3).
  */
case class Event(
    eventType: Int,
    person: Option[Person],
    auction: Option[Auction],
    bid: Option[Bid]) {
  /** Partition key: auctionId for auctions/bids, personId for persons
    * (NexmarkEvent.java:51-53,98-100,141-143). */
  def key: Long = eventType match {
    case 0 => auction.get.auctionId
    case 1 => bid.get.auctionId
    case _ => person.get.personId
  }
}

object Event {
  val AuctionType = 0
  val BidType = 1
  val PersonType = 2
  def of(a: Auction): Event = Event(AuctionType, None, Some(a), None)
  def of(b: Bid): Event = Event(BidType, None, None, Some(b))
  def of(p: Person): Event = Event(PersonType, Some(p), None, None)
}

/** Q8/Q11 join output (beans/Query8WindowOutput.java:3-24). */
case class Query8Output(
    windowTriggerTimestamp: Long,
    personCreationTimestamp: Long,
    personIngestionTimestamp: Long,
    auctionCreationTimestamp: Long,
    auctionIngestionTimestamp: Long,
    personId: Long)

/** Q5 aggregation output (NexmarkQuery5.java:485-496 + accumulator
  * :444-483): per-auction max price plus latency probe timestamps. */
case class Query5Output(
    auctionId: Long,
    maxPrice: Double,
    count: Long,
    lastTimestamp: Long,
    lastIngestionTimestamp: Long,
    windowTriggerTimestamp: Long)

/** QX winning-bid output (NexmarkQueryX.java:788-808). */
case class WinningBid(auctionId: Long, bidderId: Long, bid: Double, bidTimestamp: Long)

/** Google cluster-trace record (cm/CmRecord.java:5-18), parsed from a
  * whitespace-delimited line (cm/CmRecord.java:23-42). */
case class CmRecord(
    timestamp: Long,
    jobId: Long,
    taskId: Long,
    machineId: Long,
    eventType: Int,
    userId: Int,
    category: Int,
    priority: Int,
    cpu: Float,
    ram: Float,
    disk: Float) {
  def eventTime: Timestamp = new Timestamp(timestamp)
}

object CmRecord {
  /** cm/CmRecord.java:23-42: whitespace-split, positional parse. */
  def parse(line: String): CmRecord = {
    val p = line.trim.split("\\s+")
    CmRecord(p(0).toLong, p(1).toLong, p(2).toLong, p(3).toLong,
      p(4).toInt, p(5).toInt, p(6).toInt, p(7).toInt,
      p(8).toFloat, p(9).toFloat, p(10).toFloat)
  }
}

/** Generator vocabulary. The reference draws from large dictionaries
  * (original/Cities.java, Countries.java, Emails.java, Firstnames.java,
  * Lastnames.java) and from 2000 RANDOM (non-deterministic, generated at
  * class-load — original/RandomStrings.java:17-43) auction name/descr
  * strings. We keep the same *distribution shape* (uniform over a fixed
  * vocabulary; 20-char names / 200-char descriptions of a-z+space) but use
  * compact deterministic vocabularies so golden tests are stable
  * (SURVEY §7.4.3: determinism over fidelity for untestable randomness).
  */
object Dictionaries {
  val Cities: Array[String] = Array(
    "berlin", "paris", "rome", "madrid", "lisbon", "vienna", "prague",
    "warsaw", "athens", "dublin", "oslo", "helsinki", "stockholm",
    "copenhagen", "amsterdam", "brussels", "bern", "budapest", "zagreb",
    "tallinn")
  val Countries: Array[String] = Array(
    "germany", "france", "italy", "spain", "portugal", "austria",
    "czechia", "poland", "greece", "ireland", "norway", "finland",
    "sweden", "denmark", "netherlands", "belgium", "switzerland",
    "hungary", "croatia", "estonia")
  val EmailDomains: Array[String] = Array(
    "example.com", "mail.test", "inbox.example", "post.invalid",
    "box.example", "mx.test", "mailhost.example", "relay.invalid")
  val Firstnames: Array[String] = Array(
    "walter", "ada", "grace", "alan", "edsger", "barbara", "donald",
    "john", "leslie", "tony", "maurice", "frances", "ken", "dennis",
    "bjarne", "niklaus", "kristen", "ole", "robin", "margaret")
  val Lastnames: Array[String] = Array(
    "gropius", "lovelace", "hopper", "turing", "dijkstra", "liskov",
    "knuth", "backus", "lamport", "hoare", "wilkes", "allen", "thompson",
    "ritchie", "stroustrup", "wirth", "nygaard", "dahl", "milner",
    "hamilton")
}
