package graft.nexmark.codec

import java.nio.ByteBuffer
import graft.nexmark.{Auction, Bid, Person}

/** Reference wire formats (SURVEY §1.3): 8192-byte frames with a 16-byte
  * header `[checksum:i32][itemsInThisBuffer:i32][newBacklog:i64]` followed
  * by fixed-width big-endian records. Layouts:
  *
  *   - persons: checksum 0x30011991, 206 B/record
  *     (source/PersonDeserializationSchema.java:13,33-41,51-92)
  *   - auctions: checksum 0x30061992, 269 B/record
  *     (source/AuctionsDeserializationSchema.java:14,40-80)
  *   - bids: checksum 0xdeedbeaf, 32 B/record
  *     (source/BidDesearializationSchema.java:19,31-53)
  *
  * The reference only ships the *decoders* (producers were external); the
  * encoders here invert them exactly, verified by round-trip specs.
  * `isEndOfStream` semantics: a frame whose `newBacklog <= items` is the
  * partition's last (PersonDeserializationSchema.java:97,102-104) — the
  * Spark analog is a bounded read (Trigger.AvailableNow), but the backlog
  * field is still produced/consumed faithfully.
  */
object BinaryCodec {

  val FrameSize = 8192
  val HeaderSize = 16
  val PersonChecksum = 0x30011991
  val AuctionChecksum = 0x30061992
  val BidChecksum = 0xdeedbeaf
  val PersonRecordSize = 206
  val AuctionRecordSize = 269
  val BidRecordSize = 32
  def personsPerFrame: Int = (FrameSize - HeaderSize) / PersonRecordSize // 39
  def auctionsPerFrame: Int = (FrameSize - HeaderSize) / AuctionRecordSize // 30
  def bidsPerFrame: Int = (FrameSize - HeaderSize) / BidRecordSize // 255

  /** Raw person wire record (the pre-derivation fields of
    * PersonDeserializationSchema.java:51-78).
    */
  case class RawPerson(
      id: Long, name: String, surname: String, emailDomain: String,
      city: String, country: String, creditCard0: Long, creditCard1: Long,
      a: Int, b: Int, c: Int, gender: Short, timestamp: Long)

  private def put32(buf: ByteBuffer, s: String): Unit = {
    val bytes = s.getBytes("US-ASCII")
    val out = java.util.Arrays.copyOf(bytes, 32) // NUL-padded
    buf.put(out)
  }
  private def get32(buf: ByteBuffer): String = {
    val tmp = new Array[Byte](32)
    buf.get(tmp)
    // the reference keeps padding bytes (`new String(tmp)`); we trim NULs so
    // derived strings are usable — a documented divergence, asserted in specs
    new String(tmp, "US-ASCII").takeWhile(_ != '\u0000')
  }

  // ---- persons ----

  def encodePersons(records: Seq[RawPerson], backlog: Long): Array[Byte] = {
    require(records.size <= personsPerFrame)
    val buf = ByteBuffer.allocate(FrameSize)
    buf.putInt(PersonChecksum).putInt(records.size).putLong(backlog)
    records.foreach { r =>
      buf.putLong(r.id)
      put32(buf, r.name); put32(buf, r.surname); put32(buf, r.emailDomain)
      put32(buf, r.city); put32(buf, r.country)
      buf.putLong(r.creditCard0).putLong(r.creditCard1)
      buf.putInt(r.a).putInt(r.b).putInt(r.c)
      buf.putShort(r.gender)
      buf.putLong(r.timestamp)
    }
    buf.array()
  }

  /** PersonDeserializationSchema.java:51-92 incl. field derivation. */
  def decodePersons(frame: Array[Byte], ingestionTimestamp: Long): Array[Person] = {
    require(frame.length == FrameSize, s"frame must be $FrameSize bytes")
    val buf = ByteBuffer.wrap(frame)
    val checksum = buf.getInt
    val items = buf.getInt
    buf.getLong // backlog
    require(checksum == PersonChecksum, f"bad person checksum 0x$checksum%08x")
    require(items <= personsPerFrame)
    Array.tabulate(items) { _ =>
      val id = buf.getLong
      val name = get32(buf); val surname = get32(buf); val domain = get32(buf)
      val city = get32(buf); val country = get32(buf)
      val cc0 = buf.getLong; val cc1 = buf.getLong
      val a = buf.getInt; val b = buf.getInt; val c = buf.getInt
      buf.getShort // gender: read, unused (as in the reference)
      val ts = buf.getLong
      val email = s"$name.$surname@$domain"
      Person(
        timestamp = ts, personId = id, name = s"$name $surname", email = email,
        city = city, country = country,
        province = "" + (a - c), zipcode = "" + (b - c),
        homepage = email, creditcard = "" + (cc0 + cc1),
        ingestionTimestamp = ingestionTimestamp)
    }
  }

  /** True iff this is the partition's final frame (backlog <= items). */
  def isLastFrame(frame: Array[Byte]): Boolean = {
    val buf = ByteBuffer.wrap(frame)
    buf.getInt
    val items = buf.getInt
    val backlog = buf.getLong
    backlog <= items
  }

  // ---- auctions ----

  def encodeAuctions(records: Seq[Auction], backlog: Long): Array[Byte] = {
    require(records.size <= auctionsPerFrame)
    val buf = ByteBuffer.allocate(FrameSize)
    buf.putInt(AuctionChecksum).putInt(records.size).putLong(backlog)
    records.foreach { r =>
      buf.putLong(r.auctionId).putLong(r.personId)
      buf.put(r.categoryId.toByte)
      buf.putInt(r.itemId.toInt)
      buf.putLong(r.start).putLong(r.end)
      buf.putInt(r.initialPrice.toInt)
      buf.put(java.util.Arrays.copyOf(r.name.getBytes("US-ASCII"), 20))
      buf.put(java.util.Arrays.copyOf(r.descr.getBytes("US-ASCII"), 200))
      buf.putLong(r.timestamp)
    }
    buf.array()
  }

  /** AuctionsDeserializationSchema.java:56-80. */
  def decodeAuctions(frame: Array[Byte], ingestionTimestamp: Long): Array[Auction] = {
    require(frame.length == FrameSize)
    val buf = ByteBuffer.wrap(frame)
    require(buf.getInt == AuctionChecksum, "bad auction checksum")
    val items = buf.getInt
    buf.getLong
    require(items <= auctionsPerFrame)
    val name = new Array[Byte](20)
    val descr = new Array[Byte](200)
    Array.tabulate(items) { _ =>
      val id = buf.getLong; val pid = buf.getLong
      val cat = buf.get(); val itemId = buf.getInt
      val start = buf.getLong; val end = buf.getLong
      val price = buf.getInt
      buf.get(name); buf.get(descr)
      val ts = buf.getLong
      Auction(
        timestamp = ts, auctionId = id, personId = pid, itemId = itemId.toLong,
        initialPrice = price.toDouble, start = start, end = end,
        categoryId = cat.toLong,
        name = new String(name, "US-ASCII").takeWhile(_ != '\u0000'),
        descr = new String(descr, "US-ASCII").takeWhile(_ != '\u0000'),
        ingestionTimestamp = ingestionTimestamp)
    }
  }

  // ---- bids ----

  def encodeBids(records: Seq[Bid], backlog: Long): Array[Byte] = {
    require(records.size <= bidsPerFrame)
    val buf = ByteBuffer.allocate(FrameSize)
    buf.putInt(BidChecksum).putInt(records.size).putLong(backlog)
    records.foreach { r =>
      buf.putLong(r.personId).putLong(r.auctionId)
      buf.putDouble(r.bid).putLong(r.timestamp)
    }
    buf.array()
  }

  /** BidDesearializationSchema.java:44-53 (bidId always -1). */
  def decodeBids(frame: Array[Byte], ingestionTimestamp: Long): Array[Bid] = {
    require(frame.length == FrameSize)
    val buf = ByteBuffer.wrap(frame)
    require(buf.getInt == BidChecksum, "bad bid checksum")
    val items = buf.getInt
    buf.getLong
    require(items <= bidsPerFrame)
    Array.tabulate(items) { _ =>
      val bidder = buf.getLong; val auction = buf.getLong
      val price = buf.getDouble; val ts = buf.getLong
      Bid(ingestionTimestamp, ts, auction, bidder, -1L, price)
    }
  }

  /** Frame a whole record stream: groups of `perFrame` with a decreasing
    * backlog so the final frame satisfies `isLastFrame`.
    */
  def frameAll[T](records: Seq[T], perFrame: Int)(encode: (Seq[T], Long) => Array[Byte]): Seq[Array[Byte]] = {
    val total = records.size.toLong
    records.grouped(perFrame).zipWithIndex.map { case (group, i) =>
      val remaining = total - i.toLong * perFrame
      encode(group, remaining)
    }.toSeq
  }
}
