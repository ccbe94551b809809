package graft.nexmark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.nexmark.queries.{NexmarkQueries, NexmarkStateful}

/** Pins the EXACT append-mode emission predicates the streaming oracles in
  * [[graft.queries.StreamingBench]] assume, at the boundary where `<` and
  * `<=` differ (the sf0.01 gate data never lands a window/timer exactly ON
  * the watermark, so only this spec exercises the distinction — if a Spark
  * upgrade flips a predicate, this fails before the oracle gate does):
  *
  *   - tumbling/session windows EMIT a window whose end == watermark
  *     (eviction predicate `window.end <= wm`);
  *   - flatMapGroupsWithState event-time timeouts do NOT fire when the
  *     timeout timestamp == watermark (strict `timeout < wm`).
  *
  * Each case drives one micro-batch of handpicked events plus a max-ts
  * "probe" event that sets the final watermark to exactly the boundary
  * value, then lets the AvailableNow-style no-data batch finalize.
  */
class StreamingOracleBoundarySpec extends SparkSpec {
  import spark.implicits._

  private var nameCounter = 0
  private def runOnce[T](stream: MemoryStream[T], data: Seq[T],
                         result: DataFrame): Seq[org.apache.spark.sql.Row] = {
    nameCounter += 1
    val name = s"boundarysink$nameCounter"
    val q: StreamingQuery = result.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try { stream.addData(data); q.processAllAvailable() }
    finally { q.processAllAvailable(); q.stop() }
    spark.table(name).collect().toSeq
  }

  private def bid(ts: Long, auction: Long, bidder: Long = 1L, price: Double = 10.0) =
    Bid(ts, ts, auction, bidder, -1L, price)

  test("tumbling window with end == watermark IS emitted (oracle uses <=)") {
    implicit val sqlCtx = spark.sqlContext
    // window [0, 5000) for auction 1; probe bid at 7000 -> wm = 5000 == end
    val ms = MemoryStream[Bid]
    val out = runOnce(ms, Seq(bid(1000L, 1L), bid(7000L, 99L)),
      NexmarkQueries.q5HotAuctions(ms.toDS(), "5 seconds"))
    assert(out.exists(r => r.getLong(1) == 1L && r.getLong(0) == 0L),
      s"window [0,5000) must emit at wm==5000; got $out")
    // and NOT one microsecond earlier: probe at 6999 -> wm = 4999 < end
    val ms2 = MemoryStream[Bid]
    val out2 = runOnce(ms2, Seq(bid(1000L, 1L), bid(6999L, 99L)),
      NexmarkQueries.q5HotAuctions(ms2.toDS(), "5 seconds"))
    assert(!out2.exists(_.getLong(1) == 1L),
      s"window [0,5000) must stay open at wm==4999; got $out2")
  }

  test("session window with end == watermark IS emitted (oracle uses <=)") {
    implicit val sqlCtx = spark.sqlContext
    // person 1 bids at 1000 -> session [1000, 6000); probe at 8000 -> wm = 6000
    val ms = MemoryStream[Bid]
    val out = runOnce(ms, Seq(bid(1000L, 1L, bidder = 1L), bid(8000L, 9L, bidder = 99L)),
      NexmarkQueries.sessions(ms.toDS(), "5 seconds"))
    assert(out.exists(r => r.getLong(2) == 1L && r.getLong(1) == 6000L),
      s"session ending at 6000 must emit at wm==6000; got $out")
    val ms2 = MemoryStream[Bid]
    val out2 = runOnce(ms2, Seq(bid(1000L, 1L, bidder = 1L), bid(7999L, 9L, bidder = 99L)),
      NexmarkQueries.sessions(ms2.toDS(), "5 seconds"))
    assert(!out2.exists(_.getLong(2) == 1L),
      s"session ending at 6000 must stay open at wm==5999; got $out2")
  }

  test("exact-gap successor EXTENDS the session (oracle break is strict >)") {
    // Spark merges session intervals that overlap OR TOUCH: a bid exactly
    // gap ms after the previous one continues the session. Found the hard
    // way — the gaps-and-islands oracles originally broke on >= gap and
    // first diverged at sf0.1, where exact-gap bid pairs first occur.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Bid]
    val out = runOnce(ms,
      Seq(bid(1000L, 1L, bidder = 1L), bid(6000L, 2L, bidder = 1L),
          bid(99000L, 9L, bidder = 99L)),
      NexmarkQueries.sessions(ms.toDS(), "5 seconds"))
    val mine = out.filter(_.getLong(2) == 1L)
    assert(mine.size == 1 && mine.head.getLong(3) == 2L &&
      mine.head.getLong(0) == 1000L && mine.head.getLong(1) == 11000L,
      s"bids at 1000 and 6000 must form ONE session [1000,11000); got $out")
    // batch session_window agrees (same merge rule both modes)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batch = Seq((1L, 1000L), (1L, 6000L)).toDF("uid", "tms")
      .withColumn("ts", timestamp_millis(col("tms")))
      .groupBy(session_window(col("ts"), "5 seconds"), col("uid"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("session_window.start")),
              unix_millis(col("session_window.end")), col("n"))
      .collect()
    assert(batch.length == 1 && batch.head.getLong(2) == 2L &&
      batch.head.getLong(1) == 11000L,
      s"batch session_window must merge the exact-gap pair; got ${batch.toSeq}")
  }

  test("event-time timeout at == watermark does NOT fire (oracle uses <)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // auction 1 ends at 5000 (timer at 5000); probe ts 7000 -> wm = 5000:
    // strict `timeout < wm` means NOT fired yet
    val auction = Auction(1000L, 1L, 7L, 1L, 1.0, 1000L, 5000L, 1L, "a", "d", 1000L)
    val msB = MemoryStream[Bid]
    val msA = MemoryStream[Auction]
    val q = NexmarkStateful.qxStateful(msB.toDS(), msA.toDS()).toDF
    nameCounter += 1
    val name = s"boundarysink$nameCounter"
    val sq = q.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      msA.addData(Seq(auction)); msB.addData(Seq(bid(2000L, 1L), bid(7000L, 99L)))
      sq.processAllAvailable()
    } finally { sq.processAllAvailable(); sq.stop() }
    val atWm = spark.table(name).collect().toSeq
    assert(!atWm.exists(_.getLong(0) == 1L),
      s"timer at 5000 must NOT fire at wm==5000; got $atWm")

    // one ms later: probe ts 7001 -> wm = 5001 > 5000 -> fires
    val msB2 = MemoryStream[Bid]
    val msA2 = MemoryStream[Auction]
    val q2 = NexmarkStateful.qxStateful(msB2.toDS(), msA2.toDS()).toDF
    nameCounter += 1
    val name2 = s"boundarysink$nameCounter"
    val sq2 = q2.writeStream.format("memory").queryName(name2).outputMode("append").start()
    try {
      msA2.addData(Seq(auction)); msB2.addData(Seq(bid(2000L, 1L), bid(7001L, 99L)))
      sq2.processAllAvailable()
    } finally { sq2.processAllAvailable(); sq2.stop() }
    val pastWm = spark.table(name2).collect().toSeq
    assert(pastWm.exists(r => r.getLong(0) == 1L && r.getDouble(2) == 10.0),
      s"timer at 5000 must fire at wm==5001; got $pastWm")
  }
}
