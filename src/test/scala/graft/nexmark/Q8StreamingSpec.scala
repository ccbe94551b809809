package graft.nexmark

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.nexmark.queries.NexmarkQueries

/** J2 in streaming mode: q8NewUsers chains window-agg → stream-stream
  * join → window-agg (a multi-stateful-operator pipeline, supported since
  * Spark 3.5 for window-column joins). Output compared to the batch flavor.
  */
class Q8StreamingSpec extends SparkSpec {
  val cfg = GenConfig()
  val SentinelTs = 1893456000000L

  test("streaming q8NewUsers (windowed join) matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val persons = NexmarkGen.persons(cfg, 600).toSeq
    val auctions = NexmarkGen.auctions(cfg, 2400).toSeq
    val msP = MemoryStream[Person]
    val msA = MemoryStream[Auction]
    val result = NexmarkQueries.q8NewUsers(msP.toDS(), msA.toDS(), "1 hour")
    val q = result.writeStream.format("memory").queryName("q8stream")
      .outputMode("append").start()
    try {
      msP.addData(persons); msA.addData(auctions); q.processAllAvailable()
      // advance both watermarks past every real window
      msP.addData(Seq(persons.head.copy(personId = Long.MaxValue / 2, timestamp = SentinelTs)))
      msA.addData(Seq(auctions.head.copy(personId = Long.MaxValue / 2, timestamp = SentinelTs)))
      q.processAllAvailable()
      msP.addData(Seq(persons.head.copy(personId = Long.MaxValue / 2 + 1, timestamp = SentinelTs + 7200000)))
      msA.addData(Seq(auctions.head.copy(personId = Long.MaxValue / 2 + 1, timestamp = SentinelTs + 7200000)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("q8stream").collect()
      .filter(_.getLong(1) < Long.MaxValue / 2)
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getLong(5))).toMap
    val batch = NexmarkQueries.q8NewUsers(
        spark.createDataset(persons), spark.createDataset(auctions), "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got == batch)
    assert(got.nonEmpty)
  }
}
