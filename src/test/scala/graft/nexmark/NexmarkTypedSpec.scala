package graft.nexmark

import org.apache.spark.sql.functions.udaf
import graft.nexmark.queries.NexmarkTyped

class NexmarkTypedSpec extends SparkSpec {
  val cfg = GenConfig()

  test("typed Aggregator q5 matches the in-memory max/count/latest") {
    val bids = NexmarkGen.bids(cfg, 10000).toSeq
    val got = NexmarkTyped.q5Typed(NexmarkSources.bidsDs(spark, cfg, 10000))
      .collect().map { case (id, o) => id -> (o.maxPrice, o.count, o.lastTimestamp) }.toMap
    val want = bids.groupBy(_.auctionId).view.mapValues { bs =>
      (bs.map(_.bid).max, bs.size.toLong, bs.map(_.timestamp).max)
    }.toMap
    assert(got == want)
  }

  test("the Aggregator registers as a SQL UDAF (udaf(...))") {
    import spark.implicits._
    spark.udf.register("q4agg", udaf(new NexmarkTyped.Query4Aggregator()))
    NexmarkSources.bidsDs(spark, cfg, 5000).createOrReplaceTempView("bids_typed")
    // a case-class Aggregator registers as a flattened multi-arg UDAF
    val rows = spark.sql(
      """SELECT auctionId,
        |       q4agg(ingestionTimestamp, timestamp, auctionId, personId, bidId, bid).maxPrice AS m
        |FROM bids_typed GROUP BY auctionId""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = NexmarkGen.bids(cfg, 5000).toSeq.groupBy(_.auctionId)
      .view.mapValues(_.map(_.bid).max).toMap
    assert(rows == want)
  }

  test("cogroup q8 matches the windowless join semantics") {
    val persons = NexmarkGen.persons(cfg, 800).toSeq
    val auctions = NexmarkGen.auctions(cfg, 3000).toSeq
    val got = NexmarkTyped.q8Cogroup(
        NexmarkSources.personsDs(spark, cfg, 800),
        NexmarkSources.auctionsDs(spark, cfg, 3000))
      .collect().map(o => o.personId -> o.auctionIngestionTimestamp).toMap
    val pIds = persons.map(_.personId).toSet
    val want = auctions.filter(a => pIds.contains(a.personId))
      .groupBy(_.personId)
      .view.mapValues(_.map(_.ingestionTimestamp).max).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
