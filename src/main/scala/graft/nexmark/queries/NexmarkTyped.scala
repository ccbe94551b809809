package graft.nexmark.queries

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.nexmark._

/** Typed-API ports of the remaining SURVEY §2.8 rows:
  *
  *   - `AggregateFunction<IN, ACC, OUT>` (A2, the commented Q4/Q5 spec
  *     aggregator — NexmarkQuery5.java:402-422) →
  *     `org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]`,
  *     mergeable (partial/final) exactly like Flink's
  *     createAccumulator/add/merge/getResult contract, and registrable
  *     with `udaf(...)` for SQL use.
  *   - `RichCoGroupFunction` (J2, JoiningNewUsersWithAuctionsCoGroupFunction
  *     — NexmarkQuery8.java:106-153) → `KeyValueGroupedDataset.cogroup`:
  *     for each person with ≥1 auction in the group, emit one output with
  *     the latest-ingested auction's timestamps.
  */
object NexmarkTyped {

  /** NexmarkQuery5.java:444-483 accumulator shape. */
  case class Q4Acc(maxPrice: Double, count: Long, lastTs: Long, lastIngest: Long)

  /** NexmarkQuery5.java:402-422: add/merge keep max price, count, and the
    * latest (timestamp, ingestionTimestamp).
    */
  class Query4Aggregator extends Aggregator[Bid, Q4Acc, Query5Output] {
    override def zero: Q4Acc = Q4Acc(Double.MinValue, 0L, Long.MinValue, Long.MinValue)
    override def reduce(acc: Q4Acc, b: Bid): Q4Acc = Q4Acc(
      math.max(acc.maxPrice, b.bid), acc.count + 1,
      math.max(acc.lastTs, b.timestamp),
      math.max(acc.lastIngest, b.ingestionTimestamp))
    override def merge(a: Q4Acc, b: Q4Acc): Q4Acc = Q4Acc(
      math.max(a.maxPrice, b.maxPrice), a.count + b.count,
      math.max(a.lastTs, b.lastTs), math.max(a.lastIngest, b.lastIngest))
    override def finish(acc: Q4Acc): Query5Output =
      Query5Output(-1L, acc.maxPrice, acc.count, acc.lastTs, acc.lastIngest, -1L)
    override def bufferEncoder: Encoder[Q4Acc] = Encoders.product[Q4Acc]
    override def outputEncoder: Encoder[Query5Output] = Encoders.product[Query5Output]
  }

  /** Q5 via the typed Aggregator (groupByKey + agg(TypedColumn)). */
  def q5Typed(bids: Dataset[Bid]): Dataset[(Long, Query5Output)] = {
    import bids.sparkSession.implicits._
    bids.groupByKey(_.auctionId)
      .agg(new Query4Aggregator().toColumn.name("out"))
      .map { case (auctionId, out) => (auctionId, out.copy(auctionId = auctionId)) }
  }

  /** Q8 cogroup port (NexmarkQuery8.java:106-153): per personId, if the
    * group has at least one person and one auction, emit the person's
    * timestamps with the latest-ingested auction's timestamps.
    */
  def q8Cogroup(persons: Dataset[Person], auctions: Dataset[Auction]): Dataset[Query8Output] = {
    import persons.sparkSession.implicits._
    persons.groupByKey(_.personId)
      .cogroup(auctions.groupByKey(_.personId)) { (personId, ps, as) =>
        val personList = ps.toSeq
        val auctionList = as.toSeq
        if (personList.isEmpty || auctionList.isEmpty) Iterator.empty
        else {
          // ValueState semantics keep the latest person (:621-627)
          val p = personList.maxBy(_.timestamp)
          // the cogroup picks the auction with max ingestion (:118-147)
          val a = auctionList.maxBy(x => (x.ingestionTimestamp, x.timestamp))
          Iterator.single(Query8Output(
            a.ingestionTimestamp, p.timestamp, p.ingestionTimestamp,
            a.timestamp, a.ingestionTimestamp, personId))
        }
      }
  }
}
