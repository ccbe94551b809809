package graft.nexmark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.nexmark.codec.{BinaryCodec, TaggedCodec}
import graft.nexmark.sink.Murmur3Partitioner

/** Kafka wiring (SURVEY §2.1 S4, §2.2 K4). The decode/encode kernels are
  * unit-tested locally (BinaryCodecSpec/TaggedCodecSpec); these functions
  * supply the Spark topology around them and require a reachable broker —
  * the zero-egress build environment has none, so they are exercised only
  * through their frame-level codecs (the reference's test suite ran its
  * Kafka paths against an external broker too, NexmarkSuite.java:136-164).
  *
  * Bounded-stream termination: the reference's `isEndOfStream` backlog
  * check (PersonDeserializationSchema.java:102-104) has no Spark analog;
  * `Trigger.AvailableNow` is the equivalent (SURVEY §7.4.5).
  */
object NexmarkKafka {

  private def rawValues(spark: SparkSession, servers: String, topic: String): Dataset[Array[Byte]] = {
    import spark.implicits._
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select("value").as[Array[Byte]]
  }

  /** S4: 8 KiB-framed typed topics (nexmark_persons/auctions/bids). */
  def personsFromKafka(spark: SparkSession, servers: String, topic: String = "nexmark_persons"): Dataset[Person] =
    NexmarkSources.personsFromFrames(rawValues(spark, servers, topic), System.currentTimeMillis())
  def auctionsFromKafka(spark: SparkSession, servers: String, topic: String = "nexmark_auctions"): Dataset[Auction] =
    NexmarkSources.auctionsFromFrames(rawValues(spark, servers, topic), System.currentTimeMillis())
  def bidsFromKafka(spark: SparkSession, servers: String, topic: String = "nexmark_bids"): Dataset[Bid] =
    NexmarkSources.bidsFromFrames(rawValues(spark, servers, topic), System.currentTimeMillis())

  /** Unified `nexmark-events` topic consumer (tag-framed records). */
  def eventsFromKafka(spark: SparkSession, servers: String, topic: String = "nexmark-events"): Dataset[Event] = {
    import spark.implicits._
    rawValues(spark, servers, topic).map(TaggedCodec.decode)
  }

  /** K4: the producer's exact output projection — `key` (8-byte BE
    * partition key), `value` (tagged wire bytes), `partition` (murmur3
    * seed-104729 routing) — shared by [[writeEventsToKafka]] and the
    * broker-less partition-log composition spec, so the spec exercises
    * the production routing byte-for-byte rather than a reimplementation.
    *
    * Routing deliberately hashes all 8 key bytes, NOT the reference's
    * first-4-bytes hash (GeneratorPipeline.java:198-251), which collapses
    * to one partition for ids < 2^32 — see [[Murmur3Partitioner]]'s doc;
    * `Murmur3Partitioner.referencePartitionFor` is the byte-exact port.
    * The partition column is the native `murmur3_partition` expression
    * computed in the projection AFTER the (unavoidable) binary-encode map
    * — the routing stays codegen'd and plan-auditable; only the byte-level
    * codec runs in a lambda (the documented binary-codec exception).
    */
  def keyedForProduce(events: Dataset[Event], numPartitions: Int): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit}
    // fail fast with the actual precondition instead of an unresolved-
    // function AnalysisException at stream start: the routing column needs
    // the session built with spark.sql.extensions=graft.spark.GraftExtensions
    require(events.sparkSession.catalog.functionExists("murmur3_partition"),
      "the events producer requires graft.spark.GraftExtensions " +
        "(spark.sql.extensions) for the native murmur3_partition routing column")
    events
      .map(e => (TaggedCodec.encodeKey(e), TaggedCodec.encode(e), e.key))
      .toDF("key", "value", "k")
      .withColumn("partition", call_function("murmur3_partition", col("k"), lit(numPartitions)))
      .drop("k")
  }

  /** The Kafka sink for [[keyedForProduce]]'s projection (routing/codec
    * rationale documented there). */
  def writeEventsToKafka(events: Dataset[Event], servers: String,
                         numPartitions: Int, checkpoint: String,
                         topic: String = "nexmark-events"): DataStreamWriter[org.apache.spark.sql.Row] = {
    val keyed = keyedForProduce(events, numPartitions)
    keyed.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
  }
}
