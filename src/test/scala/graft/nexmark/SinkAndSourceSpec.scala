package graft.nexmark

import java.nio.file.{Files, Paths}
import graft.nexmark.codec.BinaryCodec
import graft.nexmark.sink.{LatencySink, Murmur3Partitioner}

/** Coverage for the source/sink rows of SURVEY §2 that aren't exercised by
  * the query specs: file-backed binary frames (S5), the latency CSV
  * contract with an injectable clock (K1-K3), and the murmur3 Kafka
  * partitioner (K4).
  */
class SinkAndSourceSpec extends SparkSpec {
  val cfg = GenConfig()

  test("S5: binaryFile-sourced frames decode to the original bids") {
    import spark.implicits._
    val bids = NexmarkGen.bids(cfg, 600).toSeq
    val frames = BinaryCodec.frameAll(bids, BinaryCodec.bidsPerFrame)(BinaryCodec.encodeBids)
    val dir = Files.createTempDirectory("bidfiles")
    // two "subtask" files like bids_<subtask>.bin (NexmarkQuery5File.java:167)
    frames.grouped(2).zipWithIndex.foreach { case (fs, i) =>
      Files.write(Paths.get(dir.toString, s"bids_$i.bin"), fs.flatten.toArray)
    }
    val decoded = NexmarkSources.bidsFromFrames(
      spark.read.format("binaryFile").load(dir.toString)
        .select("content").as[Array[Byte]]
        .flatMap(NexmarkSources.sliceFrames),
      ingestionTs = 1L)
    val key = (b: Bid) => (b.timestamp, b.auctionId, b.personId, b.bid)
    assert(decoded.collect().toSeq.sortBy(key).map(key) == bids.sortBy(key).map(key))
  }

  test("K1-K3: latency CSV follows the measurement contract with a fixed clock") {
    import spark.implicits._
    val dir = Files.createTempDirectory("latency")
    val csv = s"$dir/lat.csv"
    val base = 1704067200000L
    // three rows: latencies 100, 200, and one over the threshold (discarded)
    val batch = Seq(
      (base - 100L, base - 150L),
      (base - 200L, base - 250L),
      (base - LatencySink.DefaultThresholdMs - 1L, base - 300L))
      .toDF("creation", "ingestion")
    LatencySink.recordBatch(batch, batchId = 7L, csv, "creation", "ingestion",
      now = () => base)
    val lines = scala.io.Source.fromFile(csv).getLines().toSeq
    assert(lines.head == LatencySink.CsvHeader)
    val creation = lines(1).split(",")
    assert(creation(0) == "7" && creation(2) == "creationToSink")
    assert(creation(3) == "2")            // outlier discarded
    assert(creation(4) == "150.000")      // mean(100, 200)
    assert(creation(5) == "100" && creation(6) == "200")
    val flight = lines(2).split(",")
    assert(flight(2) == "flightTime" && flight(3) == "3") // 150/250/300 all kept
    assert(flight(4) == f"${(150 + 250 + 300) / 3.0}%.3f")
  }

  test("K4: murmur3 partitioner is deterministic, seeded, and well-spread") {
    val p1 = (0L until 10000L).map(Murmur3Partitioner.partitionFor(_, 32))
    val p2 = (0L until 10000L).map(Murmur3Partitioner.partitionFor(_, 32))
    assert(p1 == p2)
    assert(p1.forall(p => p >= 0 && p < 32))
    // all 32 partitions hit, no partition starved below half the fair share
    val counts = p1.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 32)
    assert(counts.values.min > 10000 / 32 / 2)
    // seed matters
    assert((0L until 100L).exists(k =>
      Murmur3Partitioner.murmur3_32(k, Murmur3Partitioner.Seed) !=
        Murmur3Partitioner.murmur3_32(k, 0)))
  }

  test("S6: CM text file source parses whitespace-delimited trace lines") {
    val dir = Files.createTempDirectory("cm")
    val lines = (0 until 100).map(i =>
      s"${1704067200000L + i} ${i % 5} $i ${i % 9}  0 1 2 3  0.5 0.25 0.125")
    Files.write(Paths.get(dir.toString, "trace.txt"),
      (lines :+ "").mkString("\n").getBytes)
    val recs = NexmarkSources.cmRecords(spark, dir.toString).collect()
    assert(recs.length == 100)
    assert(recs.map(_.jobId).toSet == (0 until 5).map(_.toLong).toSet)
  }
}
