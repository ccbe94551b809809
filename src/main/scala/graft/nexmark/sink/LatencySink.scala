package graft.nexmark.sink

import java.io.{File, FileWriter, PrintWriter}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Latency-measurement sink layer (SURVEY §2.2 K1-K3, §6 measurement
  * contract; reference: NexmarkQuery8.java:245-415,
  * NexmarkQuery5.java:253-400, NexmarkQueryX.java:834-1108).
  *
  * The reference's RichSinkFunction accumulates SummaryStatistics
  * (count/mean/min/max/stddev) over latency series per subtask and appends
  * CSV rows. The Spark-native equivalent is a `foreachBatch` sink: each
  * micro-batch computes the same statistics declaratively (one tiny agg on
  * the batch DataFrame — no driver-side row loop) and appends one CSV row
  * per series. Outliers above the threshold are discarded
  * (LATENCY_THRESHOLD = 10 min, NexmarkQuery8.java:247; 30 min for Q5b,
  * NexmarkQuery5b.java:219).
  */
object LatencySink {

  val DefaultThresholdMs: Long = 10 * 60 * 1000L // NexmarkQuery8.java:247
  val Q5bThresholdMs: Long = 30 * 60 * 1000L     // NexmarkQuery5b.java:219

  /** CSV header mirroring the reference's schema shape
    * (NexmarkQuery5.java:304: timestamp,counter,series stats...).
    */
  val CsvHeader = "batchId,wallclock,series,count,mean,min,max,stddev"

  final class Stats extends Serializable {
    var count: Long = 0
    var sum: Double = 0
    var sumSq: Double = 0
    var min: Double = Double.MaxValue
    var max: Double = Double.MinValue
    def add(count2: Long, sum2: Double, sumSq2: Double, min2: Double, max2: Double): Unit = {
      count += count2; sum += sum2; sumSq += sumSq2
      min = math.min(min, min2); max = math.max(max, max2)
    }
    def mean: Double = if (count == 0) 0 else sum / count
    def stddev: Double =
      if (count < 2) 0
      else math.sqrt(math.max(0, (sumSq - sum * sum / count) / (count - 1)))
  }

  /** foreachBatch body: given a batch with creation/ingestion timestamp
    * columns, compute the two latency series of the measurement contract
    * (bid latency = now - lastTimestamp, flight time = now -
    * lastIngestionTimestamp; NexmarkQuery5.java:384-394) and append CSV.
    *
    * `now` is injectable (a fixed clock makes golden tests deterministic —
    * SURVEY §7.4.3).
    */
  def recordBatch(
      batch: DataFrame, batchId: Long, csvPath: String,
      creationCol: String, ingestionCol: String,
      now: () => Long = () => System.currentTimeMillis(),
      thresholdMs: Long = DefaultThresholdMs): Unit = {
    val nowMs = now()
    val series = Seq("creationToSink" -> creationCol, "flightTime" -> ingestionCol)
    val rows = series.flatMap { case (name, c) =>
      val lat = batch
        .select((lit(nowMs) - col(c)).cast("double").as("lat"))
        .filter(col("lat") >= 0 && col("lat") <= thresholdMs)
        .agg(count(lit(1)).as("n"), sum(col("lat")).as("s"),
             sum(col("lat") * col("lat")).as("s2"),
             min(col("lat")).as("mn"), max(col("lat")).as("mx"))
        .collect()(0)
      if (lat.getLong(0) == 0) None
      else {
        val st = new Stats
        st.add(lat.getLong(0), lat.getDouble(1), lat.getDouble(2), lat.getDouble(3), lat.getDouble(4))
        Some(f"$batchId,$nowMs,$name,${st.count},${st.mean}%.3f,${st.min}%.0f,${st.max}%.0f,${st.stddev}%.3f")
      }
    }
    if (rows.nonEmpty) appendCsv(csvPath, rows)
  }

  private def appendCsv(path: String, rows: Seq[String]): Unit = synchronized {
    val f = new File(path)
    val fresh = !f.exists()
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new PrintWriter(new FileWriter(f, true))
    try {
      if (fresh) w.println(CsvHeader)
      rows.foreach(w.println)
    } finally w.close()
  }

  /** Attach the latency sink to a streaming query result. */
  def writeLatencyCsv(df: DataFrame, csvPath: String, creationCol: String,
                      ingestionCol: String, checkpoint: String,
                      thresholdMs: Long = DefaultThresholdMs)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        recordBatch(batch.toDF(), batchId, csvPath, creationCol, ingestionCol,
                    thresholdMs = thresholdMs)
      }
}

/** K4: the generator's Kafka partitioner — MurmurHash3-32 (seed 104729),
  * mod partition count (generator/GeneratorPipeline.java:198-271). Public
  * murmur3 algorithm (Austin Appleby, public domain).
  *
  * DELIBERATE DIVERGENCE from the reference in the default path: the
  * reference hashes only the FIRST 4 bytes of the 8-byte big-endian key
  * (`hash32(key, 0, 4, 104729)` — i.e. the HIGH 32 bits of the id), which
  * degenerates to a single constant hash — one partition for everything —
  * whenever ids are < 2^32, as they are for every generator run that
  * matters. [[partitionFor]] therefore hashes all 8 key bytes; the
  * byte-exact reference behavior (4-byte hash, fmix length 4, negative
  * codes mapped via `-code`, MIN_VALUE → 0) is kept as
  * [[referencePartitionFor]] for fidelity tests and cross-checking.
  */
object Murmur3Partitioner {
  val Seed = 104729

  def partitionFor(key: Long, numPartitions: Int): Int =
    Math.floorMod(murmur3_32(key, Seed), numPartitions)

  /** Byte-exact port of the reference partitioner
    * (GeneratorPipeline.java:198-251): murmur3-32 over only the first 4
    * big-endian key bytes, `fmix(length=4)`, negatives mapped `-code`
    * (MIN_VALUE → 0), then Java `%` (non-negative by then). Degenerate for
    * ids < 2^32 — see object doc.
    */
  def referencePartitionFor(key: Long, numPartitions: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    // first 4 bytes of the big-endian 8-byte key, read as ONE
    // little-endian 4-byte block = bits 63..32 of the id
    var k1 = (((key >>> 56) & 0xff) | (((key >>> 48) & 0xff) << 8) |
      (((key >>> 40) & 0xff) << 16) | (((key >>> 32) & 0xff) << 24)).toInt
    k1 *= c1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= c2
    var h1 = Seed ^ k1
    h1 = Integer.rotateLeft(h1, 13) * 5 + 0xe6546b64
    h1 ^= 4 // length
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    val code = if (h1 >= 0) h1 else if (h1 != Int.MinValue) -h1 else 0
    code % numPartitions
  }

  /** murmur3 32-bit over the big-endian 8-byte encoding of `key`. */
  def murmur3_32(key: Long, seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    // two 4-byte little-endian blocks of the big-endian key bytes
    val bytes = java.nio.ByteBuffer.allocate(8).putLong(key).array()
    var i = 0
    while (i < 8) {
      var k1 = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    h1 ^= 8 // length
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }
}
