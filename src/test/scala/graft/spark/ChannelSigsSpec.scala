package graft.spark

import graft.nexmark.SparkSpec
import org.apache.spark.sql.functions.{call_function, col}

/** Unit pins for the container-parse kernel (`channel_sigs`): the
  * header/stride/grid arithmetic against an independent in-test
  * reimplementation across every layout class (1..3 channels × header
  * lengths 4..7), the degenerate-input gates, and the codegen span.
  */
class ChannelSigsSpec extends SparkSpec {

  /** Independent reimplementation of the container contract (kept
    * deliberately index-naive — filter/slice per channel — where the
    * kernel strides one compiled pass). */
  private def ref(bs: Array[Long]): Seq[Long] = {
    if (bs.length < 2) return Seq.empty
    val h = 4 + (bs(0) % 4).toInt
    val c = (bs(1) % 3).toInt + 1
    val bodyLen = bs.length - h
    if (bodyLen < 64L * c) return Seq.empty
    (0 until c).map { ch =>
      val samples = (0 until bodyLen).filter(_ % c == ch).map(i => bs(h + i))
      val m = samples.length
      val total = samples.sum
      (0 until 32).foldLeft(0L) { (sig, k) =>
        val s0 = (k.toLong * m / 32).toInt
        val e0 = ((k + 1).toLong * m / 32).toInt
        val bsum = samples.slice(s0, e0).sum
        if (bsum * m > total * (e0 - s0)) sig | (1L << k) else sig
      }
    }
  }

  test("channel_sigs equals the naive parse across all header/channel layouts") {
    import spark.implicits._
    // every (header length, channel count) combination plus degenerates:
    // too short for a header, and long enough for C=1 but not C=3
    val cases: Seq[(Long, Array[Long])] =
      (for (b0 <- 0 to 3; b1 <- 0 to 2) yield {
        val id = (b0 * 3 + b1 + 1).toLong
        val body = Array.tabulate(400)(i => ((i * 37 + i * i % 11 + b0 + b1) % 256).toLong)
        (id, Array(b0.toLong, b1.toLong) ++ body)
      }) ++ Seq(
        (100L, Array(1L)),                                        // no header
        (101L, Array(0L, 2L) ++ Array.tabulate(100)(_.toLong)),   // C=3, body 100 < 192
        (102L, Array(0L, 0L) ++ Array.tabulate(70)(_.toLong)))    // C=1, body 70 >= 64
    val out = cases.toDF("id", "bs")
      .select(col("id"), call_function("channel_sigs", col("bs")).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, bs) <- cases) {
      assert(out(id) == ref(bs), s"case $id: kernel ${out(id)} != ref ${ref(bs)}")
    }
    // the two degenerate classes really are empty, the minimal C=1 isn't
    assert(out(100L).isEmpty && out(101L).isEmpty && out(102L).nonEmpty)
    // layout coverage: the 12 structured cases span sig-array lengths 1..3
    assert((for (b1 <- 0 to 2) yield out((b1 + 1).toLong).size).toSet == Set(1, 2, 3))
  }

  test("channel_sigs stays inside whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("channel_sigs(payload_bytes(cast(text as binary))) AS sigs")
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [channel_sigs"), plan)
    val n = df.filter("size(sigs) > 0").count()
    assert(n > 0, "no payload parsed — fixture degenerate for the container layout")
  }
}
