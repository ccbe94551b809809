package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native payload-byte kernels (VERDICT r9 Next #8): the per-byte work a
  * multimodal pipeline runs over every blob — previously expressed as a
  * hex-encode + per-digit HOF fold, which is cross-engine-portable but
  * INTERPRETED per hex digit (two lambda invocations per byte; fine at
  * stub payload sizes, the wrong shape for real media at 100 TB). These
  * expressions compute the identical integers in one compiled loop over
  * the raw binary, stay inside whole-stage codegen, and leave the DuckDB
  * oracles on the hex-fold formulation — same values, two independent
  * routes (plus the JDK Adler-32 spec pin on the stats).
  */

/** `payload_bytes(binary)` → array<bigint> of unsigned byte values —
  * the decode step feeding grid/fingerprint work ([[graft.queries
  * .TextPipeline.phashSig]]'s input). */
case class PayloadBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"payload_bytes requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "payload_bytes"
  override def nullSafeEval(input: Any): Any =
    PayloadBytes.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.PayloadBytes$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): PayloadBytes =
    copy(child = newChild)
}

object PayloadBytes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PayloadBytes].getName, null, "payload_bytes",
    "_FUNC_(bin) - unsigned byte values of a binary payload as array<bigint>.", "")
  def compute(bytes: Array[Byte]): GenericArrayData = {
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xffL; i += 1 }
    new GenericArrayData(out)
  }
}

/** `payload_stats(binary)` → struct(n_bytes, byte_sum, n_distinct_bytes,
  * wsum) — the [[graft.queries.TextPipeline.mediaByteStats]] integers
  * (wsum = Σ (n−i)·bᵢ over 0-based i, the Adler-32 B-term numerator) in
  * one compiled pass. */
case class PayloadStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"payload_stats requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("n_distinct_bytes", LongType, nullable = false),
    StructField("wsum", LongType, nullable = false)))
  override def prettyName: String = "payload_stats"
  override def nullSafeEval(input: Any): Any =
    PayloadStats.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.PayloadStats$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): PayloadStats =
    copy(child = newChild)
}

object PayloadStats {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PayloadStats].getName, null, "payload_stats",
    "_FUNC_(bin) - struct(n_bytes, byte_sum, n_distinct_bytes, wsum) of a binary payload.", "")
  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    var sum = 0L
    var wsum = 0L
    val seen = new Array[Boolean](256)
    var distinct = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      sum += b
      wsum += (n - i).toLong * b
      if (!seen(b)) { seen(b) = true; distinct += 1 }
      i += 1
    }
    InternalRow(n.toLong, sum, distinct, wsum)
  }
}

/** `channel_sigs(array<bigint>)` → array<bigint> — container-style parse
  * + strided per-channel signature, the shape real image/audio near-dup
  * needs (r10 VERDICT Next #7): a length-prefixed header declares the
  * layout, the body is channel-interleaved samples, and each channel gets
  * an independent 32-bit above-mean signature over a 32-bucket grid.
  *
  * Container contract (deterministic integers, shared verbatim with the
  * DuckDB oracle): header length H = 4 + (b₀ mod 4), channel count
  * C = (b₁ mod 3) + 1 (mono/stereo/RGB-ish), body = bytes[H..), channel
  * c = body positions ≡ c (mod C). Per channel: bucket k sums samples in
  * [k·m/32, (k+1)·m/32) (the exact integer bucket bounds of the pHash
  * grid); signature bit k is set iff the bucket's mean exceeds the
  * channel mean — compared as bucketSum·m > total·bucketLen, so no
  * engine ever divides. Payloads too short for the structure (fewer than
  * 2 header bytes, or body < 64·C) return an empty array — no channel
  * grid to hash, the pHash < 64-byte rule generalized.
  *
  * One compiled loop per blob (the per-channel bucket loops partition
  * the body, so total work is one pass), inside whole-stage codegen —
  * the DuckDB oracle recomputes the same integers through the hex-fold
  * + list-HOF route as the independent second implementation.
  */
case class ChannelSigs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"channel_sigs requires array<bigint> (payload_bytes output), got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "channel_sigs"
  override def nullSafeEval(input: Any): Any =
    ChannelSigs.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.ChannelSigs$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): ChannelSigs =
    copy(child = newChild)
}

object ChannelSigs {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ChannelSigs].getName, null, "channel_sigs",
    "_FUNC_(bytes) - per-channel 32-bit above-mean signatures of a " +
      "header-prefixed channel-interleaved payload.", "")
  private val Empty = new GenericArrayData(Array.empty[Long])
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < 2) return Empty
    val h = 4 + (arr.getLong(0) % 4).toInt
    val c = (arr.getLong(1) % 3).toInt + 1
    val bodyLen = n - h
    if (bodyLen < 64L * c) return Empty
    val sigs = new Array[Long](c)
    var ch = 0
    while (ch < c) {
      // samples of channel ch: body[j*C + ch], j = 0 .. m-1
      val m = (bodyLen - ch + c - 1) / c
      var total = 0L
      val bsum = new Array[Long](32)
      var k = 0
      while (k < 32) {
        val start = k.toLong * m / 32
        val end = (k + 1).toLong * m / 32
        var j = start
        while (j < end) {
          bsum(k) += arr.getLong(h + (j * c).toInt + ch)
          j += 1
        }
        total += bsum(k)
        k += 1
      }
      var sig = 0L
      k = 0
      while (k < 32) {
        val blen = (k + 1).toLong * m / 32 - k.toLong * m / 32
        if (bsum(k) * m > total * blen) sig |= 1L << k
        k += 1
      }
      sigs(ch) = sig
      ch += 1
    }
    new GenericArrayData(sigs)
  }
}
