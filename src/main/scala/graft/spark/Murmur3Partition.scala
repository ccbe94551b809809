package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native murmur3 topic-partition router: `murmur3_partition(key, n)` =
  * floorMod(murmur3_32(bigEndianBytes(key), seed=104729), n) — the
  * partition column of the Kafka/file producer path
  * (reference: GeneratorPipeline.java:198-251's custom partitioner; see
  * [[graft.nexmark.sink.Murmur3Partitioner]] for the full-key-vs-4-byte
  * divergence note and the byte-exact reference port).
  *
  * As a Catalyst expression the partition assignment lives INSIDE the
  * producer's whole-stage-codegen'd projection — auditable in the plan
  * and fused with the rest of the row pipeline, instead of hiding in an
  * opaque per-record lambda (SURVEY §9.8.3). SQL-callable, so a pure-SQL
  * producer can route identically.
  */
case class Murmur3Partition(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"murmur3_partition requires (bigint, int), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "murmur3_partition"

  override def nullSafeEval(key: Any, n: Any): Any =
    Murmur3Partition.compute(key.asInstanceOf[Long], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) => s"graft.spark.Murmur3Partition$$.MODULE$$.compute($k, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Murmur3Partition =
    copy(left = newLeft, right = newRight)
}

object Murmur3Partition {
  val Seed = 104729

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Murmur3Partition].getName, null, "murmur3_partition",
    "_FUNC_(key, n) - murmur3-32 (seed 104729) of the big-endian key bytes, floor-mod n.", "")

  /** Called from generated code. */
  def compute(key: Long, numPartitions: Int): Int =
    Math.floorMod(murmur3_32(key, Seed), numPartitions)

  /** murmur3 32-bit over the big-endian 8-byte encoding of `key`
    * (two little-endian 4-byte blocks, standard tail-free x86_32 layout).
    */
  def murmur3_32(key: Long, seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
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
