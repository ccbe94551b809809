package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MD5 → four unsigned 32-bit words, for MinHash signatures
  * (SURVEY §9.8.1).
  *
  * The MinHash hash family needs K independent hashes per shingle. The
  * declarative formulation computed K separate `md5("<i>:" || sh)` hex
  * strings and took `min(string)` per signature slot — K full MD5 passes
  * per shingle AND a SortAggregate fallback (no partial-agg-friendly
  * `min` on strings of that shape in practice). This expression computes
  * ONE MD5 and exposes the digest as 4 big-endian unsigned 32-bit words
  * (`array<bigint>`, values in [0, 2^32)); the K family members are then
  * cheap linear mixes `w1*a_i + w2*b_i + w3*c_i + w4` (max < 2^40, no
  * overflow in any engine), and the aggregation is `min(bigint)` — a
  * HashAggregate with map-side partial aggregation.
  *
  * The word values equal parsing the md5 hex string 8 chars at a time
  * (word j = hex chars [8j, 8j+8) as an unsigned big-endian int), so any
  * engine with an `md5` hex function can reproduce them exactly — the
  * DuckDB oracle parses the same words with a digit fold.
  */
case class Md5Words(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_words requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_words"

  override def nullSafeEval(input: Any): Any =
    Md5Words.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.Md5Words$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Words =
    copy(child = newChild)
}

object Md5Words {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5Words].getName, null, "md5_words",
    "_FUNC_(s) - the md5 digest of s as 4 big-endian unsigned 32-bit words.", "")

  /** Called from generated code: one MD5, digest split into 4 unsigned
    * big-endian 32-bit words. */
  def compute(s: UTF8String): GenericArrayData = {
    val md = Digests.md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val words = new Array[Long](4)
    var j = 0
    while (j < 4) {
      words(j) = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
        ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
      j += 1
    }
    new GenericArrayData(words)
  }
}
