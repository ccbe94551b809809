package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 32-bit SimHash over a word array: one fused pass per document.
  *
  * Replaces the declarative pipeline `explode(words) → md5 → 8 nibble
  * projections → 32 SUM(CASE) aggregate slots → sign fold`, which pays an
  * explode (|tokens| rows), a 32-column hash aggregation, and a shuffle
  * keyed on doc_id. This kernel keeps the whole signature computation
  * inside the row's projection — the signature stage becomes a narrow map
  * with NO shuffle at all, which is the shape that matters when the
  * corpus is 10 TB and |tokens| ≈ 10¹².
  *
  * Arithmetic is bit-for-bit the declarative/oracle formulation
  * (TextPipeline.simhashBitSql / nibbleSql): per word, nibble i is hex
  * digit i of the md5 hex string (i < 8, i.e. the first 4 digest bytes:
  * even i = high nibble of byte i/2, odd i = low nibble); bit k draws bit
  * (k mod 4) of nibble (k div 4), contributing +1/-1; the signature sets
  * 2^k exactly when the k-th sum is > 0. Word MULTIPLICITY counts (no
  * dedup), matching the exploded aggregation.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires an array<string> argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.SimHash32$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash32].getName, null, "simhash32",
    "_FUNC_(words) - 32-bit SimHash of the word multiset (md5-nibble bit source).", "")

  /** Called from generated code. A null word element contributes -1 to
    * every bit sum — exactly what the declarative `SUM(CASE WHEN <null
    * condition> THEN 1 ELSE -1)` yields for a null md5, so the kernel
    * stays bit-identical even on inputs the fixtures never produce. */
  def compute(words: ArrayData): Long = {
    val md = Digests.md5.get()
    val sums = new Array[Int](32)
    val n = words.numElements()
    var w = 0
    while (w < n) {
      val word = words.getUTF8String(w)
      if (word == null) {
        var k = 0
        while (k < 32) { sums(k) -= 1; k += 1 }
      } else {
        md.reset()
        val d = md.digest(word.getBytes)
        // nibbles 0..7 = the first 4 digest bytes, high nibble first
        var k = 0
        while (k < 32) {
          val i = k >> 2
          val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf else d(i >> 1) & 0xf
          sums(k) += (if (((nib >> (k & 3)) & 1) == 1) 1 else -1)
          k += 1
        }
      }
      w += 1
    }
    var sig = 0L
    var k = 0
    while (k < 32) {
      if (sums(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }
}
