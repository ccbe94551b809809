package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-gram shingles: `words` → the set of
  * space-joined n-word shingles, first-occurrence order.
  *
  * Replaces the declarative
  * `array_distinct(transform(sequence(1, size(words)-n+1), i ->
  * concat(element_at(words, i), ' ', ...)))` whose lambda evaluates
  * interpreted per shingle (higher-order functions don't codegen their
  * lambda bodies). One fused pass: UTF8String concat + a LinkedHashSet
  * for distinctness.
  *
  * Shingle ORDER never reaches a query result (signatures take mins over
  * the set, Jaccard takes intersection sizes), so the first-occurrence
  * order only needs to be deterministic, not oracle-matched. Null word
  * elements are rejected with an error (normalized-text `split` never
  * produces them; silently skipping them would misform shingles).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      "word_shingles requires a positive shingle size")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires an array<string> argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.WordShingles$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordShingles].getName, null, "word_shingles",
    "_FUNC_(words, n) - distinct space-joined n-word shingles, first-occurrence order.", "")

  private val Space = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): GenericArrayData = {
    val len = words.numElements()
    val count = len - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.min(count, 1024))
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) {
        val w = words.getUTF8String(i + j)
        if (w == null) throw new IllegalArgumentException(
          s"word_shingles: null word element at index ${i + j}")
        parts(j) = w
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
