package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native ROW-WISE MinHash-LSH band keys over a token set: one fused pass
  * from `array<string>` tokens to the `NumBands` band-key strings —
  * md5 per token ([[Md5Words]] word split), the `NumHashes` linear-mix
  * family members with a running min each, then md5 over the per-band
  * `"sig:sig"` decimal concatenation.
  *
  * This is the streaming ingest guard's hot path
  * (`StreamingBench.streamIncrementalNearDup`): the declarative chain
  * (`transform(toks, md5_words)` → 12 × `array_min(transform(...))` →
  * 6 × `md5(concat_ws(...))`) evaluates its higher-order lambdas
  * INTERPRETED per element and allocates the intermediate word/signature
  * arrays per row — measured 6× the exact-dedup twin's wall-clock at the
  * same volume. The kernel's values are bit-identical to that chain (and
  * to the aggregated [[graft.queries.TextPipeline]] formulation on equal
  * token sets): same digest words, same mix constants — [[MinHashBands]]
  * OWNS the constants and TextPipeline derives its column/SQL generators
  * from them, so the two can never drift.
  */
case class MinHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.MinHashBands$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  /** The MinHash family constants — single-sourced here; TextPipeline's
    * aggregated Spark columns and DuckDB SQL are generated FROM these.
    * Family member i over md5 words (w1..w4):
    * `(w1*k(i,0) + w2*k(i,1) + w3*k(i,2) + w4*k(i,3)) mod P_i` — varied
    * 16-bit odd coefficients (Knuth multiplicative mix) and a distinct
    * ~2^30 prime modulus per member (sums ≤ 2^50 pre-mod, exact int64).
    */
  val NumHashes = 12
  val NumBands = 6
  val RowsPerBand: Int = NumHashes / NumBands
  def mixK(i: Int, slot: Int): Long =
    ((((i * 4 + slot + 1) * 2654435761L) >>> 13) & 0xFFFF) | 1L
  val MixP: Array[Long] = Array(1000000007L, 1000000009L, 1000000021L, 1000000033L,
    1000000087L, 1000000093L, 1000000097L, 1000000103L,
    1000000123L, 1000000181L, 1000000207L, 1000000223L)

  private val K0 = Array.tabulate(NumHashes)(mixK(_, 0))
  private val K1 = Array.tabulate(NumHashes)(mixK(_, 1))
  private val K2 = Array.tabulate(NumHashes)(mixK(_, 2))
  private val K3 = Array.tabulate(NumHashes)(mixK(_, 3))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashBands].getName, null, "minhash_bands",
    s"_FUNC_(toks) - the $NumBands LSH band-key md5 strings of the " +
      s"$NumHashes-member MinHash signature over a token set.", "")

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Called from generated code: one fused pass, no intermediate arrays
    * beyond the signature accumulator. Empty/null-element-free contract:
    * a null token would NPE — callers pass constructed token arrays. */
  def compute(toks: ArrayData): GenericArrayData = {
    val md = Digests.md5.get()
    val n = toks.numElements()
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(t).getBytes)
      val w1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val w2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) | ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val w3 = ((d(8) & 0xffL) << 24) | ((d(9) & 0xffL) << 16) | ((d(10) & 0xffL) << 8) | (d(11) & 0xffL)
      val w4 = ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) | ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
      var i = 0
      while (i < NumHashes) {
        val h = (w1 * K0(i) + w2 * K1(i) + w3 * K2(i) + w4 * K3(i)) % MixP(i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    val out = new Array[UTF8String](NumBands)
    var b = 0
    while (b < NumBands) {
      val sb = new java.lang.StringBuilder(24)
      var r = 0
      while (r < RowsPerBand) {
        if (r > 0) sb.append(':')
        sb.append(sig(b * RowsPerBand + r))
        r += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexDigits(d(j) & 0xf)
        j += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }
}
