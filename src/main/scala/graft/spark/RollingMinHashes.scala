package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel: the `k` smallest Rabin-Karp rolling hashes of
  * every `window`-char substring, ascending (duplicates kept — identical
  * to `slice(array_sort(hashes), 1, k)` over the full hash array).
  *
  * The declarative formulation materializes a char-code array, builds the
  * full per-window hash array with a `transform` lambda (higher-order
  * functions evaluate their lambda interpreted, per element), then sorts
  * it — O(len·w) interpreted work + an O(len log len) sort per document.
  * This expression is one fused codegen'd pass: O(1) rolling update per
  * position (subtract the outgoing char's 31^(w-1) term, multiply, add)
  * and an insertion-maintained k-array for the minima — O(len + hits·k).
  *
  * Arithmetic is exact int64 (127·Σ31^j < 2^53 for w = 8), so the values
  * equal the direct Σ codes[i+j]·31^(w-1-j) polynomial both engines
  * compute — the DuckDB oracle keeps the declarative formulation.
  *
  * Input contract (ENFORCED where checkable): `window` is bounded to
  * [[RollingMinHashes.MaxWindow]] (= 10) at analysis time — the largest
  * width for which the polynomial 255·Σ_{j<w}31^j ≈ 6.97e15 stays below
  * 2^53, so the kernel's int64 values equal what an engine computing the
  * same polynomial in DOUBLE (the DuckDB-oracle formulation) produces,
  * for every byte value. The remaining caveat is data-dependent and only
  * documented: the kernel hashes UTF-8 BYTES, so non-ASCII text hashes
  * per byte rather than per code point (diverging from a per-character
  * `ascii(c)` formulation). The normalized-text column (`[a-z0-9 ]`)
  * guarantees ASCII, where bytes == code points.
  */
case class RollingMinHashes(child: Expression, window: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window > 0 && window <= RollingMinHashes.MaxWindow && k > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType if window > RollingMinHashes.MaxWindow => TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hashes window must be <= ${RollingMinHashes.MaxWindow} " +
        "(larger windows overflow the exact-arithmetic bound 255*sum(31^j) < 2^53 " +
        "that keeps the hash values identical across int64 and double engines)")
    case StringType => TypeCheckResult.TypeCheckFailure(
      "rolling_min_hashes requires positive window and k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hashes requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_min_hashes"

  override def nullSafeEval(input: Any): Any =
    RollingMinHashes.compute(input.asInstanceOf[UTF8String], window, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.spark.RollingMinHashes$$.MODULE$$.compute($c, $window, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHashes =
    copy(child = newChild)
}

object RollingMinHashes {
  /** Largest window for which 255·Σ_{j<w}31^j < 2^53 (see class doc). */
  val MaxWindow: Int = 10

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingMinHashes].getName, null, "rolling_min_hashes",
    "_FUNC_(s, window, k) - k smallest rolling 31-polynomial hashes of " +
      "window-char substrings, ascending. Contract: window <= 10 (exact-" +
      "arithmetic bound, enforced); hashes UTF-8 bytes, so non-ASCII text " +
      "hashes per byte, not per code point — normalize to ASCII first.", "")

  def compute(s: UTF8String, window: Int, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val count = n - window + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L
    var j = 1
    while (j < window) { pow *= 31L; j += 1 } // 31^(window-1)
    val size = math.min(k, count)
    val top = Array.fill(k)(Long.MaxValue)
    var h = 0L
    var i = 0
    while (i < n) {
      val c = (bytes(i) & 0xff).toLong
      h = if (i < window) h * 31L + c
          else (h - (bytes(i - window) & 0xffL) * pow) * 31L + c
      if (i >= window - 1 && h < top(k - 1)) {
        // insertion keeps duplicates and ascending order (multiset top-k)
        var p = k - 1
        while (p > 0 && top(p - 1) > h) { top(p) = top(p - 1); p -= 1 }
        top(p) = h
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(top, size))
  }
}
