package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two double arrays (companion to [[CosineSim]]):
  * one fused codegen loop instead of the zip_with+aggregate higher-order
  * composition (which allocates an intermediate array and evaluates three
  * lambdas per row).
  *
  * Null semantics deliberately mirror that HOF idiom EXACTLY, because this
  * expression is the target of [[RewriteDotProduct]] and the rewrite must
  * be semantics-preserving for every input:
  *   - `zip_with` null-pads the shorter array, the pad multiplies to a
  *     null element, and `aggregate`'s `acc + v` absorbs it → ragged
  *     lengths yield NULL (not a min-length sum, not an error);
  *   - any null element within the common length likewise yields NULL.
  * (Contrast [[CosineSim]], our user-facing API function, which is
  * length-strict and errors loudly — it is not a rewrite target.)
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // can return null even for non-null inputs (ragged / null elements)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProduct].getName, null, "dot_product",
    "_FUNC_(a, b) - dot product of two double arrays.", "")
}

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native [[DotProduct]] expression. Users (and our own earlier
  * query revisions) write the HOF composition because it's the documented
  * Spark pattern; this rule gives them the fused-loop plan without a code
  * change — the "compose built-ins, add a Rule when the plan isn't the one
  * you want" path of SURVEY §7.3.
  *
  * The match is deliberately narrow: exact multiply/add lambda shapes over
  * the lambda variables, double zero, identity finish — anything else is
  * left untouched. The rewrite is semantics-preserving for EVERY input
  * (ragged lengths, null elements, null arrays) because [[DotProduct]]
  * reproduces the idiom's null semantics exactly — see its scaladoc.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(acc1: NamedLambdaVariable, v1: NamedLambdaVariable, _),
              Seq(acc2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
          if zero.foldable && zero.eval() == 0.0 &&
            sameVars(x1, y1, x2, y2) && sameVars(acc1, v1, acc2, v2) &&
            fin.exprId == fin2.exprId =>
        DotProduct(a, b)
    }

  /** The multiply/add operands are exactly the two lambda parameters (in
    * either order). */
  private def sameVars(l: NamedLambdaVariable, r: NamedLambdaVariable,
                       p1: NamedLambdaVariable, p2: NamedLambdaVariable): Boolean =
    Set(l.exprId, r.exprId) == Set(p1.exprId, p2.exprId)
}
