package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.VecDot

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.VecDot]] kernel — the
  * `Rule[LogicalPlan]` face of the extension layer ([[GraftExtensions]]
  * injects it), so query authors keep writing the portable builtin
  * formulation (`Ann.dot`) and a cluster that enables the extension gets
  * the fused primitive loop without any code change.
  *
  * The rewrite fires only on the EXACT semantic match, where VecDot is
  * bit-identical to the HOF fold (VecDotSpec parity):
  *  - zip_with lambda is a bare `x * y` over the two lambda variables,
  *    modulo element casts to double (VecDot accumulates in double);
  *  - both inputs are array<float> or array<double> with EQUAL element
  *    types (mixed widths keep the builtin: VecDot type-checks same-type);
  *  - the zero is literal 0.0 and the merge a bare `acc + v`, so the fold
  *    order matches VecDot's left-to-right loop;
  *  - the finish lambda is the identity.
  *
  * Null semantics are identical by construction (null array/element or
  * length mismatch → null on both paths), so the swap is safe anywhere
  * in any plan. Perf verdict stays the honest one from VecDot's
  * scaladoc: parity-to-modest gains at d≈64 where join machinery
  * dominates; the rule exists so the kernel arrives for free where
  * per-element cost does dominate (wide vectors, fused kernels).
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  /** The lambda variable itself, or its cast to double. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  /** A multiply operand, precision-aware: for double elements the bare
    * variable is fine (the HOF already multiplies in double), but for
    * FLOAT elements a bare `x * y` multiplies in float — each product
    * rounds to float (and can overflow to Inf) before the double fold —
    * while VecDot widens BOTH operands first. Requiring the explicit
    * Cast-to-double on float operands keeps the rewrite bit-identical
    * (Ann.dot emits the casts; a bare float multiply keeps the builtin).
    */
  private def isMulVar(e: Expression, v: NamedLambdaVariable,
                       elemIsDouble: Boolean): Boolean = e match {
    case nv: NamedLambdaVariable => elemIsDouble && nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  private def sameNumericElem(a: Expression, b: Expression): Boolean =
    (a.dataType, b.dataType) match {
      case (ArrayType(x @ (FloatType | DoubleType), _), ArrayType(y, _)) => x == y
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(xe, ye, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero @ Literal(_, DoubleType),
            LambdaFunction(Add(ae, ve, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fe: NamedLambdaVariable,
              Seq(f: NamedLambdaVariable), _))
          // bit-pattern check, not ==: Scala's boxed == says -0.0 == 0.0,
          // but a -0.0 zero is NOT bit-identical to VecDot's +0.0
          // accumulator on empty arrays (string/hash consumers diverge)
          if zero.value != null &&
            java.lang.Double.doubleToRawLongBits(
              zero.value.asInstanceOf[Double]) == 0L && {
            val dbl = a.dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }
            isMulVar(xe, x, dbl) && isMulVar(ye, y, dbl) ||
              isMulVar(xe, y, dbl) && isMulVar(ye, x, dbl)
          } &&
            (isVar(ae, acc) && isVar(ve, v) || isVar(ae, v) && isVar(ve, acc)) &&
            fe.exprId == f.exprId &&
            sameNumericElem(a, b) =>
        VecDot(a, b)
    }
}
