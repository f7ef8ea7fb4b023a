package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite the declarative MinHash agreement
  * estimate
  *
  *   size(filter(zip_with(a, b, (x, y) => x === y), e => e)) / size(a)
  *
  * into the codegen'd [[SigAgree]] native. Higher-order-function lambdas
  * are interpreted per element (no whole-stage codegen), so on a
  * 256-long signature this chain costs ~3 boxed lambda dispatches per
  * position per candidate pair; the native is one fused loop. Queries
  * keep the declarative [[graft.functions.Hashes.minhashJaccard]] shape
  * (which the DuckDB oracle mirrors) and the engine swaps in the fast
  * path — the textbook use of `injectOptimizerRule`
  * ([[GraftExtensions]]).
  *
  * Safety: [[NativeImpl.sigAgreeFrac]] reproduces the HOF semantics
  * bit-for-bit including ragged lengths (zip_with pads with null; null
  * never equals) and null elements, and the rewrite only fires on
  * ArrayType(LongType) inputs, so it is unconditionally
  * semantics-preserving.
  */
object RewriteMinHashAgreement extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other => other
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def sameVar(a: Expression, b: Expression): Boolean = (a, b) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable) => x.exprId == y.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan transformAllExpressions {
      // r20 review: only a DOUBLE division is replaced — a decimal-typed
      // match would swap in the DoubleType SigAgree and change a
      // resolved plan's schema from inside the optimizer. The
      // empty-array edge (NULL off ANSI, DIVIDE_BY_ZERO under ANSI —
      // Spark 4's default) is replicated INSIDE SigAgree, which captures
      // the session's ANSI mode at plan build exactly like Divide's own
      // evalMode, so the rewrite stays semantics-preserving in both
      // modes.
      case d @ Divide(num, den, _) if d.dataType == DoubleType =>
        (stripCast(num), stripCast(den)) match {
          case (
            Size(
              ArrayFilter(
                ZipWith(a, b,
                  LambdaFunction(EqualTo(x, y), Seq(v1, v2), _)),
                LambdaFunction(idBody, Seq(idVar), _)),
              _),
            Size(denArr, _))
            if isLongArray(a) && isLongArray(b) &&
              sameVar(idBody, idVar) &&
              ((sameVar(x, v1) && sameVar(y, v2)) ||
                (sameVar(x, v2) && sameVar(y, v1))) &&
              (denArr.semanticEquals(a) || denArr.semanticEquals(b)) =>
            // sigAgreeFrac divides by its FIRST argument's length — put
            // the denominator's array first.
            if (denArr.semanticEquals(a)) SigAgree(a, b) else SigAgree(b, a)
          case _ => d
        }
    }
}
