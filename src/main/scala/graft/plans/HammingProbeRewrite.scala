package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule — the operator-preference-order case for a
  * `Rule[LogicalPlan]`: a join whose predicate is a Hamming-radius-1
  * bucket match
  *
  *   `bit_count(a XOR b) <= 1`
  *
  * has no equi-join key, so Spark plans it as a nested-loop join — a
  * full scan of one side per row of the other, the exact plan that
  * killed the naive multi-probe LSH at scale (VectorOps.q_ann_lsh
  * round-1). But Hamming(a,b) ≤ 1 ⟺ b ∈ {a} ∪ {a ⊕ 2ʲ}, so the
  * predicate IS an equi-join against an enumerated probe set. This rule
  * rewrites the join automatically: the RIGHT side is exploded into
  * its (width+1) probe values and the join becomes `a = probe` — a hash
  * join whose expanded side grows 65× (long) / 33× (int) while the scan
  * of the other side drops from O(n·m) to O(n). Put the small
  * (broadcastable) side on the right, the DF-API LSH idiom.
  *
  * Scope: INNER joins, radius exactly 1, integral bucket types; extra
  * conjuncts in the condition are preserved. Registered via
  * [[GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  *
  * Semantics note: a NULL bucket produces NULL probes, and `a = NULL`
  * never matches — identical to `bit_count(NULL) <= 1` being NULL in
  * the original predicate.
  */
object HammingProbeRewrite extends Rule[LogicalPlan] {

  private val ProbeName = "__hamming_probe"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      conjuncts.zipWithIndex.collectFirst {
        case (HammingRadius1(x, y), i)
            if sides(x, y, left, right).isDefined =>
          (i, sides(x, y, left, right).get)
      } match {
        case Some((i, (keep, probeSrc))) =>
          val rest = conjuncts.patch(i, Nil, 1)
          val (probedChild, probeAttr) = explodeProbes(right, probeSrc)
          val eq = EqualTo(keep, probeAttr)
          val newCond = (eq +: rest).reduce(And)
          val newJoin = Join(left, probedChild, Inner, Some(newCond), hint)
          // project the probe column away so output matches the original
          Project(j.output, newJoin)
        case None => j
      }
  }

  /** Matches `bit_count(x ^ y) <= 1` / `1 >= bit_count(x ^ y)`. */
  private object HammingRadius1 {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(BitwiseCount(BitwiseXor(x, y)), Literal(1, IntegerType)) =>
        Some((x, y))
      case GreaterThanOrEqual(Literal(1, IntegerType), BitwiseCount(BitwiseXor(x, y))) =>
        Some((x, y))
      case _ => None
    }
  }

  /** Resolves which xor operand binds to which join side; returns
    * (kept expression, probed expression). The RIGHT side is ALWAYS
    * the one expanded — the DF-API LSH idiom places the small
    * (broadcastable) probe side there, and callers who want the other
    * orientation swap the join inputs; a predicate whose operands both
    * bind to one side is not a join key and is left untouched. */
  private def sides(x: Expression, y: Expression,
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression)] = {
    def in(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet) &&
        e.deterministic && integral(e)
    if (in(x, left) && in(y, right)) Some((x, y))
    else if (in(y, left) && in(x, right)) Some((y, x))
    else None
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Wraps `child` in a Generate exploding the probe set of `b`:
    * [b, b ⊕ 2⁰, …, b ⊕ 2^(width−1)]. */
  private def explodeProbes(child: LogicalPlan, b: Expression)
      : (LogicalPlan, Attribute) = {
    val flips = b.dataType match {
      case LongType =>
        (0 until 64).map(j => BitwiseXor(b, Literal(1L << j)))
      case IntegerType =>
        (0 until 32).map(j => BitwiseXor(b, Literal(1 << j)))
      case t => throw new IllegalStateException(s"unexpected bucket type $t")
    }
    val gen = Explode(CreateArray(b +: flips))
    val probeAttr = AttributeReference(ProbeName, b.dataType, nullable = true)()
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(probeAttr), child = child),
      probeAttr)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
