package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Strips the redundant filter Catalyst infers below a non-outer
  * `explode`/`posexplode`/`inline` when the generator input is an
  * EXPENSIVE computed expression.
  *
  * `InferFiltersFromGenerate` plants `size(e) > 0 AND isnotnull(e)`
  * under every Generate so row-dropping can happen early. That is sound
  * — a non-outer explode of a NULL or empty collection emits nothing —
  * but when the generator input is a computed column, predicate
  * pushdown then substitutes the FULL defining expression into the
  * inferred condition and carries it below the projection that computes
  * the column. Net effect on this engine's hottest map-side path
  * (tokenize → shingle → explode): every row evaluates the complete
  * split→clean→filter→shingle tree once inside the inferred Filter and
  * once inside the Project — the r13 audit measured the filter roughly
  * DOUBLING the map-side work of `q_top_boilerplate`, and the same
  * shape sat in `q_dedup_minhash`, `q_bigram_lm` (both scans) and
  * `q_chunk_docs`. The filter buys nothing there: explode already
  * drops those rows, and a non-column predicate can never prune at the
  * parquet scan.
  *
  * The rule walks from each non-outer Generate down through its
  * deterministic Project chain, rebinding the generator input through
  * each project's aliases (the same substitution pushdown performed),
  * and removes exactly the conjuncts that restate "the collection
  * explodes to nothing":
  *
  *  - `size(e) > 0` / `0 < size(e)` with `e` ≡ the rebound input,
  *  - `isnotnull(e)` with `e` ≡ the rebound input,
  *  - the NullPropagation-rewritten form of `isnotnull` over a
  *    CASE-shaped input: `CASE WHEN p THEN true ELSE isnotnull(b) END`
  *    where the input is `CASE WHEN p THEN <literal> ELSE b END`
  *    (the `q_chunk_docs` shape).
  *
  * Removal is semantics-preserving for `outer = false` generators:
  * every row the dropped conjunct would have filtered produces zero
  * generate output anyway; the intervening projects are deterministic,
  * so evaluating them on those soon-dropped rows changes nothing.
  *
  * CHEAP inputs are left alone: when the rebound input is still a bare
  * attribute (or a struct-field path over one), the inferred filter
  * evaluates in nanoseconds and can push into the scan as a real
  * data-skipping predicate — stripping it would trade a free prune for
  * nothing. The rule only fires where the filter re-derives real work.
  *
  * Injected via [[graft.GraftExtensions]] into the operator-optimization
  * batches, which run to fixed point AFTER the once-only "Infer Filters"
  * batch — so the rule sees the post-pushdown shape and nothing re-adds
  * the filter afterwards.
  */
object PruneInferredGenerateFilter extends Rule[LogicalPlan] with PredicateHelper with AliasHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case g @ Generate(gen, _, false, _, _, child) =>
      generatorInput(gen)
        .flatMap(strip(child, _))
        .map(nc => g.copy(child = nc))
        .getOrElse(g)
  }

  /** The collection the generator iterates — the expression the inferred
    * filter restates. Only the generator classes `InferFiltersFromGenerate`
    * itself covers.
    */
  private def generatorInput(g: Generator): Option[Expression] = g match {
    case e: ExplodeBase => Some(e.child)
    case i: Inline      => Some(i.child)
    case _              => None
  }

  /** Cheap = evaluating the inferred condition costs ~nothing AND the
    * predicate may reach the scan as a data-skipping filter. Matches the
    * attribute / extract-value chains pushdown can actually use.
    */
  private def cheap(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case ev: ExtractValue          => cheap(ev.children.head)
    case _                         => false
  }

  /** Walk the deterministic Project chain below a Generate, rebinding
    * `target` through each alias map; at the first Filter containing
    * redundant conjuncts, drop them (dropping the node when nothing
    * remains). Returns None when there is nothing to strip.
    */
  private def strip(plan: LogicalPlan, target: Expression): Option[LogicalPlan] = plan match {
    case p: Project if p.projectList.forall(_.deterministic) =>
      strip(p.child, replaceAlias(target, getAliasMap(p))).map(nc => p.copy(child = nc))
    case f @ Filter(cond, fchild) if !cheap(target) =>
      val (drop, keep) = splitConjunctivePredicates(cond).partition(restatesNonEmpty(_, target))
      if (drop.isEmpty) strip(fchild, target).map(nc => f.copy(child = nc))
      else Some(keep match {
        case Nil => fchild
        case ks  => Filter(ks.reduce(And), fchild)
      })
    case _ => None
  }

  /** Does conjunct `c` merely restate "`target` is a non-null, non-empty
    * collection" — i.e. exactly what a non-outer generator enforces by
    * emitting zero rows?
    */
  private def restatesNonEmpty(c: Expression, target: Expression): Boolean = c match {
    case GreaterThan(s: Size, IntegerLiteral(0)) => s.child.semanticEquals(target)
    case LessThan(IntegerLiteral(0), s: Size)    => s.child.semanticEquals(target)
    case IsNotNull(e)                            => e.semanticEquals(target)
    // NullPropagation turns isnotnull(CASE WHEN p THEN <non-null literal>
    // ELSE b END) into CASE WHEN p THEN true ELSE isnotnull(b) END
    case CaseWhen(Seq((p, Literal.TrueLiteral)), Some(IsNotNull(b))) =>
      target match {
        case CaseWhen(Seq((p2, _)), Some(b2)) =>
          p.semanticEquals(p2) && b.semanticEquals(b2)
        case _ => false
      }
    case _ => false
  }
}
