package graft.guard

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._

/** Static temporal-leakage validator (north rule: "strict
  * features-only-from <= ts" — every reference frame ends at the
  * current row, silver_and_gold.py:95-97).
  *
  * Walks the analyzed logical plan and rejects any window expression
  * whose frame can see the future: an upper bound of `Following` /
  * `UnboundedFollowing`, or a `lead()` (equivalently a negative-offset
  * `lag()`, which Spark analyzes into a positive-offset frame).
  * Columns registered as *labels* are exempt — label derivation is the
  * one place reading the future is legitimate
  * ([[graft.datasets.DatasetBuilder]]).
  *
  * This is layer 2 of the three-layer guard (SURVEY.md §4.4):
  * constructive trailing-only DSL, this static check, and the
  * truncation property test (LeakagePropertySpec).
  */
object LeakageGuard {

  /** Human-readable violations found in `df`'s plan; empty = clean. */
  def violations(df: DataFrame, labelCols: Set[String] = Set.empty): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()

    def boundOk(e: Expression): Boolean = e match {
      case CurrentRow | UnboundedPreceding => true
      case UnboundedFollowing             => false
      case Literal(v: Int, _)             => v <= 0
      case Literal(v: Long, _)            => v <= 0L
      case Literal(v: Short, _)           => v <= 0
      case Literal(v: java.math.BigDecimal, _) => v.signum <= 0
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toBigDecimal.signum <= 0
      case Literal(v: Double, _)          => v <= 0d
      case Literal(v: Float, _)           => v <= 0f
      case UnaryMinus(_, _)               => true
      case _                              => false // unverifiable boundary ⇒ reject
    }

    def check(we: WindowExpression, owner: String): Unit = {
      we.windowFunction match {
        case _: Lead =>
          out += s"$owner: lead() reads rows after the current turn"
        case _ => ()
      }
      we.windowSpec.frameSpecification match {
        case SpecifiedWindowFrame(_, _, upper) if !boundOk(upper) =>
          out += s"$owner: window frame upper bound '${upper.sql}' extends past the current row"
        case _ => ()
      }
    }

    val plan = df.queryExecution.analyzed

    // The analyzer extracts window expressions into internal aliases
    // (`_we0 AS label_x` over `Window [lead(...) AS _we0]`), so a label
    // exemption must follow attribute references down the plan: any
    // named expression that IS a label, or whose output feeds an
    // exempted expression, is exempt. Fixpoint over the (acyclic) plan.
    var exempt = Set.empty[ExprId]
    var changed = true
    while (changed) {
      changed = false
      plan.foreach { node =>
        node.expressions.foreach {
          case ne: NamedExpression
              if labelCols.contains(ne.name) || exempt.contains(ne.exprId) =>
            val refs = ne.references.map(_.exprId).toSet + ne.exprId
            if (!refs.subsetOf(exempt)) { exempt ++= refs; changed = true }
          case _ => ()
        }
      }
    }

    plan.foreach { node =>
      node.expressions.foreach { root =>
        val (owner, skip) = root match {
          case ne: NamedExpression => (ne.name, labelCols.contains(ne.name) || exempt.contains(ne.exprId))
          case _                   => ("<expr>", false)
        }
        if (!skip) {
          root.foreach {
            case we: WindowExpression => check(we, owner)
            case _                    => ()
          }
        }
      }
    }
    out.toList
  }

  /** Throws if `df` computes any future-reading feature column. */
  def validate(df: DataFrame, labelCols: Set[String] = Set.empty): Unit = {
    val v = violations(df, labelCols)
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"temporal leakage detected in feature plan:\n  ${v.mkString("\n  ")}")
  }
}
