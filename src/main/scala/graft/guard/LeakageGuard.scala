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

    // sign of a literal: Some(s) if statically known, None otherwise
    def litSignum(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _)             => Some(v.sign)
      case Literal(v: Long, _)            => Some(v.sign.toInt)
      case Literal(v: Short, _)           => Some(v.toInt.sign)
      case Literal(v: java.math.BigDecimal, _) => Some(v.signum)
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => Some(v.toBigDecimal.signum)
      case Literal(v: Double, _)          => Some(v.sign.toInt)
      case Literal(v: Float, _)           => Some(v.sign.toInt)
      case _                              => None
    }

    def boundOk(e: Expression): Boolean = e match {
      case CurrentRow | UnboundedPreceding => true
      case UnboundedFollowing             => false
      // -(lit) is only a PRECEDING bound when the operand is known
      // non-negative: -(-5) FOLLOWING must NOT pass
      case UnaryMinus(child, _)           => litSignum(child).exists(_ >= 0)
      case _                              => litSignum(e).exists(_ <= 0) // unverifiable ⇒ reject
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
    // (`_we0 AS label_x` over `Window [lead(...) AS _we0]`), so the
    // label exemption must follow attribute references. But exemption
    // must flow ONLY to expressions consumed EXCLUSIVELY by labels:
    // round 1 exempted every attribute a label referenced, so a
    // future-reading FEATURE was silently skipped whenever some label
    // also read it — a false negative. Here an exprId is exempt iff
    //   (a) a named expression with that id is itself a label, or
    //   (b) it has at least one consumer, every consumer is exempt,
    //       and it is not consumed outside named expressions (plan
    //       output, filter/join/sort conditions).
    val labelIds = scala.collection.mutable.Set.empty[ExprId]
    val consumers = scala.collection.mutable.Map.empty[ExprId, Set[ExprId]]
    val external = scala.collection.mutable.Set.empty[ExprId]

    plan.foreach { node =>
      node.expressions.foreach {
        case ne: NamedExpression =>
          if (labelCols.contains(ne.name)) labelIds += ne.exprId
          (ne.references.map(_.exprId).toSet - ne.exprId).foreach { r =>
            consumers(r) = consumers.getOrElse(r, Set.empty) + ne.exprId
          }
        case other =>
          // non-named consumption (filter/join/sort/...) — a
          // future-reading column used here is a real leak path
          other.references.foreach(a => external += a.exprId)
      }
    }
    plan.output.foreach { a =>
      if (!labelCols.contains(a.name)) external += a.exprId
    }
    // the label declaration covers the column wherever it flows —
    // filtering rows BY a label (drop-null-labels etc.) is standard
    external --= labelIds

    var exempt: Set[ExprId] = labelIds.toSet
    var changed = true
    while (changed) {
      changed = false
      consumers.foreach { case (id, cs) =>
        if (!exempt.contains(id) && !external.contains(id) &&
            cs.nonEmpty && cs.subsetOf(exempt)) {
          exempt += id; changed = true
        }
      }
    }

    plan.foreach { node =>
      node.expressions.foreach { root =>
        val (owner, skip) = root match {
          case ne: NamedExpression =>
            (ne.name, exempt.contains(ne.exprId) && !external.contains(ne.exprId))
          case _ => ("<expr>", false)
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
