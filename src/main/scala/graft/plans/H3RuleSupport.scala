package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.LongType

/** Shared plumbing for the H3 optimizer rules — one copy of the
  * opt-in resolution contract and of the cell-key preference, so the
  * two rules (and any future sibling) cannot drift. */
private[plans] object H3RuleSupport {

  /** The opt-in resolution conf: absent = rule inert; present = must
    * parse as an H3 resolution 0..15 (loud otherwise — a typo'd conf
    * silently disabling a rewrite the user asked for is worse than an
    * error). */
  def resConf(spark: SparkSession, key: String): Option[Int] =
    spark.conf.getOption(key).map { s =>
      val r = try s.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be an H3 resolution 0..15, got '$s'")
      }
      require(r >= 0 && r <= 15,
        s"$key must be an H3 resolution 0..15, got '$s'")
      r
    }

  /** The auto-aware opt-in conf (r16 Next #6 ergonomics): None = conf
    * absent, rule inert. Some(None) = the literal value `auto` — the
    * rule infers the res PER SITE from the scanned relations' stored
    * `h3_parent_<res>` columns (exactly one distinct res anywhere in
    * the site's subtree; ambiguous or absent = that site stays
    * unrewritten, with a warning for the ambiguous case). Some(Some(r))
    * = pinned res, the original contract, now with a warning when a
    * spatial-shaped site carries parent columns at OTHER resolutions
    * only (the wrong-res-conf = silently-inert-rule footgun). */
  def resConfOrAuto(spark: SparkSession, key: String): Option[Option[Int]] =
    spark.conf.getOption(key).map {
      case s if s.trim.equalsIgnoreCase("auto") => None
      case s =>
        val r = try s.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$key must be an H3 resolution 0..15 or 'auto', got '$s'")
        }
        require(r >= 0 && r <= 15,
          s"$key must be an H3 resolution 0..15 or 'auto', got '$s'")
        Some(r)
    }

  /** A plan-time numeric constant's FINITE double value — the
    * threshold contract shared by both rules' ST_DWithin shapes
    * (deterministic, no column references, numeric type; None
    * otherwise or on eval failure, leaving the site inert). NaN and
    * the infinities are rejected here rather than downstream: a
    * non-finite buffer reaching the covering enumeration would hang
    * or explode the cell corridor, where the UNREWRITTEN predicate
    * would simply evaluate to a constant — inert is the only sound
    * answer. */
  def constDouble(e: Expression): Option[Double] =
    if (e.deterministic && e.references.isEmpty &&
        e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      try Option(e.eval(null)).map {
        case n: java.lang.Number => n.doubleValue
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
      }.filter(d => !d.isNaN && !d.isInfinite)
      catch { case scala.util.control.NonFatal(_) => None }
    else None

  /** Distinct resolutions of stored LongType `h3_parent_<r>` columns
    * anywhere in `plan`'s subtree — subtree-wide, not output-only,
    * because column pruning routinely strips the key from the visible
    * Project while the relation below still carries it (the same
    * reality H3JoinRewrite's key threading handles). */
  def parentResolutions(plan: LogicalPlan): Seq[Int] =
    plan.collect { case n => n.output }.flatten
      .collect {
        case a if a.dataType == LongType && a.name.startsWith("h3_parent_") =>
          a.name.stripPrefix("h3_parent_")
      }
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .filter(r => r >= 0 && r <= 15)
      .distinct

  /** The H3 key expression over `output`, with a preference rank:
    * Some((expr, 0)) for a stored `h3_parent_<res>` ancestor column
    * (zero per-row math; its sargable range prefilter reaches scans),
    * Some((expr, 1)) for per-row parent math over a long-keyed
    * `h3_cell`. */
  def keyOf(output: Seq[Attribute], r: Int): Option[(Expression, Int)] =
    output.collectFirst {
      case a if a.name == s"h3_parent_$r" && a.dataType == LongType =>
        (a: Expression, 0)
    }.orElse(output.collectFirst {
      case a if a.name == "h3_cell" && a.dataType == LongType =>
        (graft.functions.H3CellToParent(a, Literal(r)): Expression, 1)
    })

  /** True when every attribute in `attrs` provably originates from ONE
    * side at every multi-child node (Join, Union, ...) under `plan` —
    * the SAME-RELATION guard both H3 rules need before pairing an H3
    * key with a geometry column (r16 ADVICE, medium): the key is
    * picked BY NAME, and above a join a `h3_cell` from table B paired
    * with a geometry from table A would prefilter A's rows by B's
    * unrelated cells — silently dropping rows. Attributes are traced
    * through Project/Aggregate/Window alias lists and Generate
    * generator outputs down to where they are produced; a set that
    * splits across the children of any multi-child node fails. Nodes
    * that produce an attribute themselves (an Aggregate's own
    * aggregate, a Window function) terminate that attribute's trace AT
    * that node — a single unary node is one row-source, so stopping
    * there is same-relation by construction. The check is
    * conservative in the SOUND direction only at multi-child nodes:
    * unknown unary shapes pass through untraced, exactly like the
    * pre-guard behavior, while any split across join/union children
    * (the reported gap) now refuses the rewrite. */
  def sameRelationLineage(plan: LogicalPlan, attrs0: AttributeSet): Boolean = {
    def mapNamed(list: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
        attrs: AttributeSet): AttributeSet =
      AttributeSet(attrs.flatMap { at =>
        list.collectFirst {
          case al: Alias if al.exprId == at.exprId => al.child.references.toSeq
          case ar: Attribute if ar.exprId == at.exprId => Seq(ar)
        }.getOrElse(Seq(at))
      })
    def walk(p: LogicalPlan, attrs: AttributeSet): Boolean =
      if (attrs.size <= 1) true
      else p match {
        case pr: Project => walk(pr.child, mapNamed(pr.projectList, attrs))
        case ag: Aggregate =>
          walk(ag.child, mapNamed(ag.aggregateExpressions, attrs))
        case w: Window =>
          walk(w.child, mapNamed(w.windowExpressions, attrs))
        case g: Generate =>
          val mapped = AttributeSet(attrs.flatMap { at =>
            if (g.generatorOutput.exists(_.exprId == at.exprId))
              g.generator.references.toSeq
            else Seq(at)
          })
          walk(g.child, mapped)
        case ex: Expand =>
          // Expand (grouping sets / count-distinct plans) re-mints
          // EVERY output exprId; stopping here would bless whatever
          // sits below — map each attr to the union of its column's
          // source references across the projections instead
          val mapped = AttributeSet(attrs.flatMap { at =>
            val i = ex.output.indexWhere(_.exprId == at.exprId)
            if (i >= 0) ex.projections.flatMap(p => p(i).references)
            else Seq(at)
          })
          walk(ex.child, mapped)
        case _: LeafNode => true
        case u: UnaryNode if attrs.subsetOf(u.child.outputSet) =>
          walk(u.child, attrs)
        case _: UnaryNode => true
        case m =>
          m.children.find(c => attrs.subsetOf(c.outputSet)) match {
            case Some(c) => walk(c, attrs)
            case None => false
          }
      }
    walk(plan, attrs0)
  }
}
