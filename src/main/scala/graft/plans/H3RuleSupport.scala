package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
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
}
