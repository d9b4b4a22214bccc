package graft.config

import scala.collection.mutable

/** Minimal YAML-subset parser for the engine's config files
  * (SURVEY.md §7.1 item 2: "hand-rolled minimal YAML subset parser —
  * semantics, not format, are the contract"). Supports what
  * `config/datasets.yml` / `config/config.yml` actually use:
  * nested maps by 2-space indentation, `- ` list items (scalar or map),
  * scalars (string/int/float/bool/null), quoted strings, `#` comments,
  * and inline `[a, b]` lists. No anchors/aliases/multi-doc/flow maps.
  */
object YamlLite {

  sealed trait Node
  final case class YMap(entries: Vector[(String, Node)]) extends Node {
    lazy val toMap: Map[String, Node] = entries.toMap
    def get(k: String): Option[Node] = toMap.get(k)
  }
  final case class YList(items: Vector[Node]) extends Node
  final case class YScalar(value: Option[Any]) extends Node {
    def asString: String = value.map(_.toString).getOrElse("")
  }

  def parse(text: String): Node = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (stripComment(l), i) }
      .filter { case (l, _) => l.trim.nonEmpty }
      .toVector
    val (node, rest) = parseBlock(lines, 0)
    require(rest.isEmpty, s"trailing content at line ${rest.head._2 + 1}")
    node
  }

  private def stripComment(line: String): String = {
    var inS = false
    var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD => return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private type Lines = Vector[(String, Int)]

  private def parseBlock(lines: Lines, indent: Int): (Node, Lines) = {
    if (lines.isEmpty) return (YScalar(None), lines)
    val first = lines.head._1
    if (first.trim.startsWith("- ") || first.trim == "-") parseList(lines, indentOf(first))
    else parseMap(lines, indentOf(first))
  }

  private def parseMap(lines0: Lines, indent: Int): (Node, Lines) = {
    val entries = mutable.ArrayBuffer[(String, Node)]()
    var lines = lines0
    while (lines.nonEmpty && indentOf(lines.head._1) == indent &&
      !lines.head._1.trim.startsWith("- ")) {
      val (line, ln) = lines.head
      val t = line.trim
      val ci = colonIndex(t)
      require(ci > 0, s"expected 'key: value' at line ${ln + 1}: $t")
      val key = unquote(t.substring(0, ci).trim)
      val rest = t.substring(ci + 1).trim
      lines = lines.tail
      if (rest.nonEmpty) {
        entries += key -> scalarOrInline(rest)
      } else {
        // nested block (or empty value)
        if (lines.nonEmpty && indentOf(lines.head._1) > indent) {
          val (child, remaining) = parseBlock(lines, 0)
          entries += key -> child
          lines = remaining
        } else entries += key -> YScalar(None)
      }
    }
    (YMap(entries.toVector), lines)
  }

  private def parseList(lines0: Lines, indent: Int): (Node, Lines) = {
    val items = mutable.ArrayBuffer[Node]()
    var lines = lines0
    while (lines.nonEmpty && indentOf(lines.head._1) == indent &&
      (lines.head._1.trim.startsWith("- ") || lines.head._1.trim == "-")) {
      val (line, _) = lines.head
      val t = line.trim
      val rest = if (t == "-") "" else t.substring(2).trim
      lines = lines.tail
      if (rest.isEmpty) {
        if (lines.nonEmpty && indentOf(lines.head._1) > indent) {
          val (child, remaining) = parseBlock(lines, 0)
          items += child
          lines = remaining
        } else items += YScalar(None)
      } else if (colonIndex(rest) > 0 && !isQuoted(rest)) {
        // map item starting on the dash line: re-inject with dash indent + 2
        val syntheticIndent = indent + 2
        val synthetic = (" " * syntheticIndent + rest, -1)
        val following = lines.takeWhile(l => indentOf(l._1) > indent)
        val after = lines.drop(following.length)
        val (child, leftover) = parseMap(synthetic +: following, syntheticIndent)
        require(leftover.isEmpty, "unexpected leftover in list-item map")
        items += child
        lines = after
      } else {
        items += scalarOrInline(rest)
      }
    }
    (YList(items.toVector), lines)
  }

  private def colonIndex(s: String): Int = {
    var inS = false
    var inD = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case ':' if !inS && !inD =>
          if (i + 1 >= s.length || s.charAt(i + 1) == ' ') return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def isQuoted(s: String): Boolean =
    (s.startsWith("'") && s.endsWith("'")) ||
      (s.startsWith("\"") && s.endsWith("\""))

  private def unquote(s: String): String =
    if (isQuoted(s) && s.length >= 2) s.substring(1, s.length - 1) else s

  private def scalarOrInline(s: String): Node =
    if (s.startsWith("[") && s.endsWith("]")) {
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) YList(Vector.empty)
      else YList(inner.split(",").map(x => scalar(x.trim)).toVector)
    } else scalar(s)

  private def scalar(s0: String): YScalar = {
    if (isQuoted(s0)) return YScalar(Some(unquote(s0)))
    s0 match {
      case "" | "~" | "null" => YScalar(None)
      case "true" | "True" => YScalar(Some(true))
      case "false" | "False" => YScalar(Some(false))
      case s =>
        YScalar(Some(
          s.toIntOption.getOrElse(
            s.toLongOption.getOrElse(
              s.toDoubleOption.getOrElse(s)))))
    }
  }
}
