package graft.server

/** Loader for Prometheus rules files — the standard `groups:` YAML shape
  * (public Prometheus docs, "Defining recording rules"), so a rules file
  * written for Prometheus configures [[RuleEngine]] unchanged:
  *
  * {{{
  * groups:
  *   - name: example
  *     interval: 30s
  *     rules:
  *       - record: job:cpu:sum
  *         expr: sum by (job) (cpu)
  *         labels:
  *           team: api
  *       - alert: HighCpu
  *         expr: cpu > 0.9
  *         for: 10m
  *         keep_firing_for: 5m
  *         annotations:
  *           summary: "cpu is high"
  * }}}
  *
  * Parsed by a deliberate YAML SUBSET (block mappings, block sequences,
  * plain / single- / double-quoted scalars, `#` comments, blank lines) —
  * the complete grammar rules files actually use. Flow style (`{}`/`[]`),
  * multi-line scalars (`|`/`>`), anchors/aliases, and tabs are rejected
  * loudly with line numbers rather than misparsed. No YAML library exists
  * in the dependency set, and pulling one in for this shape would be the
  * tail wagging the dog. */
object RuleConfig {

  /** Parse a rules file into [[RuleGroup]]s (validations in the rule case
    * classes apply — bad names/durations throw with context). */
  def parseYaml(text: String): Seq[RuleGroup] = {
    val root = Yaml.parse(text)
    val groups = root match {
      case Yaml.M(entries) => entries.toMap.get("groups") match {
        case Some(Yaml.S(items)) => items
        case Some(_) => fail("'groups' must be a sequence")
        case None => fail("missing top-level 'groups' key")
      }
      case _ => fail("rules file must be a mapping with a 'groups' key")
    }
    groups.map(groupOf)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"rules config: $msg")

  private def groupOf(node: Yaml.Node): RuleGroup = node match {
    case Yaml.M(entries) =>
      val m = entries.toMap
      val name = str(m, "name").getOrElse(fail("group missing 'name'"))
      val interval = str(m, "interval").map(durationMs)
        .getOrElse(60000L)
      val rules = m.get("rules") match {
        case Some(Yaml.S(items)) => items.map(ruleOf)
        case Some(_) => fail(s"group '$name': 'rules' must be a sequence")
        case None => fail(s"group '$name' missing 'rules'")
      }
      RuleGroup(name, interval, rules)
    case _ => fail("each group must be a mapping")
  }

  private def ruleOf(node: Yaml.Node): Rule = node match {
    case Yaml.M(entries) =>
      val m = entries.toMap
      val expr = str(m, "expr").getOrElse(fail("rule missing 'expr'"))
      (str(m, "record"), str(m, "alert")) match {
        case (Some(rec), None) =>
          for (k <- Seq("for", "keep_firing_for", "annotations") if m.contains(k))
            fail(s"recording rule '$rec' must not set '$k'")
          RecordingRule(rec, expr, labels = strMap(m, "labels"))
        case (None, Some(al)) =>
          AlertingRule(al, expr,
            forMs = str(m, "for").map(durationMs).getOrElse(0L),
            keepFiringForMs =
              str(m, "keep_firing_for").map(durationMs).getOrElse(0L),
            labels = strMap(m, "labels"),
            annotations = strMap(m, "annotations"))
        case (Some(_), Some(_)) =>
          fail("a rule cannot set both 'record' and 'alert'")
        case (None, None) =>
          fail("each rule needs 'record' or 'alert'")
      }
    case _ => fail("each rule must be a mapping")
  }

  private def str(m: Map[String, Yaml.Node], k: String): Option[String] =
    m.get(k).map {
      case Yaml.Str(s) => s
      case _ => fail(s"'$k' must be a scalar")
    }

  private def strMap(m: Map[String, Yaml.Node], k: String): Map[String, String] =
    m.get(k) match {
      case None => Map.empty
      case Some(Yaml.M(entries)) => entries.map {
        case (key, Yaml.Str(v)) => key -> v
        case (key, _) => fail(s"'$k.$key' must be a scalar")
      }.toMap
      case Some(_) => fail(s"'$k' must be a mapping")
    }

  /** Prometheus durations: compound `<int><unit>` runs (`1h30m`), units
    * ms/s/m/h/d/w/y, or a bare integer meaning seconds (Prometheus
    * accepts both in rule files). */
  def durationMs(s: String): Long = {
    val t = s.trim
    if (t.matches("[0-9]+")) t.toLong * 1000L
    else {
      val re = "([0-9]+)(ms|s|m|h|d|w|y)".r
      val parts = re.findAllMatchIn(t).toSeq
      require(parts.nonEmpty && parts.map(_.matched).mkString == t,
        s"bad duration '$s'")
      parts.map { p =>
        val n = p.group(1).toLong
        p.group(2) match {
          case "ms" => n
          case "s" => n * 1000L
          case "m" => n * 60000L
          case "h" => n * 3600000L
          case "d" => n * 86400000L
          case "w" => n * 7L * 86400000L
          case "y" => n * 365L * 86400000L
        }
      }.sum
    }
  }

  /** The YAML-subset block parser. Nodes: scalar, mapping, sequence. */
  private[server] object Yaml {
    sealed trait Node
    final case class Str(s: String) extends Node
    final case class M(entries: Seq[(String, Node)]) extends Node
    final case class S(items: Seq[Node]) extends Node

    private final case class Line(indent: Int, text: String, num: Int)

    private def err(msg: String, line: Int): Nothing =
      throw new IllegalArgumentException(s"rules config line $line: $msg")

    def parse(text: String): Node = {
      val lines = text.split("\n", -1).toSeq.zipWithIndex.flatMap {
        case (raw, i) =>
          if (raw.contains("\t")) err("tabs are not allowed in YAML", i + 1)
          val noComment = stripComment(raw)
          val trimmed = noComment.trim
          if (trimmed.isEmpty) None
          else Some(Line(noComment.indexWhere(_ != ' '), trimmed, i + 1))
      }
      if (lines.isEmpty) M(Nil)
      else {
        val (node, rest) = parseBlock(lines, lines.head.indent)
        rest.headOption.foreach(l =>
          err(s"unexpected dedent/content: '${l.text}'", l.num))
        node
      }
    }

    /** Strip a `#` comment outside quotes (YAML requires whitespace before
      * `#` mid-line; we accept any unquoted `#` — stricter, never
      * misparses a quoted one). */
    private def stripComment(s: String): String = {
      var inS = false; var inD = false; var i = 0
      while (i < s.length) {
        s(i) match {
          case '\'' if !inD => inS = !inS
          case '"' if !inS => inD = !inD
          case '#' if !inS && !inD => return s.substring(0, i)
          case _ =>
        }
        i += 1
      }
      s
    }

    private def scalar(s: String, line: Int): Str = {
      val t = s.trim
      if (t.matches("[|>][+-]?[0-9]*"))
        err("multi-line scalars (| / >) are not supported", line)
      if (t.startsWith("{") || t.startsWith("["))
        err("flow style ({...} / [...]) is not supported", line)
      if (t.startsWith("&") || t.startsWith("*"))
        err("anchors/aliases are not supported", line)
      if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
        Str(unescapeDouble(t.substring(1, t.length - 1), line))
      else if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
        Str(t.substring(1, t.length - 1).replace("''", "'"))
      else Str(t)
    }

    private def unescapeDouble(s: String, line: Int): String = {
      val out = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s(i)
        if (c == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'n' => out += '\n'; i += 2
            case 't' => out += '\t'; i += 2
            case 'r' => out += '\r'; i += 2
            case '"' => out += '"'; i += 2
            case '\\' => out += '\\'; i += 2
            case o => err(s"unsupported escape '\\$o'", line)
          }
        } else { out += c; i += 1 }
      }
      out.toString
    }

    /** `key:` split honoring quotes — the value may contain ':' freely
      * (PromQL selectors do); the KEY must be a plain identifier-ish
      * scalar, so the first ':' that is followed by space/EOL and sits
      * outside quotes splits. */
    private def splitKey(s: String, line: Int): Option[(String, String)] = {
      var inS = false; var inD = false; var i = 0
      while (i < s.length) {
        s(i) match {
          case '\'' if !inD => inS = !inS
          case '"' if !inS => inD = !inD
          case ':' if !inS && !inD &&
              (i + 1 == s.length || s(i + 1) == ' ') =>
            return Some((s.substring(0, i).trim, s.substring(i + 1).trim))
          case _ =>
        }
        i += 1
      }
      None
    }

    private def parseBlock(lines: Seq[Line], indent: Int): (Node, Seq[Line]) = {
      val first = lines.head
      if (first.indent != indent)
        err(s"bad indentation (expected $indent, got ${first.indent})", first.num)
      if (first.text.startsWith("- ") || first.text == "-")
        parseSeq(lines, indent)
      else parseMap(lines, indent)
    }

    private def parseSeq(lines: Seq[Line], indent: Int): (Node, Seq[Line]) = {
      var rest = lines
      val items = Seq.newBuilder[Node]
      while (rest.nonEmpty && rest.head.indent == indent &&
          (rest.head.text.startsWith("- ") || rest.head.text == "-")) {
        val head = rest.head
        val inline = if (head.text == "-") "" else head.text.substring(2).trim
        // the item's own content indents past the dash; YAML counts the
        // dash as indentation, so nested keys sit at >= indent + 2
        if (inline.isEmpty) {
          val (node, r) =
            if (rest.tail.nonEmpty && rest.tail.head.indent > indent)
              parseBlock(rest.tail, rest.tail.head.indent)
            else err("empty sequence item", head.num)
          items += node
          rest = r
        } else splitKey(inline, head.num) match {
          case Some((k, v)) =>
            // inline first key of a block mapping: continuation keys are
            // aligned at the inline key's column
            val itemIndent = indent + 2
            val entries = Seq.newBuilder[(String, Node)]
            if (v.nonEmpty) {
              entries += ((k, scalar(v, head.num)))
              rest = rest.tail
            } else {
              // `- key:` with a nested block (or empty value)
              if (rest.tail.nonEmpty && rest.tail.head.indent > itemIndent) {
                val (node, r) = parseBlock(rest.tail, rest.tail.head.indent)
                entries += ((k, node))
                rest = r
              } else if (rest.tail.nonEmpty &&
                  rest.tail.head.indent == itemIndent &&
                  (rest.tail.head.text.startsWith("- ") ||
                    rest.tail.head.text == "-")) {
                // zero-indent nested sequence (dash at the key's column)
                val (node, r) = parseSeq(rest.tail, itemIndent)
                entries += ((k, node))
                rest = r
              } else {
                entries += ((k, Str("")))
                rest = rest.tail
              }
            }
            while (rest.nonEmpty && rest.head.indent == itemIndent &&
                !rest.head.text.startsWith("- ")) {
              val (m, r) = parseMapEntry(rest, itemIndent)
              entries += m
              rest = r
            }
            items += M(entries.result())
          case None =>
            items += scalar(inline, head.num)
            rest = rest.tail
        }
      }
      (S(items.result()), rest)
    }

    private def parseMap(lines: Seq[Line], indent: Int): (Node, Seq[Line]) = {
      var rest = lines
      val entries = Seq.newBuilder[(String, Node)]
      while (rest.nonEmpty && rest.head.indent == indent &&
          !rest.head.text.startsWith("- ")) {
        val (e, r) = parseMapEntry(rest, indent)
        entries += e
        rest = r
      }
      (M(entries.result()), rest)
    }

    private def parseMapEntry(lines: Seq[Line],
        indent: Int): ((String, Node), Seq[Line]) = {
      val head = lines.head
      splitKey(head.text, head.num) match {
        case Some((k, v)) if v.nonEmpty =>
          ((k, scalar(v, head.num)), lines.tail)
        case Some((k, _)) =>
          if (lines.tail.nonEmpty && lines.tail.head.indent > indent) {
            val (node, r) = parseBlock(lines.tail, lines.tail.head.indent)
            ((k, node), r)
          } else if (lines.tail.nonEmpty && lines.tail.head.indent == indent &&
              (lines.tail.head.text.startsWith("- ") ||
                lines.tail.head.text == "-")) {
            // YAML permits a block sequence at its parent key's own column
            // (the dash itself counts as the item's indentation) — the
            // common hand-written Prometheus rules style:
            //   groups:
            //   - name: g
            val (node, r) = parseSeq(lines.tail, indent)
            ((k, node), r)
          } else ((k, Str("")), lines.tail)
        case None => err(s"expected 'key: value', got '${head.text}'", head.num)
      }
    }
  }
}
