package graft.promql

import graft.metric.MetricAgg

/** PromQL expression surface — the text form of the query language the
  * reference specifies for its Prometheus integration (reference RFC
  * docs/rfcs/20220702-prometheus-read-extension.md:78-99 "HoraeDB supports
  * sum and rate"; label-matcher selection semantics per the same RFC's
  * filter examples). The reference ships no parser (SURVEY §2.12) — the RFC
  * is spec-only — so this is the spec made executable: a hand-rolled
  * tokenizer + recursive-descent parser with zero dependencies.
  *
  * Supported grammar (a deliberate superset of the RFC's sum+rate):
  * {{{
  *   expr     := agg | vector
  *   agg      := aggop grouping? '(' expr ')' grouping?
  *   aggop    := sum | min | max | avg | count
  *   grouping := 'by' '(' label (',' label)* ')'
  *   vector   := rangefn '(' selector '[' duration ']' ')' | selector
  *   rangefn  := rate | increase | delta
  *   selector := metric ('{' matcher (',' matcher)* '}')? | '{' ... '}'
  *   matcher  := label ('=' | '!=' | '=~' | '!~') string
  *   duration := (int ('ms'|'s'|'m'|'h'|'d'|'w'))+      e.g. 1h30m
  * }}}
  */
sealed trait Expr

/** `=` / `!=` / `=~` / `!~`. Regex matchers are fully anchored, as in
  * Prometheus (`env=~"prod|stag"` matches exactly, not substrings). */
sealed trait MatchOp
object MatchOp {
  case object Eq extends MatchOp
  case object Ne extends MatchOp
  case object Re extends MatchOp
  case object Nre extends MatchOp
}

final case class LabelMatcher(label: String, op: MatchOp, value: String)

/** `metric{label=~"v", ...}` — instant-vector selection. */
final case class Selector(metric: String, matchers: Seq[LabelMatcher]) extends Expr

/** Range-vector functions over a window. */
sealed trait RangeF
object RangeF {
  /** Per-second reset-aware increase. */
  case object Rate extends RangeF
  /** Reset-aware counter increase over the window. */
  case object Increase extends RangeF
  /** Last-minus-first gauge delta over the window. */
  case object Delta extends RangeF
}

final case class RangeFn(fn: RangeF, sel: Selector, windowMs: Long) extends Expr

/** `sum by (dc) (...)`. Empty `by` aggregates everything to one series. */
final case class Agg(op: MetricAgg, by: Seq[String], child: Expr) extends Expr

/** Parameterized aggregations: `topk(3, ...)`, `bottomk(3, ...)`,
  * `quantile(0.9, ...)`. `by` scopes the ranking / quantile group. */
sealed trait ParamOp
object ParamOp {
  case object TopK extends ParamOp
  case object BottomK extends ParamOp
  case object Quantile extends ParamOp
}

final case class ParamAgg(op: ParamOp, param: Double, by: Seq[String],
    child: Expr) extends Expr

/** Scalar literal in a binary expression (`cpu * 100`, `2 * cpu`). */
final case class NumLit(value: Double) extends Expr

/** Binary operation. Arithmetic (`+ - * / %`) combines values; comparisons
  * (`> >= < <= == !=`) FILTER the left side (Prometheus semantics without
  * the `bool` modifier). Vector∘vector matches on the intersection of the
  * two sides' label/bucket columns. */
final case class BinOp(op: String, lhs: Expr, rhs: Expr) extends Expr

final case class PromQLParseException(msg: String, pos: Int)
  extends IllegalArgumentException(s"PromQL parse error at $pos: $msg")

object PromQLParser {

  private sealed trait Tok { def pos: Int }
  private final case class TIdent(s: String, pos: Int) extends Tok
  private final case class TStr(s: String, pos: Int) extends Tok
  private final case class TDur(ms: Long, pos: Int) extends Tok
  private final case class TNum(d: Double, pos: Int) extends Tok
  private final case class TPunct(s: String, pos: Int) extends Tok
  private final case class TEnd(pos: Int) extends Tok

  private val AggOps = Map(
    "sum" -> MetricAgg.Sum, "min" -> MetricAgg.Min, "max" -> MetricAgg.Max,
    "avg" -> MetricAgg.Avg, "count" -> MetricAgg.Count)
  private val ParamOps = Map(
    "topk" -> ParamOp.TopK, "bottomk" -> ParamOp.BottomK,
    "quantile" -> ParamOp.Quantile)
  private val RangeFns = Map(
    "rate" -> RangeF.Rate, "increase" -> RangeF.Increase, "delta" -> RangeF.Delta)
  private val DurUnits = List( // longest-match first
    "ms" -> 1L, "w" -> 604800000L, "d" -> 86400000L, "h" -> 3600000L,
    "m" -> 60000L, "s" -> 1000L)

  def parse(input: String): Expr = new P(tokenize(input)).parseAll()

  // -------------------------------------------------------------- tokenizer

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def isIdentStart(c: Char) = c.isLetter || c == '_' || c == ':'
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == ':'
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (isIdentStart(c)) {
        val start = i
        while (i < s.length && isIdent(s(i))) i += 1
        out += TIdent(s.substring(start, i), start)
      } else if (c.isDigit) {
        // number or duration: digits followed by a unit start a compound
        // duration (1h30m); a fraction or bare digits are a plain number
        // (topk's k, quantile's q)
        val start = i
        var n = 0L
        while (i < s.length && s(i).isDigit) { n = n * 10 + (s(i) - '0'); i += 1 }
        if (i < s.length && s(i) == '.') {
          i += 1
          var frac = 0.0
          var scale = 0.1
          if (i >= s.length || !s(i).isDigit)
            throw PromQLParseException("expected digits after '.'", i)
          while (i < s.length && s(i).isDigit) { frac += (s(i) - '0') * scale; scale /= 10; i += 1 }
          out += TNum(n + frac, start)
        } else DurUnits.find { case (u, _) => s.startsWith(u, i) } match {
          case Some((u, mult)) =>
            var ms = n * mult
            i += u.length
            while (i < s.length && s(i).isDigit) { // compound: 1h30m
              var m = 0L
              while (i < s.length && s(i).isDigit) { m = m * 10 + (s(i) - '0'); i += 1 }
              DurUnits.find { case (u2, _) => s.startsWith(u2, i) } match {
                case Some((u2, mult2)) => ms += m * mult2; i += u2.length
                case None =>
                  throw PromQLParseException("expected duration unit (ms|s|m|h|d|w)", i)
              }
            }
            out += TDur(ms, start)
          case None => out += TNum(n.toDouble, start)
        }
      } else if (c == '"' || c == '\'') {
        val start = i
        val sb = new StringBuilder
        i += 1
        while (i < s.length && s(i) != c) {
          if (s(i) == '\\' && i + 1 < s.length) {
            // Go-string escape set, like Prometheus: an unknown escape is a
            // loud parse error, not a silently stripped backslash (\d would
            // otherwise become the literal regex "d").
            sb += (s(i + 1) match {
              case '\\' => '\\'
              case '"' => '"'
              case '\'' => '\''
              case 'n' => '\n'
              case 't' => '\t'
              case 'r' => '\r'
              case bad => throw PromQLParseException(
                s"invalid escape sequence '\\$bad' (escape the backslash: \\\\$bad)", i)
            })
            i += 2
          }
          else { sb += s(i); i += 1 }
        }
        if (i >= s.length) throw PromQLParseException("unterminated string", start)
        i += 1
        out += TStr(sb.toString, start)
      } else if (s.startsWith("=~", i) || s.startsWith("!~", i) || s.startsWith("!=", i)
          || s.startsWith("==", i) || s.startsWith(">=", i) || s.startsWith("<=", i)) {
        out += TPunct(s.substring(i, i + 2), i); i += 2
      } else if ("{}()[],=+-*/%<>".indexOf(c) >= 0) {
        out += TPunct(c.toString, i); i += 1
      } else throw PromQLParseException(s"unexpected character '$c'", i)
    }
    out += TEnd(s.length)
    out.result()
  }

  // ----------------------------------------------------------------- parser

  private final class P(toks: Vector[Tok]) {
    private var k = 0
    private def peek: Tok = toks(k)
    private def next(): Tok = { val t = toks(k); k += 1; t }
    private def fail(msg: String): Nothing = throw PromQLParseException(msg, peek.pos)
    private def expect(p: String): Unit = next() match {
      case TPunct(`p`, _) => ()
      case t => throw PromQLParseException(s"expected '$p'", t.pos)
    }

    def parseAll(): Expr = {
      val e = parseExpr()
      peek match {
        case TEnd(_) => e
        case t => throw PromQLParseException("trailing input", t.pos)
      }
    }

    // Precedence climbing, Prometheus order: * / %  >  + -  >  comparisons.
    private def parseExpr(): Expr = parseBinary(0)

    private val Precedence = List(
      Set("==", "!=", "<", "<=", ">", ">="), Set("+", "-"), Set("*", "/", "%"))

    private def parseBinary(level: Int): Expr =
      if (level == Precedence.length) parseAtom()
      else {
        var l = parseBinary(level + 1)
        var more = true
        while (more) peek match {
          case TPunct(op, _) if Precedence(level).contains(op) =>
            next()
            l = BinOp(op, l, parseBinary(level + 1))
          case _ => more = false
        }
        l
      }

    private def parseAtom(): Expr = peek match {
      // contextual keyword: an aggop is only an aggregation when followed
      // by '(' or 'by' — `sum{...}` stays a metric named "sum"
      case TIdent(name, _) if AggOps.contains(name) && startsAgg => parseAgg()
      case TIdent(name, _) if ParamOps.contains(name) && startsAgg => parseParamAgg()
      case TNum(d, _) => next(); NumLit(d)
      case TPunct("(", _) => next(); val e = parseExpr(); expect(")"); e
      case TPunct(op, _) if Precedence.exists(_.contains(op)) =>
        fail(s"unexpected operator '$op' (unary +/- is not supported; write 0 - x)")
      case _ => parseVector()
    }

    private def startsAgg: Boolean = toks(k + 1) match {
      case TPunct("(", _) => true
      case TIdent("by", _) => true
      case _ => false
    }

    private def parseAgg(): Expr = {
      val TIdent(name, _) = next(): @unchecked
      val byBefore = parseByOpt()
      expect("(")
      val child = parseExpr()
      expect(")")
      val byAfter = parseByOpt()
      if (byBefore.nonEmpty && byAfter.nonEmpty)
        fail("duplicate 'by' clause")
      Agg(AggOps(name), byBefore ++ byAfter, child)
    }

    private def parseParamAgg(): Expr = {
      val TIdent(name, _) = next(): @unchecked
      val byBefore = parseByOpt()
      expect("(")
      val param = next() match {
        case TNum(d, _) => d
        case t => throw PromQLParseException(
          s"$name requires a leading scalar parameter, e.g. $name(3, ...)", t.pos)
      }
      expect(",")
      val child = parseExpr()
      expect(")")
      val byAfter = parseByOpt()
      if (byBefore.nonEmpty && byAfter.nonEmpty) fail("duplicate 'by' clause")
      val op = ParamOps(name)
      if (op == ParamOp.Quantile && (param < 0 || param > 1))
        fail(s"quantile parameter must be in [0, 1], got $param")
      if (op != ParamOp.Quantile && (param < 1 || param != math.floor(param)))
        fail(s"$name parameter must be a positive integer, got $param")
      ParamAgg(op, param, byBefore ++ byAfter, child)
    }

    private def parseByOpt(): Seq[String] = peek match {
      case TIdent("by", _) =>
        next()
        expect("(")
        val labels = Seq.newBuilder[String]
        var done = false
        while (!done) next() match {
          case TIdent(l, _) =>
            labels += l
            next() match {
              case TPunct(",", _) => ()
              case TPunct(")", _) => done = true
              case t => throw PromQLParseException("expected ',' or ')'", t.pos)
            }
          case t => throw PromQLParseException("expected label name", t.pos)
        }
        labels.result()
      case _ => Nil
    }

    private def parseVector(): Expr = peek match {
      case TIdent(fn, _) if RangeFns.contains(fn) && toks(k + 1).isInstanceOf[TPunct]
          && toks(k + 1).asInstanceOf[TPunct].s == "(" =>
        next(); expect("(")
        val sel = parseSelector()
        expect("[")
        val win = next() match {
          case TDur(ms, _) => ms
          case t => throw PromQLParseException("expected duration", t.pos)
        }
        expect("]")
        expect(")")
        RangeFn(RangeFns(fn), sel, win)
      case _ => parseSelector()
    }

    private def parseSelector(): Selector = {
      val metric = next() match {
        case TIdent(m, _) => m
        case t => throw PromQLParseException("expected metric name", t.pos)
      }
      val matchers = peek match {
        case TPunct("{", _) =>
          next()
          val ms = Seq.newBuilder[LabelMatcher]
          var done = peek match { case TPunct("}", _) => next(); true; case _ => false }
          while (!done) {
            val label = next() match {
              case TIdent(l, _) => l
              case t => throw PromQLParseException("expected label name", t.pos)
            }
            val op = next() match {
              case TPunct("=", _) => MatchOp.Eq
              case TPunct("!=", _) => MatchOp.Ne
              case TPunct("=~", _) => MatchOp.Re
              case TPunct("!~", _) => MatchOp.Nre
              case t => throw PromQLParseException("expected matcher operator", t.pos)
            }
            val value = next() match {
              case TStr(v, _) => v
              case t => throw PromQLParseException("expected quoted value", t.pos)
            }
            ms += LabelMatcher(label, op, value)
            next() match {
              case TPunct(",", _) => ()
              case TPunct("}", _) => done = true
              case t => throw PromQLParseException("expected ',' or '}'", t.pos)
            }
          }
          ms.result()
        case _ => Nil
      }
      Selector(metric, matchers)
    }
  }
}
