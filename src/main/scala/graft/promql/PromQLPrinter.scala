package graft.promql

import graft.metric.MetricAgg

/** Canonical-form printer for parsed PromQL — the inverse of
  * [[PromQLParser]] (the engine behind `GET /api/v1/format_query`,
  * Prometheus's query formatter endpoint). `parse(print(e)) == e` for
  * every expressible AST: PromQLSpec asserts the round trip over the
  * whole test-query corpus, which makes the pair a parser fuzz harness
  * too (any print/parse disagreement is a bug in one of them).
  *
  * Style: single spaces, `by (...)` before the aggregation body, double
  * quotes with the Go escape set, compound durations in the largest
  * units that divide evenly (`5400000` ms → `1h30m`). Parentheses are
  * emitted only where precedence requires them (nested binary operands),
  * so formatting is also a mild normalizer — exactly what Prometheus's
  * own `promql.Expr.String()` does. */
object PromQLPrinter {

  /** Prometheus CLASSIC charset checks — the ONE definition shared by the
    * printer's quoting decision, the federate emitter's exposition
    * quoting/escaping ([[graft.server.HttpFrontend]]) and the evaluator's
    * flat-schema label check ([[graft.metric.MetricEngine]]). These sites
    * must agree exactly, or a name one layer spells bare fails to parse
    * in another. Empty strings are NOT classic (no bare spelling). */
  def isClassicMetricName(s: String): Boolean =
    ClassicMetricRe.matcher(s).matches()

  /** See [[isClassicMetricName]]; label names additionally exclude ':'. */
  def isClassicLabelName(s: String): Boolean =
    ClassicLabelRe.matcher(s).matches()

  private val ClassicMetricRe =
    java.util.regex.Pattern.compile("[a-zA-Z_:][a-zA-Z0-9_:]*")
  private val ClassicLabelRe =
    java.util.regex.Pattern.compile("[a-zA-Z_][a-zA-Z0-9_]*")

  def print(e: Expr): String = e match {
    case Selector(metric, matchers, offsetMs) =>
      // Prometheus 3 UTF-8 names: a metric that is not a classic
      // identifier prints as a quoted name element inside the braces
      // ({"http.server.duration", job="api"}) — the only spelling that
      // parses back, keeping the print/parse round trip exact. A LEADING
      // colon is charset-classic but not bare-parseable (the lexer —
      // like Prometheus's — reserves a leading ':' for the subquery step
      // separator), so those quote too.
      val quotedName = metric.nonEmpty &&
        (!isClassicMetricName(metric) || metric.head == ':')
      val items = (if (quotedName) Seq(str(metric)) else Nil) ++
        matchers.map(printMatcher)
      val ms =
        if (items.isEmpty) ""
        else items.mkString("{", ",", "}")
      val base =
        if (quotedName) ms
        else if (metric.isEmpty && ms.isEmpty) "{}"
        else s"$metric$ms"
      base + offsetSuffix(offsetMs)

    case RangeFn(fn, sel, w) => printRange(fn, s"${print(sel)}[${dur(w)}]")

    // the inverse of the instant-selector desugar (`m @ t` parses to
    // last_over_time(m[lookback] @ t+1ms), Incl sentinels for
    // start()/end()): printing the desugared RANGE spelling would lose
    // the +1 on reparse — parseRangeVector never re-applies it — so a
    // format_query round trip silently dropped the boundary sample.
    // Exclusive AtStart/AtEnd (user-written range @) keep the range form.
    case AtRange(RangeF.LastOverTime, sel, w, at)
        if w == PromQLParser.LookbackMs && at != PromQLParser.AtStart &&
          at != PromQLParser.AtEnd =>
      val atTxt =
        if (at == PromQLParser.AtStartIncl) "start()"
        else if (at == PromQLParser.AtEndIncl) "end()"
        else atText(at - 1)
      s"${print(sel)} @ $atTxt"

    case AtRange(fn, sel, w, at) =>
      printRange(fn, s"${print(sel)}[${dur(w)}] @ ${atText(at)}")

    case RangeSubquery(fn, child, w, step) =>
      // step 0 = the [w:] default-resolution spelling
      val stepTxt = if (step > 0) dur(step) else ""
      printRange(fn, s"${print(child)}[${dur(w)}:$stepTxt]")

    case Agg(op, by, child, without) =>
      s"${aggName(op)}${byClause(by, without)}(${print(child)})"

    case ParamAgg(op, param, by, child) =>
      val name = op match {
        case ParamOp.TopK => "topk"
        case ParamOp.BottomK => "bottomk"
        case ParamOp.Quantile => "quantile"
        case ParamOp.LimitK => "limitk"
        case ParamOp.LimitRatio => "limit_ratio"
      }
      s"$name${byClause(by, without = false)}(${num(param)}, ${print(child)})"

    case CountValues(label, by, child) =>
      s"count_values${byClause(by, without = false)}(${str(label)}, ${print(child)})"

    case NumLit(v) => num(v)

    case BinOp(op, lhs, rhs, bool, matching) =>
      val b = if (bool) " bool" else ""
      val m = matching.map(printMatching).getOrElse("")
      s"${operand(lhs)} $op$b$m ${operand(rhs)}"

    case FnCall("time", _, _) => "time()"

    // scalar bounds FIRST (the parser's required order) — the generic
    // vector-first form below would print a string that fails to reparse
    case FnCall("histogram_fraction", child, args) =>
      s"histogram_fraction(${args.map(num).mkString(", ")}, ${print(child)})"

    case FnCall(name, child, args) =>
      (s"$name(${print(child)}" +: args.map(num)).mkString("", ", ", ")")

    case HistogramQuantile(q, child) =>
      s"histogram_quantile(${num(q)}, ${print(child)})"

    case LabelFn(name, child, dst, args) =>
      // every label function spells dst first, then the remaining string
      // args (label_replace/label_join; for sort_by_label* dst holds the
      // first sort label)
      (s"$name(${print(child)}" +: (dst +: args).map(str))
        .mkString("", ", ", ")")
  }

  /** Nested binary operands need parens (our parser is precedence-climbing;
    * re-parsing an unparenthesized print could re-associate); everything
    * else is self-delimiting. */
  private def operand(e: Expr): String = e match {
    case _: BinOp => s"(${print(e)})"
    case _ => print(e)
  }

  private def printMatcher(m: LabelMatcher): String = {
    val op = m.op match {
      case MatchOp.Eq => "="
      case MatchOp.Ne => "!="
      case MatchOp.Re => "=~"
      case MatchOp.Nre => "!~"
    }
    // quoted label names (Prometheus 3 UTF-8 syntax) round-trip too
    s"${lblName(m.label)}$op${str(m.value)}"
  }

  /** A label name in a grouping/matching list: bare when classic, quoted
    * (Prometheus 3 UTF-8 syntax) otherwise — the only spelling that
    * parses back. Matchers use the same rule in [[printMatcher]]. */
  private def lblName(l: String): String =
    if (isClassicLabelName(l)) l else str(l)

  private def printMatching(vm: VectorMatch): String = {
    val kw = if (vm.on) "on" else "ignoring"
    val grp = vm.group.map { side =>
      val g = if (side == GroupSide.Left) "group_left" else "group_right"
      if (vm.include.isEmpty) s" $g"
      else s" $g(${vm.include.map(lblName).mkString(", ")})"
    }.getOrElse("")
    s" $kw(${vm.labels.map(lblName).mkString(", ")})$grp"
  }

  private def byClause(by: Seq[String], without: Boolean): String =
    if (by.isEmpty && !without) ""
    else s" ${if (without) "without" else "by"} (${by.map(lblName).mkString(", ")}) "

  private def aggName(op: MetricAgg): String = op match {
    case MetricAgg.Sum => "sum"
    case MetricAgg.Min => "min"
    case MetricAgg.Max => "max"
    case MetricAgg.Avg => "avg"
    case MetricAgg.Count => "count"
    case MetricAgg.Stddev => "stddev"
    case MetricAgg.Stdvar => "stdvar"
    case MetricAgg.Group => "group"
  }

  private def printRange(fn: RangeF, rangeText: String): String = fn match {
    case RangeF.QuantileOverTime(q) => s"quantile_over_time(${num(q)}, $rangeText)"
    case RangeF.PredictLinear(t) => s"predict_linear($rangeText, ${num(t)})"
    case RangeF.HoltWinters(sf, tf) =>
      s"holt_winters($rangeText, ${num(sf)}, ${num(tf)})"
    case simple =>
      val name = simple match {
        case RangeF.Rate => "rate"
        case RangeF.Increase => "increase"
        case RangeF.Delta => "delta"
        case RangeF.AvgOverTime => "avg_over_time"
        case RangeF.MinOverTime => "min_over_time"
        case RangeF.MaxOverTime => "max_over_time"
        case RangeF.SumOverTime => "sum_over_time"
        case RangeF.CountOverTime => "count_over_time"
        case RangeF.LastOverTime => "last_over_time"
        case RangeF.PresentOverTime => "present_over_time"
        case RangeF.AbsentOverTime => "absent_over_time"
        case RangeF.StddevOverTime => "stddev_over_time"
        case RangeF.StdvarOverTime => "stdvar_over_time"
        case RangeF.MadOverTime => "mad_over_time"
        case RangeF.Resets => "resets"
        case RangeF.Changes => "changes"
        case RangeF.Idelta => "idelta"
        case RangeF.Irate => "irate"
        case RangeF.Deriv => "deriv"
        case other => throw new IllegalStateException(s"unnamed range fn $other")
      }
      s"$name($rangeText)"
  }

  private def offsetSuffix(offsetMs: Long): String =
    if (offsetMs == 0L) ""
    else if (offsetMs > 0L) s" offset ${dur(offsetMs)}"
    else s" offset -${dur(-offsetMs)}"

  /** Compound duration in the largest units that divide evenly. */
  private[promql] def dur(ms: Long): String = {
    require(ms > 0, s"duration must be positive, got $ms")
    val units = Seq("w" -> 604800000L, "d" -> 86400000L, "h" -> 3600000L,
      "m" -> 60000L, "s" -> 1000L, "ms" -> 1L)
    val sb = new StringBuilder
    var rest = ms
    for ((u, m) <- units if rest >= m) {
      sb.append(rest / m).append(u)
      rest %= m
    }
    sb.toString
  }

  /** `@` timestamps: epoch seconds (trailing-zero-trimmed decimals for
    * sub-second pins), or the unresolved `start()` / `end()` sentinels.
    * The boundary-inclusive sentinel variants print as their base form —
    * they only arise from instant-selector desugaring, where the +1 ms is
    * re-applied on parse. */
  private def atText(at: Long): String =
    if (at == PromQLParser.AtStart || at == PromQLParser.AtStartIncl) "start()"
    else if (at == PromQLParser.AtEnd || at == PromQLParser.AtEndIncl) "end()"
    else java.math.BigDecimal.valueOf(at).movePointLeft(3)
      .stripTrailingZeros().toPlainString()

  /** Numbers: integral values print without a fraction (the tokenizer
    * reads either spelling into the same Double). Non-finite values MUST
    * print as the tokens the lexer recognizes — Java's "Infinity"/"NaN"
    * spellings lex as identifiers and silently become metric selectors
    * on reparse. */
  private def num(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Inf"
    else if (d == Double.NegativeInfinity) "-Inf"
    else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Double-quoted with the Go escape set the tokenizer understands. */
  private def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    } + "\""
}
