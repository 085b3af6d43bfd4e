package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.promql._

/** Differential fuzzing of the flat-frame instant evaluator: random small
  * fixtures × random expressions from a restricted PromQL grammar, each
  * evaluated BOTH through `PromQLContext.sqlInstant` and through a ~100-line
  * pure-Scala reference interpreter written directly from the Prometheus
  * evaluation rules (lookback = newest sample per series in (T-lb, T],
  * matcher/agg/binop semantics per the spec). The two implementations share
  * no code, so agreement over hundreds of random cases pins the evaluator's
  * instant semantics far beyond the hand-written oracle rows.
  *
  * Grammar kept to shapes whose reference semantics are unambiguous:
  * selectors with =/!=/=~/!~ matchers, vector∘scalar arithmetic and filter
  * comparisons, sum/min/max/avg/count with by/without/ungrouped, arithmetic
  * and set ops between two same-grouping aggregations.
  */
class PromQLDifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ------------------------------------------------------------- fixture
  private val schema = StructType(Seq(
    StructField("__name__", StringType), StructField("host", StringType),
    StructField("dc", StringType), StructField("tms", LongType),
    StructField("v", DoubleType)))

  private case class S(m: String, host: String, dc: String, ts: Long, v: Double)

  private def ctxOf(fx: Seq[S]): PromQLContext = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        fx.map(s => Row(s.m, s.host, s.dc, s.ts, s.v)), 3), schema)
    // metric column named __name__, exactly like the engine tier binds it,
    // so `without` drops it per Prometheus aggregation semantics
    new PromQLContext(df, "__name__", col("tms"), "v",
      Map("host" -> "host", "dc" -> "dc"), ordering = Seq(col("tms")))
  }

  // ------------------------------------------- reference interpreter (pure)
  private type Labels = Map[String, String]
  private type Vec = Map[Labels, Double]

  private sealed trait RE {
    def text: String
    /** (label names carried by the frame, instant vector at T) */
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec)
  }

  private def reMatches(re: String, v: String): Boolean =
    java.util.regex.Pattern.matches("\\A(?:" + re + ")\\z", v)

  /** Selector with an optional `offset` (shifts the read window back,
    * per-selector on its own timeline — PROMQL.md deviation 6). */
  private case class RSel(metric: String,
      ms: Seq[(String, String, String)], off: Long = 0L) extends RE {
    def text: String = {
      val base =
        if (ms.isEmpty) metric
        else metric + ms.map { case (l, op, v) => s"""$l$op"$v"""" }
          .mkString("{", ", ", "}")
      if (off == 0L) base else s"$base offset ${off / 1000}s"
    }
    def matches(h: String, d: String): Boolean = ms.forall {
      case (l, op, v) =>
        val x = if (l == "host") h else d
        op match {
          case "=" => x == v
          case "!=" => x != v
          case "=~" => reMatches(v, x)
          case "!~" => !reMatches(v, x)
        }
    }
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      // the flat evaluator projects the metric column away from selector
      // frames (the engine tier re-binds __name__ when a query references
      // it) — selector identity here is the label columns alone
      val te = t - off
      val vec = fx.filter(s => s.m == metric && s.ts > te - lb && s.ts <= te)
        .groupBy(s => (s.host, s.dc))
        .collect { case ((h, d), ss) if matches(h, d) =>
          Map("host" -> h, "dc" -> d) -> ss.maxBy(_.ts).v
        }
      (Seq("host", "dc"), vec)
    }
  }

  private def ieee(op: String, a: Double, b: Double): Double = op match {
    case "+" => a + b
    case "-" => a - b
    case "*" => a * b
    case "/" => a / b
    case "%" => a % b // Java % == Go math.Mod (x % 0 = NaN)
    case "^" => // Go math.Pow edge rules (IEEE 754-2008)
      if (a == 1.0 || (a == -1.0 && b.isInfinity)) 1.0 else math.pow(a, b)
  }
  private def cmp(op: String, a: Double, b: Double): Boolean = op match {
    case ">" => a > b
    case "<" => a < b
    case ">=" => a >= b
    case "<=" => a <= b
    case "==" => a == b
    case "!=" => a != b
  }

  /** vector ∘ scalar arithmetic; `scalarLeft` = the literal is the lhs. */
  private case class RVS(child: RE, op: String, k: Double,
      scalarLeft: Boolean) extends RE {
    // the scalar prints parenthesized: a bare negative literal under '^'
    // would re-associate (-0.5 ^ x is -(0.5 ^ x) — '^' outranks unary)
    def text: String =
      if (scalarLeft) s"($k) ${op} (${child.text})"
      else s"(${child.text}) $op ($k)"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (ls, v) = child.ref(fx, t, lb)
      (ls, v.map { case (l, x) =>
        l -> (if (scalarLeft) ieee(op, k, x) else ieee(op, x, k)) })
    }
  }

  /** vector ∘ scalar comparison: row filter, or 0/1 indicator under bool. */
  private case class RCmp(child: RE, op: String, k: Double,
      bool: Boolean = false) extends RE {
    def text: String = s"(${child.text}) $op${if (bool) " bool" else ""} $k"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (ls, v) = child.ref(fx, t, lb)
      if (bool) (ls, v.map { case (l, x) =>
        l -> (if (cmp(op, x, k)) 1.0 else 0.0) })
      else (ls, v.filter { case (_, x) => cmp(op, x, k) })
    }
  }

  /** A range selector's printed form: `base[w] offset o` (offset AFTER the
    * brackets) — and its sample window (T-o-w, T-o]. */
  private def rangeText(sel: RSel, w: Long): String =
    RSel(sel.metric, sel.ms).text + s"[${w / 1000}s]" +
      (if (sel.off == 0L) "" else s" offset ${sel.off / 1000}s")
  private def windowSamples(fx: Seq[S], sel: RSel, t: Long,
      w: Long): Map[(String, String), Seq[S]] = {
    val te = t - sel.off
    fx.filter(s => s.m == sel.metric && s.ts > te - w && s.ts <= te)
      .groupBy(s => (s.host, s.dc))
      .collect { case (k @ (h, d), ss) if sel.matches(h, d) =>
        k -> ss.sortBy(_.ts) }
  }

  /** Prometheus `quantile` over raw values: rank h = q·(n-1), linear
    * interpolation between the two bracketing sorted values. */
  private def pquantile(xs0: Seq[Double], q: Double): Double = {
    val xs = xs0.sorted
    val h = (xs.size - 1) * q
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, xs.size - 1)
    xs(lo) * (1.0 - (h - lo)) + xs(hi) * (h - lo)
  }

  /** `fn_over_time(sel[w])`: fold of each series' samples in (T-w, T].
    * `q` only applies to fn == "quantile". */
  private case class ROT(fn: String, sel: RSel, w: Long,
      q: Double = 0.5) extends RE {
    def text: String =
      if (fn == "quantile") s"quantile_over_time($q, ${rangeText(sel, w)})"
      else s"${fn}_over_time(${rangeText(sel, w)})"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      // the window reads its own range — the instant lookback is irrelevant
      def popVar(xs: Seq[Double]): Double = {
        val m = xs.sum / xs.size
        xs.map(x => (x - m) * (x - m)).sum / xs.size
      }
      val vec = windowSamples(fx, sel, t, w).map { case ((h, d), ss) =>
        val xs = ss.map(_.v)
        Map("host" -> h, "dc" -> d) -> (fn match {
          case "sum" => xs.sum
          case "min" => xs.min
          case "max" => xs.max
          case "avg" => xs.sum / xs.size
          case "count" => xs.size.toDouble
          case "last" => ss.maxBy(_.ts).v
          case "present" => 1.0
          case "stdvar" => popVar(xs)
          case "stddev" => math.sqrt(popVar(xs))
          case "quantile" => pquantile(xs, q)
          case "mad" => // median absolute deviation, both medians q(0.5)
            val med = pquantile(xs, 0.5)
            pquantile(xs.map(x => math.abs(x - med)), 0.5)
        })
      }
      (Seq("host", "dc"), vec)
    }
  }

  private case class RAgg(agg: String, without: Boolean, g: Seq[String],
      child: RE) extends RE {
    def text: String = {
      val cl = if (without) s" without (${g.mkString(", ")}) "
        else if (g.nonEmpty) s" by (${g.mkString(", ")}) " else ""
      s"$agg$cl(${child.text})"
    }
    def keysOf(childLabels: Seq[String]): Seq[String] =
      if (without) childLabels.filterNot(g.contains).filterNot(_ == "__name__")
      else g
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (ls, v) = child.ref(fx, t, lb)
      val keys = keysOf(ls)
      val grouped = v.groupBy { case (l, _) =>
        keys.map(k => k -> l.getOrElse(k, "")).toMap }
      val out = grouped.map { case (gl, rows) =>
        val xs = rows.values.toSeq
        gl -> (agg match {
          case "sum" => xs.sum
          case "min" => xs.min
          case "max" => xs.max
          case "avg" => xs.sum / xs.size
          case "count" => xs.size.toDouble
        })
      }
      (keys, out)
    }
  }

  /** arith / set op between two aggregations carrying IDENTICAL key sets
    * (the 1:1 matching shape — both sides unique per key by construction). */
  private case class RBin(l: RAgg, op: String, r: RAgg) extends RE {
    def text: String = s"(${l.text}) $op (${r.text})"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (lls, lv) = l.ref(fx, t, lb)
      val (_, rv) = r.ref(fx, t, lb)
      op match {
        case "and" => (lls, lv.filter { case (k, _) => rv.contains(k) })
        case "unless" => (lls, lv.filterNot { case (k, _) => rv.contains(k) })
        case "or" => (lls, rv ++ lv) // lhs wins on shared keys
        case _ =>
          (lls, lv.flatMap { case (k, a) =>
            rv.get(k).map(b => k -> ieee(op, a, b)) })
      }
    }
  }

  /** Many-to-one matching: `many op on(oneKeys) group_left one` — the many
    * side is grouped by BOTH labels, the one side by `oneKeys` only; every
    * many row joins its unique one-side partner and keeps its full label
    * set (Prometheus group_left). */
  private case class RGroupBin(many: RAgg, op: String, one: RAgg) extends RE {
    // explicit empty include list: a bare `group_left (expr)` reads the
    // paren as the include-label list (same ambiguity as Prometheus)
    def text: String =
      s"(${many.text}) $op on(${one.g.mkString(", ")}) group_left() (${one.text})"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (mls, mv) = many.ref(fx, t, lb)
      val (_, ov) = one.ref(fx, t, lb)
      (mls, mv.flatMap { case (k, a) =>
        val ok = one.g.map(g => g -> k.getOrElse(g, "")).toMap
        ov.get(ok).map(b => k -> ieee(op, a, b))
      })
    }
  }

  /** Counter/gauge range functions over `sel[w]` at the pinned instant
    * window (T-w, T]: reset-aware non-extrapolated rate/increase chained
    * from the first in-window sample, gauge delta, transition counts,
    * two-newest-sample irate/idelta (>= 2 samples, nonzero interval). */
  /** `tsec` only applies to fn == "predict_linear" (range-query mode only:
    * its horizon is the evaluation step T). */
  private case class RRange(fn: String, sel: RSel, w: Long,
      tsec: Long = 300L) extends RE {
    def text: String =
      if (fn == "predict_linear") s"predict_linear(${rangeText(sel, w)}, $tsec)"
      else s"$fn(${rangeText(sel, w)})"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      // least-squares fit on (query-timeline seconds, value); slope is
      // shift-invariant, the intercept/prediction use the shifted x
      def fit(ss: Seq[S]): Option[(Double, Double)] = { // (slope, intercept)
        if (ss.size < 2) None
        else {
          val xs = ss.map(s => (s.ts + sel.off) / 1000.0)
          val ys = ss.map(_.v)
          val mx = xs.sum / xs.size; val my = ys.sum / ys.size
          val sxx = xs.map(x => (x - mx) * (x - mx)).sum
          if (sxx == 0.0) None
          else {
            val slope = xs.zip(ys).map { case (x, y) =>
              (x - mx) * (y - my) }.sum / sxx
            Some((slope, my - slope * mx))
          }
        }
      }
      val vec = windowSamples(fx, sel, t, w)
        .flatMap { case ((h, d), ss) =>
          val l = Map("host" -> h, "dc" -> d)
          val pairs = ss.zip(ss.drop(1))
          fn match {
            case "deriv" => fit(ss).map { case (sl, _) => l -> sl }
            case "predict_linear" => fit(ss).map { case (sl, ic) =>
              l -> (ic + sl * (t / 1000.0 + tsec)) }
            case "rate" | "increase" =>
              val inc = pairs.map { case (p, c) =>
                if (c.v >= p.v) c.v - p.v else c.v }.sum
              Some(l -> (if (fn == "rate") inc / (w / 1000.0) else inc))
            case "delta" => Some(l -> (ss.last.v - ss.head.v))
            case "resets" =>
              Some(l -> pairs.count { case (p, c) => c.v < p.v }.toDouble)
            case "changes" =>
              Some(l -> pairs.count { case (p, c) => c.v != p.v }.toDouble)
            case "irate" | "idelta" =>
              if (ss.size < 2) None
              else {
                val Seq(p, c) = ss.takeRight(2)
                if (c.ts <= p.ts) None
                else if (fn == "idelta") Some(l -> (c.v - p.v))
                else Some(l -> ((if (c.v >= p.v) c.v - p.v else c.v) /
                  ((c.ts - p.ts) / 1000.0)))
              }
          }
        }
      (Seq("host", "dc"), vec)
    }
  }

  /** Go `Regexp.Expand` template semantics (what Prometheus label_replace
    * uses), written directly from the Go rules: `$$` literal, `$name` /
    * `${name}` longest alphanumeric run (so `$1y` is the MISSING group
    * named "1y", not group 1 + "y"), invalid reference expands empty,
    * a `$` starting no valid name stays literal. */
  private def goExpand(tmpl: String, m: java.util.regex.Matcher): String = {
    val b = new StringBuilder; var i = 0
    while (i < tmpl.length) {
      val c = tmpl.charAt(i)
      if (c == '$' && i + 1 < tmpl.length) {
        if (tmpl.charAt(i + 1) == '$') { b += '$'; i += 2 }
        else {
          val braced = tmpl.charAt(i + 1) == '{'
          var j = i + (if (braced) 2 else 1)
          val st = j
          while (j < tmpl.length &&
              (tmpl.charAt(j).isLetterOrDigit || tmpl.charAt(j) == '_')) j += 1
          val name = tmpl.substring(st, j)
          if (braced && (j >= tmpl.length || tmpl.charAt(j) != '}')) {
            b += '$'; i += 1
          } else if (name.isEmpty) { b += '$'; i += 1 }
          else {
            if (name.forall(_.isDigit)) {
              val n = name.toInt
              if (n <= m.groupCount()) b ++= Option(m.group(n)).getOrElse("")
            } // named groups are not generated — invalid => empty
            i = j + (if (braced) 1 else 0)
          }
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** Pointwise scalar function over a vector child, Go edge rules. */
  private case class RFn(fn: String, child: RE,
      args: Seq[Double] = Nil) extends RE {
    def text: String =
      if (args.isEmpty) s"$fn(${child.text})"
      else s"$fn(${child.text}, ${args.mkString(", ")})"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (ls, v) = child.ref(fx, t, lb)
      def goLog(x: Double, l: Double): Double =
        if (x > 0) l
        else if (x == 0) Double.NegativeInfinity else Double.NaN
      (ls, v.map { case (l, x) =>
        l -> (fn match {
          case "abs" => math.abs(x)
          case "exp" => math.exp(x)
          case "sqrt" => math.sqrt(x)
          case "sgn" => math.signum(x)
          case "ceil" => if (x.isNaN || x.isInfinity) x else math.ceil(x)
          case "floor" => if (x.isNaN || x.isInfinity) x else math.floor(x)
          case "ln" => goLog(x, math.log(x))
          case "log2" => goLog(x, math.log(x) / math.log(2.0))
          case "log10" => goLog(x, math.log10(x))
          case "round" => math.floor(x / args.head + 0.5) * args.head
          case "clamp_min" => math.max(x, args.head) // NaN wins in Go Max
          case "clamp_max" => if (x.isNaN) x else math.min(x, args.head)
          case "clamp" =>
            if (args(0) > args(1) || x.isNaN) Double.NaN
            else math.min(math.max(x, args(0)), args(1))
        })
      })
    }
  }

  /** `label_replace(v, dst, tmpl, src, regex)` over a selector child. */
  private case class RLblReplace(child: RSel, dst: String, tmpl: String,
      src: String, regex: String) extends RE {
    def text: String = "label_replace(" + child.text + ", \"" + dst +
      "\", \"" + tmpl + "\", \"" + src + "\", \"" + regex + "\")"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (ls, v) = child.ref(fx, t, lb)
      val pat = java.util.regex.Pattern.compile("\\A(?:" + regex + ")\\z")
      val out = v.map { case (l, x) =>
        val m = pat.matcher(l.getOrElse(src, ""))
        val nd = if (m.matches()) goExpand(tmpl, m)
                 else l.getOrElse(dst, "") // no match: row untouched
        (l + (dst -> nd)) -> x
      }
      ((ls :+ dst).distinct, out)
    }
  }

  /** `label_join(v, dst, sep, srcs...)` over a selector child. */
  private case class RLblJoin(child: RSel, dst: String, sep: String,
      srcs: Seq[String]) extends RE {
    def text: String = "label_join(" + child.text + ", \"" + dst + "\", \"" +
      sep + "\"" + srcs.map(s => ", \"" + s + "\"").mkString + ")"
    def ref(fx: Seq[S], t: Long, lb: Long): (Seq[String], Vec) = {
      val (ls, v) = child.ref(fx, t, lb)
      val out = v.map { case (l, x) =>
        (l + (dst -> srcs.map(s => l.getOrElse(s, "")).mkString(sep))) -> x
      }
      ((ls :+ dst).distinct, out)
    }
  }

  // ----------------------------------------------------------- generators
  /** `rangeOnly = true` restricts every leaf to a windowed function, so the
    * whole tree is well-defined per evaluation step T — the shape the
    * sliding range-query differential drives over a step grid. */
  private def genExpr(rnd: scala.util.Random,
      rangeOnly: Boolean = false): RE = {
    val metrics = Seq("cpu", "mem")
    val aggs = Seq("sum", "min", "max", "avg", "count")
    def sel(): RSel = {
      val nm = rnd.nextInt(3)
      val ms = (0 until nm).map { _ =>
        val (lbl, values, res) =
          if (rnd.nextBoolean()) ("host", Seq("a", "b", "c", "zz"),
            Seq("a|b", "a.*", "[ab]", "z.*", ".*"))
          else ("dc", Seq("us", "eu", "zz"), Seq("u.*", "us|eu", "e+u"))
        rnd.nextInt(4) match {
          case 0 => (lbl, "=", values(rnd.nextInt(values.size)))
          case 1 => (lbl, "!=", values(rnd.nextInt(values.size)))
          case 2 => (lbl, "=~", res(rnd.nextInt(res.size)))
          case _ => (lbl, "!~", res(rnd.nextInt(res.size)))
        }
      }
      // duplicate-label matcher pairs are legal PromQL (conjunction);
      // occasional offsets exercise the per-selector shifted timeline
      RSel(metrics(rnd.nextInt(metrics.size)), ms,
        off = if (rnd.nextInt(4) == 0) Seq(60000L, 120000L)(rnd.nextInt(2))
              else 0L)
    }
    def ot(): ROT = ROT(
      Seq("sum", "min", "max", "avg", "count", "last", "present",
        "stddev", "stdvar", "mad", "quantile")(rnd.nextInt(11)),
      sel(), Seq(120000L, 300000L)(rnd.nextInt(2)),
      q = Seq(0.0, 0.25, 0.5, 0.9, 1.0)(rnd.nextInt(5)))
    def rng(): RRange = RRange(
      // predict_linear's horizon is the evaluation step — range mode only
      (Seq("rate", "increase", "delta", "resets", "changes", "irate",
        "idelta", "deriv") ++ (if (rangeOnly) Seq("predict_linear") else Nil))
        .apply(rnd.nextInt(if (rangeOnly) 9 else 8)),
      sel(), Seq(120000L, 300000L)(rnd.nextInt(2)),
      tsec = Seq(60L, 600L)(rnd.nextInt(2)))
    def leaf(): RE =
      if (rangeOnly) { if (rnd.nextBoolean()) ot() else rng() } else sel()
    def fnOf(child: RE): RFn = rnd.nextInt(13) match {
      case 0 => RFn("abs", child)
      case 1 => RFn("exp", child)
      case 2 => RFn("sqrt", child)
      case 3 => RFn("sgn", child)
      case 4 => RFn("ceil", child)
      case 5 => RFn("floor", child)
      case 6 => RFn("ln", child)
      case 7 => RFn("log2", child)
      case 8 => RFn("log10", child)
      case 9 => RFn("round", child, Seq(Seq(0.5, 2.0)(rnd.nextInt(2))))
      case 10 => RFn("clamp_min", child, Seq(0.5))
      case 11 => RFn("clamp_max", child, Seq(2.0))
      case _ => RFn("clamp", child, Seq(-1.0, 2.0))
    }
    def vexpr(): RE = rnd.nextInt(9) match {
      case 0 => leaf()
      case 1 =>
        val ks = Seq(-2.0, -0.5, 0.5, 1.0, 2.0, 3.5)
        RVS(if (rangeOnly) leaf() else Seq(sel _, ot _, rng _)(rnd.nextInt(3))(),
          Seq("+", "-", "*", "/", "%", "^")(rnd.nextInt(6)),
          ks(rnd.nextInt(ks.size)), scalarLeft = rnd.nextBoolean())
      case 2 =>
        val ks = Seq(-1.0, 0.0, 0.5, 2.0)
        RCmp(leaf(), Seq(">", "<", ">=", "<=", "==", "!=")(rnd.nextInt(6)),
          ks(rnd.nextInt(ks.size)), bool = rnd.nextInt(3) == 0)
      case 3 | 4 => ot()
      case 5 | 6 => rng()
      case 7 => fnOf(leaf())
      case _ => leaf()
    }
    def aexpr(g: Seq[String], without: Boolean): RAgg =
      RAgg(aggs(rnd.nextInt(aggs.size)), without, g, vexpr())
    rnd.nextInt(8) match {
      case 0 | 1 => vexpr()
      case 2 =>
        val gs = Seq(Nil, Seq("host"), Seq("dc"), Seq("host", "dc"))
        aexpr(gs(rnd.nextInt(gs.size)), without = false)
      case 3 =>
        val gs = Seq(Seq("host"), Seq("dc"))
        aexpr(gs(rnd.nextInt(gs.size)), without = true)
      case 4 =>
        // same-grouping arithmetic: keys identical on both sides
        val g = Seq(Seq("host"), Seq("dc"), Seq("host", "dc"))(rnd.nextInt(3))
        RBin(aexpr(g, without = false),
          Seq("+", "-", "*", "/", "%", "^")(rnd.nextInt(6)),
          aexpr(g, without = false))
      case 5 =>
        val g = Seq(Seq("host"), Seq("dc"))(rnd.nextInt(2))
        RBin(aexpr(g, without = false),
          Seq("and", "or", "unless")(rnd.nextInt(3)), aexpr(g, without = false))
      case 6 =>
        // many-to-one: many side keeps (host, dc), one side carries the
        // on() key alone — the group_left join path
        val oneG = Seq(Seq("host"), Seq("dc"))(rnd.nextInt(2))
        RGroupBin(aexpr(Seq("host", "dc"), without = false),
          Seq("+", "-", "*", "/")(rnd.nextInt(4)),
          aexpr(oneG, without = false))
      case _ if rangeOnly => vexpr()
      case _ =>
        // label functions: Go-template expansion quirks ($1y is a MISSING
        // named group, ${1}y is group 1 + "y") and multi-source joins;
        // sometimes aggregated by the synthesized label downstream
        val src = if (rnd.nextBoolean()) "host" else "dc"
        val dstUsed = if (rnd.nextInt(3) == 0) "dc" else "lbl"
        val lf: RE =
          if (rnd.nextBoolean())
            RLblReplace(sel(), dst = dstUsed,
              tmpl = Seq("$1", "$2", "$1y", "x${1}y", "$$", "a$1-$2",
                "$0", "$10", "lit")(rnd.nextInt(9)),
              src = src,
              regex = Seq("(.)(.*)", "([a-z])([a-z])?", "(z*)(.*)",
                "u(.)", "(a|e)(.*)")(rnd.nextInt(5)))
          else
            RLblJoin(sel(), dst = dstUsed,
              sep = Seq("-", "", "::")(rnd.nextInt(3)),
              srcs = Seq(Seq("host", "dc"), Seq("dc"),
                Seq("dc", "host", "dc"))(rnd.nextInt(3)))
        if (rnd.nextInt(3) == 0)
          RAgg(aggs(rnd.nextInt(aggs.size)), without = false,
            // group by the synthesized label or an always-present one
            Seq(if (rnd.nextBoolean()) dstUsed else "dc"), lf)
        else lf
    }
  }

  private def genFixture(rnd: scala.util.Random): Seq[S] = {
    val n = 8 + rnd.nextInt(25)
    val vs = Seq(-3.0, -0.5, 0.0, 0.5, 1.0, 2.0, 2.0, 7.5, 100.0)
    (0 until n).map { _ =>
      S(if (rnd.nextBoolean()) "cpu" else "mem",
        Seq("a", "b", "c")(rnd.nextInt(3)),
        if (rnd.nextBoolean()) "us" else "eu",
        rnd.nextInt(10).toLong * 60000L,
        vs(rnd.nextInt(vs.size)))
    }.groupBy(s => (s.m, s.host, s.dc, s.ts)) // one sample per (series, ts)
      .map(_._2.head).toSeq
  }

  // --------------------------------------------------------------- compare
  private def canon(df: org.apache.spark.sql.DataFrame,
      keepBucket: Boolean = false): Vec = {
    val cols = df.columns
    val out = scala.collection.mutable.Map.empty[Labels, Double]
    df.collect().foreach { r =>
      val vi = r.fieldIndex("value")
      if (!r.isNullAt(vi)) {
        val labels = cols.zipWithIndex.collect {
          case (c, i) if c != "value" && c != "ts_ms" &&
              (keepBucket || c != "bucket_ms") =>
            c -> (if (r.isNullAt(i)) "" else r.get(i).toString)
        }.toMap
        val v = r.get(vi) match {
          case d: java.lang.Double => d.doubleValue()
          case n: java.lang.Number => n.doubleValue()
        }
        assert(!out.contains(labels),
          s"duplicate output series $labels in ${cols.mkString(",")}")
        out(labels) = v
      }
    }
    out.toMap
  }

  private def approx(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def assertSame(want: Vec, got: Vec, what: String): Unit = {
    assert(want.keySet == got.keySet,
      s"$what: series sets differ\n want ${want.keySet}\n got  ${got.keySet}")
    want.foreach { case (k, w) =>
      assert(approx(w, got(k)), s"$what: value at $k: want $w got ${got(k)}")
    }
  }

  // ------------------------------------------------------------------ test
  test("differential: 150 random (fixture, expression, T) cases agree with " +
      "an independent reference interpreter on series sets and values") {
    val rnd = new scala.util.Random(20260816L)
    var ran = 0
    for (case_ <- 1 to 150) {
      val fx = genFixture(rnd)
      val e = genExpr(rnd)
      val t = rnd.nextInt(11).toLong * 60000L + rnd.nextInt(60000L.toInt)
      val lb = Seq(120000L, 300000L, 3600000L)(rnd.nextInt(3))
      val (_, want) = e.ref(fx, t, lb)
      val got = canon(ctxOf(fx).sqlInstant(e.text, t, lookbackMs = lb))
      assertSame(want, got, s"case $case_: ${e.text} @ $t lb=$lb")
      ran += 1
    }
    assert(ran == 150)
  }

  test("differential: 80 stepped SLIDING range queries agree with the " +
      "reference per-step evaluation over the epoch-aligned grid " +
      "(windowed leaves, aggs, binops, offsets, unaligned ranges)") {
    val rnd = new scala.util.Random(816L)
    for (case_ <- 1 to 80) {
      val fx = genFixture(rnd)
      val e = genExpr(rnd, rangeOnly = true)
      val step = Seq(60000L, 120000L)(rnd.nextInt(2))
      val start = rnd.nextInt(300000).toLong + 1 // unaligned on purpose
      val end = start + 120000L + rnd.nextInt(480000).toLong
      val range = graft.storage.TimeRange(start, end)
      // the reference: every epoch-aligned step T in [start, end), the
      // instant window semantics at T, bucket_ms = T riding as a label
      val firstT = -Math.floorDiv(-start, step) * step
      val lastT = Math.floorDiv(end - 1, step) * step
      val want: Vec = (firstT to lastT by step).flatMap { t =>
        val (_, v) = e.ref(fx, t, 300000L)
        v.map { case (l, x) => (l + ("bucket_ms" -> t.toString)) -> x }
      }.toMap
      // the engine: the MetricEngine driving protocol — widen the eval
      // range by the expression's sliding lookback, fix the OUTPUT grid
      // via slidingStep's range
      val ast = PromQLParser.parse(e.text)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          fx.map(s => Row(s.m, s.host, s.dc, s.ts, s.v)), 3), schema)
      val ctx = new PromQLContext(df, "__name__", col("tms"), "v",
        Map("host" -> "host", "dc" -> "dc"), ordering = Seq(col("tms")),
        slidingStep = Some((step, range)))
      val evalRange = graft.storage.TimeRange(
        start - PromQLContext.slidingLookback(ast) + 1, end)
      val got = canon(ctx.sql(e.text, Some(step), Some(evalRange)),
        keepBucket = true)
      assertSame(want, got,
        s"case $case_: ${e.text} step=$step range=[$start,$end)")
    }
  }

  test("differential: histogram_quantile over random classic le-bucket " +
      "layouts agrees with a direct bucketQuantile reference (interpolation, " +
      "first-bucket-from-0, +Inf -> highest finite le, degenerate NaN)") {
    // Prometheus bucketQuantile over cumulative (le, count) buckets
    def bq(q: Double, bs0: Seq[(Double, Double)]): Double = {
      val bs = bs0.sortBy(_._1)
      val total = bs.map(_._2).max
      val rank = q * total
      val idx = bs.indexWhere(_._2 >= rank)
      val (le, cum) = bs(idx)
      if (le.isPosInfinity) bs.collect {
        case (l, _) if !l.isPosInfinity => l }.max
      else if (idx == 0 && le <= 0) le
      else {
        val (ple, pcum) = if (idx == 0) (0.0, 0.0) else bs(idx - 1)
        ple + (le - ple) * (rank - pcum) / (cum - pcum)
      }
    }
    val hqSchema = StructType(Seq(
      StructField("__name__", StringType), StructField("host", StringType),
      StructField("le", StringType), StructField("tms", LongType),
      StructField("v", DoubleType)))
    val rnd = new scala.util.Random(81606L)
    val allLes = Seq(0.05, 0.1, 0.5, 1.0, 2.5, 5.0, 10.0)
    for (case_ <- 1 to 120) {
      val hosts = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      val fx: Seq[(String, Double, Long, Double)] = hosts.flatMap { h =>
        val les = rnd.shuffle(allLes).take(1 + rnd.nextInt(5)).sorted :+
          Double.PositiveInfinity
        val ts = Seq(60000L, 120000L)(rnd.nextInt(2))
        // non-decreasing cumulative counts, first bucket possibly 0
        var cum = 0.0
        les.map { le => cum += rnd.nextInt(5); (h, le, ts, cum) }
      }
      val q = Seq(0.0, 0.1, 0.5, 0.9, 0.95, 1.0)(rnd.nextInt(6))
      // a mislabeled bucket series (unparsable le) must be SKIPPED like
      // Prometheus does, not fail the query via ANSI CAST_INVALID_INPUT —
      // the reference never sees these rows
      val garbage: Seq[Row] =
        if (rnd.nextBoolean())
          hosts.map(h => Row("reqs_bucket", h, "oops", 60000L, 999.0))
        else Nil
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(fx.map { case (h, le, ts, c) =>
          Row("reqs_bucket", h,
            if (le.isPosInfinity) "+Inf" else le.toString, ts, c)
        } ++ garbage, 2), hqSchema)
      val ctx = new PromQLContext(df, "__name__", col("tms"), "v",
        Map("host" -> "host", "le" -> "le"), ordering = Seq(col("tms")))
      val got = canon(
        ctx.sqlInstant(s"histogram_quantile($q, reqs_bucket)", 150000L))
      val want: Vec = fx.groupBy(_._1).map { case (h, rows) =>
        Map("host" -> h) -> bq(q, rows.map(r => (r._2, r._4)))
      }
      assertSame(want, got, s"case $case_: q=$q fx=$fx")
    }
  }

  test("scalar-function Go edges: ln/log2/log10 of zero and negatives " +
      "follow Go (-Inf / NaN, never a dropped row); clamp propagates NaN " +
      "and answers NaN when min > max; ceil/floor keep infinities") {
    val fx = Seq(
      S("cpu", "a", "us", 60000L, 0.0),   // ln -> -Inf
      S("cpu", "b", "us", 60000L, -2.0),  // ln -> NaN
      S("cpu", "c", "us", 60000L, math.E))
    val ctx = ctxOf(fx)
    def at(e: String): Map[String, Double] =
      canon(ctx.sqlInstant(e, 120000L)).map { case (l, v) => l("host") -> v }
    val ln = at("ln(cpu)")
    assert(ln.keySet == Set("a", "b", "c"), s"ln dropped rows: $ln")
    assert(ln("a").isNegInfinity && ln("b").isNaN &&
      math.abs(ln("c") - 1.0) < 1e-12, ln.toString)
    val l2 = at("log2(cpu)")
    assert(l2("a").isNegInfinity && l2("b").isNaN, l2.toString)
    val l10 = at("log10(cpu)")
    assert(l10("a").isNegInfinity && l10("b").isNaN, l10.toString)
    // NaN reaches clamp via 0/0; Go Min/Max propagate it
    val fx2 = Seq(S("cpu", "a", "us", 60000L, 0.0))
    val c2 = ctxOf(fx2)
    val nan = canon(c2.sqlInstant("clamp((cpu) / 0, 1, 5)", 120000L))
    assert(nan.values.head.isNaN, s"clamp(NaN) must be NaN: $nan")
    val nanMax = canon(c2.sqlInstant("clamp_max((cpu) / 0, 5)", 120000L))
    assert(nanMax.values.head.isNaN, s"clamp_max(NaN) must be NaN: $nanMax")
    // min > max is NaN (Prometheus funcClamp), not max
    val bad = canon(ctxOf(fx).sqlInstant("clamp(cpu, 5, 1)", 120000L))
    assert(bad.values.forall(_.isNaN), s"clamp(min>max) must be NaN: $bad")
    // infinities survive ceil/floor (Go: ceil(+Inf) = +Inf)
    val fx3 = Seq(S("cpu", "a", "us", 60000L, 2.0),
      S("cpu", "b", "us", 60000L, -2.0))
    val c3 = ctxOf(fx3)
    val ce = canon(c3.sqlInstant("ceil((cpu) / 0)", 120000L))
      .map { case (l, v) => l("host") -> v }
    assert(ce("a").isPosInfinity && ce("b").isNegInfinity,
      s"ceil(Inf) must stay Inf: $ce")
  }

  test("ungrouped aggregation over an EMPTY vector is empty for every " +
      "operator (Prometheus: count(no_such_metric) is an empty result, " +
      "not 0) — after the serving edge's null filter") {
    val fx = Seq(S("cpu", "a", "us", 60000L, 1.0))
    val ctx = ctxOf(fx)
    for (agg <- Seq("sum", "min", "max", "avg", "count", "group",
        "stddev", "stdvar")) {
      val got = canon(ctx.sqlInstant(s"""$agg(cpu{host="nope"})""", 120000L))
      assert(got.isEmpty, s"$agg over empty: $got")
    }
  }
}
