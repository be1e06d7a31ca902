package graft.dqdl

/** Minimal DQDL-style ruleset parser.
  *
  * The reference delegates parsing to an external library
  * (`software.amazon.glue:dqdl`, see reference dqdl/util/DefaultDQDLParser.scala)
  * that is unavailable offline, so this is an independent, from-scratch
  * grammar covering the reference's 24 translated rule types plus composite
  * rules (reference dqdl/translation/DQDLRuleTranslator.scala:69-95,
  * dqdl/model/ExecutableRule.scala:120):
  *
  * {{{
  * Rules = [
  *   RowCount > 100,
  *   IsComplete "colA",
  *   Completeness "colA" >= 0.95,
  *   ColumnValues "status" in ["F", "O", "P"],
  *   ColumnValues "qty" between 0 and 51,
  *   ColumnValues "email" matches "[a-z]+@[a-z.]+",
  *   Mean "price" between 10.0 and 1000.0 where "qty > 0",
  *   ColumnCorrelation "a" "b" > 0.5,
  *   CustomSql "SELECT count(*) FROM primary" > 0,
  *   (RowCount > 10) and (IsComplete "colA"),
  *   ReferentialIntegrity "l_partkey" "part.p_partkey" >= 0.99
  * ]
  * }}}
  */
object DqdlParser {

  // -- AST -------------------------------------------------------------------

  sealed trait DqCondition
  /** op ∈ {>, >=, <, <=, =, !=} against a numeric threshold. */
  case class NumericCondition(op: String, value: Double) extends DqCondition
  case class BetweenCondition(lower: Double, upper: Double) extends DqCondition
  /** String or numeric literal set. */
  case class InCondition(values: Seq[String], quoted: Boolean) extends DqCondition
  case class MatchesCondition(regex: String) extends DqCondition
  /** = "StringValue" (e.g. ColumnDataType "c" = "Integer"). */
  case class EqualsStringCondition(value: String) extends DqCondition

  /** Dynamic-threshold operand: a numeric expression over the rule metric's
    * HISTORY (from a metrics repository), e.g. `avg(last(10)) * 0.9`.
    * `last(k)` yields the most recent k historical values; avg/min/max/
    * sum/std/count reduce a series to a scalar; * + / scale by literals.
    */
  sealed trait NumExpr
  case class Lit(value: Double) extends NumExpr
  case class Call(fn: String, args: Seq[NumExpr]) extends NumExpr
  case class BinOp(op: String, left: NumExpr, right: NumExpr) extends NumExpr

  /** Conditions whose thresholds are dynamic expressions; resolved against
    * metric history to plain conditions before constraint evaluation
    * (reference capability: dynamic rules in dqdl/translation/
    * DQDLRuleTranslator.scala — `RowCount between min(last(10)) and ...`).
    */
  case class DynamicNumericCondition(op: String, expr: NumExpr) extends DqCondition
  case class DynamicBetweenCondition(lower: NumExpr, upper: NumExpr) extends DqCondition

  sealed trait DqRule
  case class LeafRule(
      ruleType: String,
      parameters: Seq[String],
      condition: Option[DqCondition],
      threshold: Option[NumericCondition],
      whereClause: Option[String]) extends DqRule {
    def render: String = {
      val ps = parameters.map(p => "\"" + p + "\"").mkString(" ")
      val c = condition.map(DqdlParser.render).getOrElse("")
      val t = threshold.map(t => s" with threshold ${t.op} ${t.value}").getOrElse("")
      val w = whereClause.map(w => s""" where "$w"""").getOrElse("")
      (Seq(ruleType) ++ (if (ps.nonEmpty) Seq(ps) else Nil) ++
        (if (c.nonEmpty) Seq(c) else Nil)).mkString(" ") + t + w
    }
  }
  case class CompositeRule(op: String, left: DqRule, right: DqRule) extends DqRule

  def render(c: DqCondition): String = c match {
    case NumericCondition(op, v) => s"$op $v"
    case BetweenCondition(lo, hi) => s"between $lo and $hi"
    case InCondition(vs, quoted) =>
      if (quoted) vs.map(v => "\"" + v + "\"").mkString("in [", ", ", "]")
      else vs.mkString("in [", ", ", "]")
    case MatchesCondition(re) => "matches \"" + re + "\""
    case EqualsStringCondition(v) => "= \"" + v + "\""
    case DynamicNumericCondition(op, e) => s"$op ${renderExpr(e)}"
    case DynamicBetweenCondition(lo, hi) =>
      s"between ${renderExpr(lo)} and ${renderExpr(hi)}"
  }

  def renderExpr(e: NumExpr): String = e match {
    case Lit(v) => v.toString
    case Call(fn, args) => s"$fn(${args.map(renderExpr).mkString(", ")})"
    case BinOp(op, l, r) => s"${renderExpr(l)} $op ${renderExpr(r)}"
  }

  def renderRule(r: DqRule): String = r match {
    case l: LeafRule => l.render
    case CompositeRule(op, l, rr) => s"(${renderRule(l)}) $op (${renderRule(rr)})"
  }

  // -- Tokenizer ---------------------------------------------------------------

  private sealed trait Token
  private case class Ident(value: String) extends Token
  private case class Str(value: String) extends Token
  private case class Num(value: Double) extends Token
  private case class Sym(value: String) extends Token

  private def tokenize(input: String): List[Token] = {
    val tokens = scala.collection.mutable.ListBuffer.empty[Token]
    var i = 0
    val n = input.length
    while (i < n) {
      val ch = input(i)
      if (ch.isWhitespace) i += 1
      else if (ch == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && input(i) != '"') {
          // only \" and \\ are escapes; any other backslash passes through
          // literally — stripping it would silently corrupt regex patterns
          // (matches "\d{5}" must keep its \d)
          if (input(i) == '\\' && i + 1 < n &&
              (input(i + 1) == '"' || input(i + 1) == '\\')) {
            sb.append(input(i + 1)); i += 2
          } else { sb.append(input(i)); i += 1 }
        }
        if (i >= n) throw new DqdlParseException(s"Unterminated string literal at end of input")
        i += 1
        tokens += Str(sb.toString)
      } else if (ch.isDigit ||
                 // '-' before a digit is a NEGATIVE LITERAL only when it
                 // cannot be a binary minus (i.e. not right after a value)
                 (ch == '-' && i + 1 < n && input(i + 1).isDigit &&
                   !(tokens.lastOption.exists {
                     case Num(_) | Sym(")") => true
                     case _ => false
                   })) ||
                 (ch == '.' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (input(i).isDigit || input(i) == '.' || input(i) == 'e' ||
               input(i) == 'E' || ((input(i) == '-' || input(i) == '+') &&
                 (input(i - 1) == 'e' || input(i - 1) == 'E')))) i += 1
        val text = input.substring(start, i)
        // malformed literals (1.2.3, bare 10e) surface as ruleset syntax
        // errors, not a NumberFormatException from deep inside the scanner
        tokens += Num(try text.toDouble catch {
          case _: NumberFormatException =>
            throw new DqdlParseException(s"Malformed numeric literal '$text'")
        })
      } else if (ch.isLetter || ch == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        tokens += Ident(input.substring(start, i))
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (two == ">=" || two == "<=" || two == "!=" || two == "==") {
          tokens += Sym(if (two == "==") "=" else two); i += 2
        } else if ("[](),=<>*+/-".indexOf(ch) >= 0) {
          tokens += Sym(ch.toString); i += 1
        } else {
          throw new DqdlParseException(s"Unexpected character '$ch' at position $i")
        }
      }
    }
    tokens.toList
  }

  // -- Parser ------------------------------------------------------------------

  class DqdlParseException(message: String) extends IllegalArgumentException(message)

  private class Cursor(var tokens: List[Token]) {
    def peek: Option[Token] = tokens.headOption
    def next(): Token = tokens match {
      case h :: t => tokens = t; h
      case Nil => throw new DqdlParseException("Unexpected end of ruleset")
    }
    def expectSym(s: String): Unit = next() match {
      case Sym(`s`) => ()
      case other => throw new DqdlParseException(s"Expected '$s' but found $other")
    }
    def expectIdent(s: String): Unit = next() match {
      case Ident(v) if v.equalsIgnoreCase(s) => ()
      case other => throw new DqdlParseException(s"Expected '$s' but found $other")
    }
  }

  /** A parsed document: the `Rules = [...]` section plus the (optional)
    * `Analyzers = [...]` section of unasserted metric declarations
    * (reference capability: dqdl analyzers — compute-only entries sharing
    * the rules' fused scan).
    */
  case class DqdlDocument(rules: Seq[DqRule], analyzers: Seq[LeafRule])

  /** Parses a full `Rules = [ ... ]` document (or a bare comma-separated
    * rule list) into rules. An `Analyzers` section, if present, is parsed
    * and exposed via [[parseDocument]].
    */
  def parse(ruleset: String): Seq[DqRule] = parseDocument(ruleset).rules

  /** Parses `Rules = [...]` and/or `Analyzers = [...]` sections (either
    * order), or a bare comma-separated rule list.
    */
  def parseDocument(ruleset: String): DqdlDocument = {
    val cur = new Cursor(tokenize(ruleset))
    var rules = Seq.empty[DqRule]
    var analyzers = Seq.empty[LeafRule]
    cur.peek match {
      case Some(Ident(k)) if k.equalsIgnoreCase("Rules") || k.equalsIgnoreCase("Analyzers") =>
        var more = true
        while (more) {
          cur.peek match {
            case Some(Sym(",")) => cur.next() // optional separator between sections
            case Some(Ident(s)) if s.equalsIgnoreCase("Rules") =>
              cur.next(); cur.expectSym("="); cur.expectSym("[")
              rules = rules ++ parseRuleList(cur)
              cur.expectSym("]")
            case Some(Ident(s)) if s.equalsIgnoreCase("Analyzers") =>
              cur.next(); cur.expectSym("="); cur.expectSym("[")
              analyzers = analyzers ++ parseRuleList(cur).map {
                case l: LeafRule => l
                case other => throw new DqdlParseException(
                  s"Analyzers section entries must be simple declarations, got $other")
              }
              cur.expectSym("]")
            case None => more = false
            case other =>
              throw new DqdlParseException(s"Trailing tokens after ']': ${cur.tokens}")
          }
        }
      case _ =>
        rules = parseRuleList(cur)
        if (cur.peek.nonEmpty) {
          throw new DqdlParseException(s"Trailing tokens: ${cur.tokens}")
        }
    }
    DqdlDocument(rules, analyzers)
  }

  private def parseRuleList(cur: Cursor): Seq[DqRule] = {
    val rules = scala.collection.mutable.ListBuffer.empty[DqRule]
    var done = false
    while (!done) {
      cur.peek match {
        case None | Some(Sym("]")) => done = true
        case Some(Sym(",")) => cur.next()
        case _ => rules += parseRule(cur)
      }
    }
    rules.toList
  }

  /** Standard boolean precedence: `and` binds tighter than `or`, both
    * left-associative — `A or B and C` is `A or (B and C)`, matching what
    * a ruleset author (and SQL) means by an unparenthesized chain.
    */
  private def parseRule(cur: Cursor): DqRule = {
    var left: DqRule = parseAndChain(cur)
    var chaining = true
    while (chaining) {
      cur.peek match {
        case Some(Ident(op)) if op.equalsIgnoreCase("or") =>
          cur.next()
          left = CompositeRule("or", left, parseAndChain(cur))
        case _ => chaining = false
      }
    }
    left
  }

  private def parseAndChain(cur: Cursor): DqRule = {
    var left: DqRule = parseAtom(cur)
    var chaining = true
    while (chaining) {
      cur.peek match {
        case Some(Ident(op)) if op.equalsIgnoreCase("and") =>
          cur.next()
          left = CompositeRule("and", left, parseAtom(cur))
        case _ => chaining = false
      }
    }
    left
  }

  private def parseAtom(cur: Cursor): DqRule = cur.next() match {
    case Sym("(") =>
      val inner = parseRule(cur)
      cur.expectSym(")")
      inner
    case Ident(ruleType) =>
      // parameters: consecutive string literals
      val params = scala.collection.mutable.ListBuffer.empty[String]
      var collecting = true
      while (collecting) {
        cur.peek match {
          case Some(Str(v)) => cur.next(); params += v
          case _ => collecting = false
        }
      }
      val condition = parseCondition(cur)
      val threshold = parseThreshold(cur)
      val whereClause = parseWhere(cur)
      LeafRule(ruleType, params.toList, condition, threshold, whereClause)
    case other => throw new DqdlParseException(s"Expected a rule but found $other")
  }

  /** Numeric operand: a literal, or a dynamic expression like
    * `avg(last(10)) * 0.9`. Standard precedence: * and / bind tighter
    * than +, all left-associative — `avg(last(5)) * 2 + 10` is
    * (avg*2)+10, and `x / 2 / 2` is (x/2)/2.
    */
  private def parseOperand(cur: Cursor): NumExpr = {
    def atom(): NumExpr = cur.next() match {
      case Num(v) => Lit(v)
      case Ident(fn) =>
        cur.expectSym("(")
        val args = scala.collection.mutable.ListBuffer.empty[NumExpr]
        var done = false
        while (!done) {
          cur.peek match {
            case Some(Sym(")")) => cur.next(); done = true
            case Some(Sym(",")) => cur.next()
            case _ => args += parseOperand(cur)
          }
        }
        Call(fn.toLowerCase, args.toList)
      case other => throw new DqdlParseException(s"Expected numeric operand, found $other")
    }
    def mul(): NumExpr = {
      var left = atom()
      var more = true
      while (more) {
        cur.peek match {
          case Some(Sym(op)) if op == "*" || op == "/" =>
            cur.next(); left = BinOp(op, left, atom())
          case _ => more = false
        }
      }
      left
    }
    var left = mul()
    var more = true
    while (more) {
      cur.peek match {
        case Some(Sym(op)) if op == "+" || op == "-" =>
          cur.next(); left = BinOp(op, left, mul())
        case _ => more = false
      }
    }
    left
  }

  private def conditionFrom(op: String, e: NumExpr): DqCondition = e match {
    case Lit(v) => NumericCondition(op, v)
    case dyn => DynamicNumericCondition(op, dyn)
  }

  private def parseCondition(cur: Cursor): Option[DqCondition] = cur.peek match {
    case Some(Sym(op)) if Seq(">", ">=", "<", "<=", "=", "!=").contains(op) =>
      cur.next()
      cur.peek match {
        case Some(Str(v)) if op == "=" => cur.next(); Some(EqualsStringCondition(v))
        case _ => Some(conditionFrom(op, parseOperand(cur)))
      }
    case Some(Ident(k)) if k.equalsIgnoreCase("between") =>
      cur.next()
      val lo = parseOperand(cur)
      cur.expectIdent("and")
      val hi = parseOperand(cur)
      (lo, hi) match {
        case (Lit(l), Lit(h)) => Some(BetweenCondition(l, h))
        case _ => Some(DynamicBetweenCondition(lo, hi))
      }
    case Some(Ident(k)) if k.equalsIgnoreCase("in") =>
      cur.next()
      cur.expectSym("[")
      val values = scala.collection.mutable.ListBuffer.empty[String]
      var quoted = false
      var done = false
      while (!done) {
        cur.next() match {
          case Str(v) => values += v; quoted = true
          case Num(v) =>
            values += (if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString)
          case Sym(",") => ()
          case Sym("]") => done = true
          case other => throw new DqdlParseException(s"Unexpected token in 'in' list: $other")
        }
      }
      Some(InCondition(values.toList, quoted))
    case Some(Ident(k)) if k.equalsIgnoreCase("matches") =>
      cur.next()
      cur.next() match {
        case Str(re) => Some(MatchesCondition(re))
        case other => throw new DqdlParseException(s"Expected regex string, found $other")
      }
    case _ => None
  }

  private def parseThreshold(cur: Cursor): Option[NumericCondition] = cur.peek match {
    case Some(Ident(k)) if k.equalsIgnoreCase("with") =>
      cur.next()
      cur.expectIdent("threshold")
      cur.next() match {
        case Sym(op) if Seq(">", ">=", "<", "<=", "=", "!=").contains(op) =>
          cur.next() match {
            case Num(v) => Some(NumericCondition(op, v))
            case other => throw new DqdlParseException(s"Expected threshold value, found $other")
          }
        case other => throw new DqdlParseException(s"Expected threshold operator, found $other")
      }
    case _ => None
  }

  private def parseWhere(cur: Cursor): Option[String] = cur.peek match {
    case Some(Ident(k)) if k.equalsIgnoreCase("where") =>
      cur.next()
      cur.next() match {
        case Str(filter) => Some(filter)
        case other => throw new DqdlParseException(s"Expected quoted filter, found $other")
      }
    case _ => None
  }

  /** Turns a numeric condition into a Double assertion. Dynamic conditions
    * must be resolved against metric history first (see [[resolveDynamic]]).
    */
  def assertion(c: DqCondition): Double => Boolean = c match {
    case NumericCondition(">", v) => _ > v
    case NumericCondition(">=", v) => _ >= v
    case NumericCondition("<", v) => _ < v
    case NumericCondition("<=", v) => _ <= v
    case NumericCondition("=", v) => _ == v
    case NumericCondition("!=", v) => _ != v
    case BetweenCondition(lo, hi) => d => d > lo && d < hi
    case _: DynamicNumericCondition | _: DynamicBetweenCondition =>
      throw new DqdlParseException(
        s"Dynamic condition ${render(c)} must be resolved against metric history " +
          "(pass a MetricsRepository)")
    case other => throw new DqdlParseException(s"Condition $other is not numeric")
  }

  /** Evaluates a dynamic operand against the metric's historical values
    * (oldest first). `last(k)` selects the most recent k; avg/min/max/sum/
    * std/count reduce a series; * + / combine scalars.
    */
  def evalExpr(e: NumExpr, history: Seq[Double]): Seq[Double] = e match {
    case Lit(v) => Seq(v)
    case Call("last", Seq(Lit(k))) =>
      if (history.isEmpty) throw new DqdlParseException(
        "Dynamic rule needs metric history but the repository returned none")
      history.takeRight(math.max(k.toInt, 1))
    case Call(fn, args) =>
      val series = args.flatMap(evalExpr(_, history))
      if (series.isEmpty) throw new DqdlParseException(s"$fn() over an empty series")
      val v = fn match {
        case "avg" => series.sum / series.length
        case "min" => series.min
        case "max" => series.max
        case "sum" => series.sum
        case "count" => series.length.toDouble
        case "std" =>
          val m = series.sum / series.length
          math.sqrt(series.map(x => (x - m) * (x - m)).sum / series.length)
        case other => throw new DqdlParseException(s"Unknown dynamic function '$other'")
      }
      Seq(v)
    case BinOp(op, l, r) =>
      val lv = scalar(l, history)
      val rv = scalar(r, history)
      val v = op match {
        case "*" => lv * rv
        case "+" => lv + rv
        case "-" => lv - rv
        case "/" => lv / rv
        case other => throw new DqdlParseException(s"Unknown operator '$other'")
      }
      // a /0 would otherwise yield an Infinity/NaN threshold that fails
      // every comparison with no diagnostic — fail loudly at resolve time
      if (v.isNaN || v.isInfinite) {
        throw new DqdlParseException(
          s"Dynamic expression ${renderExpr(e)} evaluates to $v " +
            "(division by zero?) — thresholds must be finite")
      }
      Seq(v)
  }

  private def scalar(e: NumExpr, history: Seq[Double]): Double =
    evalExpr(e, history) match {
      case Seq(v) =>
        // covers bare Call results too (avg over a history containing a
        // persisted NaN) — the BinOp-level check alone missed them, and a
        // non-finite threshold fails every comparison with no diagnostic
        if (v.isNaN || v.isInfinite) {
          throw new DqdlParseException(
            s"Dynamic expression ${renderExpr(e)} evaluates to $v " +
              "— thresholds must be finite (history may contain NaN/Inf metrics)")
        }
        v
      case s => throw new DqdlParseException(
        s"Expression ${renderExpr(e)} yields a series of ${s.length} values " +
          "where a scalar is required (wrap last(k) in avg/min/max/...)")
    }

  /** Resolves dynamic thresholds to concrete numeric conditions using the
    * metric's history; plain conditions pass through unchanged.
    */
  def resolveDynamic(c: DqCondition, history: => Seq[Double]): DqCondition = c match {
    case DynamicNumericCondition(op, e) => NumericCondition(op, scalar(e, history))
    case DynamicBetweenCondition(lo, hi) =>
      BetweenCondition(scalar(lo, history), scalar(hi, history))
    case other => other
  }
}
