package graft.cypher

import Ast._
import scala.collection.mutable.ArrayBuffer

/** Hand-rolled tokenizer + recursive-descent parser for the Cypher subset
  * (the reference uses a pest PEG + Pratt expressions,
  * `src/query/parser.rs:1-60` — same language, independent implementation).
  * Keywords are case-insensitive; identifiers are case-sensitive.
  *
  * Clause grammar (reference `src/query/cypher.pest:8-55`):
  *   query     := single (UNION [ALL] single)*
  *   single    := (MATCH | OPTIONAL MATCH | UNWIND | WITH)* RETURN
  *   with      := WITH [DISTINCT] items [WHERE e] [ORDER BY ...] [SKIP n] [LIMIT n]
  * Expressions add: $param, x[i], x[a..b], EXISTS { pattern [WHERE e] },
  * all/any/none/single(v IN l WHERE p), reduce(a = z, v IN l | e),
  * [v IN l WHERE p | e], simple CASE, ^ exponent.
  */
object CypherParser {

  final case class ParseError(msg: String, pos: Int)
    extends RuntimeException(s"$msg (near token $pos)")

  // ---------- tokenizer ----------
  sealed trait Tok { def text: String }
  final case class TId(text: String) extends Tok        // identifier / keyword
  final case class TNum(text: String) extends Tok
  final case class TStr(text: String) extends Tok       // unquoted content
  final case class TSym(text: String) extends Tok

  def tokenize(src: String): Vector[Tok] = {
    val out = ArrayBuffer[Tok]()
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        out += TId(src.substring(s, i))
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && src(i + 1).isDigit &&
            // `.5` literal, but not the `..` range operator or `x.1`-style
            (out.isEmpty || !out.last.isInstanceOf[TId]))) {
        val s = i
        while (i < n && (src(i).isDigit || src(i) == '.') &&
          !(src(i) == '.' && i + 1 < n && src(i + 1) == '.')) i += 1
        // scientific exponent: 1e-07, 1.5E10, 6e+3
        if (i < n && (src(i) == 'e' || src(i) == 'E') && i + 1 < n &&
            (src(i + 1).isDigit ||
              ((src(i + 1) == '+' || src(i + 1) == '-') && i + 2 < n && src(i + 2).isDigit))) {
          i += 1
          if (src(i) == '+' || src(i) == '-') i += 1
          while (i < n && src(i).isDigit) i += 1
        }
        out += TNum(src.substring(s, i))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) { sb.append(src(i + 1)); i += 2 }
          else { sb.append(src(i)); i += 1 }
        }
        if (i >= n) throw ParseError("unterminated string", i)
        i += 1
        out += TStr(sb.toString)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("<=", ">=", "<>", "->", "<-", "..", "=~", "!=", "==").contains(two)) {
          out += TSym(two); i += 2
        } else { out += TSym(c.toString); i += 1 }
      }
    }
    out.toVector
  }

  // ---------- parser ----------
  def parse(src: String): Query = new P(tokenize(src)).parseQuery()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def peekAt(k: Int): Option[Tok] = toks.lift(pos + k)
    private def next(): Tok = { val t = toks.lift(pos).getOrElse(throw ParseError("unexpected end", pos)); pos += 1; t }
    private def isKw(kw: String): Boolean = peek.exists {
      case TId(t) => t.equalsIgnoreCase(kw); case _ => false
    }
    private def isKwAt(k: Int, kw: String): Boolean = peekAt(k).exists {
      case TId(t) => t.equalsIgnoreCase(kw); case _ => false
    }
    private def eatKw(kw: String): Unit =
      if (isKw(kw)) pos += 1 else throw ParseError(s"expected $kw", pos)
    private def tryKw(kw: String): Boolean = { if (isKw(kw)) { pos += 1; true } else false }
    private def isSym(s: String): Boolean = peek.exists { case TSym(t) => t == s; case _ => false }
    private def isSymAt(k: Int, s: String): Boolean = peekAt(k).exists { case TSym(t) => t == s; case _ => false }
    private def eatSym(s: String): Unit =
      if (isSym(s)) pos += 1 else throw ParseError(s"expected '$s'", pos)
    private def trySym(s: String): Boolean = { if (isSym(s)) { pos += 1; true } else false }
    private def ident(): String = next() match {
      case TId(t) => t
      case t => throw ParseError(s"expected identifier, got ${t.text}", pos)
    }

    def parseQuery(): Query = {
      val first = singleQuery()
      val unions = ArrayBuffer[(Boolean, SingleQuery)]()
      while (isKw("UNION")) {
        eatKw("UNION")
        val all = tryKw("ALL")
        unions += ((all, singleQuery()))
      }
      if (pos < toks.length) throw ParseError(s"trailing input '${toks(pos).text}'", pos)
      Query(first, unions.toSeq)
    }

    private def singleQuery(): SingleQuery = {
      val clauses = ArrayBuffer[Clause]()
      var done = false
      while (!done) {
        if (tryKw("UNWIND")) {
          val e = expr(); eatKw("AS"); val v = ident()
          clauses += UnwindClause(e, v)
        } else if (isKw("MATCH") || (isKw("OPTIONAL") && isKwAt(1, "MATCH"))) {
          val optional = tryKw("OPTIONAL")
          eatKw("MATCH")
          val paths = ArrayBuffer(pathPattern())
          while (trySym(",")) paths += pathPattern()
          val where = if (tryKw("WHERE")) Some(expr()) else None
          clauses += MatchClause(paths.toSeq, optional, where)
        } else if (isKw("WITH")) {
          eatKw("WITH")
          val (distinct, items, order, skip, limit) = projectionBody()
          val where = if (tryKw("WHERE")) Some(expr()) else None
          clauses += WithClause(distinct, items, where, order, skip, limit)
        } else if (isKw("CREATE") && !isKwAt(1, "INDEX") && !isKwAt(1, "CONSTRAINT") && !isKwAt(1, "VECTOR")) {
          eatKw("CREATE")
          val paths = ArrayBuffer(pathPattern())
          while (trySym(",")) paths += pathPattern()
          clauses += CreateClause(paths.toSeq)
        } else if (tryKw("MERGE")) {
          val path = pathPattern()
          var onCreate: Seq[(Prop, Expr)] = Nil
          var onMatch: Seq[(Prop, Expr)] = Nil
          while (isKw("ON")) {
            eatKw("ON")
            if (tryKw("CREATE")) { eatKw("SET"); onCreate = onCreate ++ assignList() }
            else { eatKw("MATCH"); eatKw("SET"); onMatch = onMatch ++ assignList() }
          }
          clauses += MergeClause(path, onCreate, onMatch)
        } else if (tryKw("SET")) {
          val (as, lbls) = setItems()
          clauses += SetClause(as, lbls)
        } else if (tryKw("REMOVE")) {
          val (ps, lbls) = removeItems()
          clauses += RemoveClause(ps, lbls)
        } else if (isKw("DELETE") || (isKw("DETACH") && isKwAt(1, "DELETE"))) {
          val detach = tryKw("DETACH")
          eatKw("DELETE")
          val vs = ArrayBuffer(ident())
          while (trySym(",")) vs += ident()
          clauses += DeleteClause(vs.toSeq, detach)
        } else if (tryKw("FOREACH")) {
          eatSym("(")
          val v = ident(); eatKw("IN"); val lst = expr(); eatSym("|")
          // body: one or more write clauses (cypher.pest:45 foreach_body)
          val body = ArrayBuffer[Clause]()
          var bodyDone = false
          while (!bodyDone) {
            if (tryKw("SET")) {
              val (as, lbls) = setItems(); body += SetClause(as, lbls)
            } else if (tryKw("REMOVE")) {
              val (ps, lbls) = removeItems()
              body += RemoveClause(ps, lbls)
            } else if (isKw("DELETE") || (isKw("DETACH") && isKwAt(1, "DELETE"))) {
              val detach = tryKw("DETACH"); eatKw("DELETE")
              val vs = ArrayBuffer(ident()); while (trySym(",")) vs += ident()
              body += DeleteClause(vs.toSeq, detach)
            } else if (tryKw("CREATE")) {
              val paths = ArrayBuffer(pathPattern()); while (trySym(",")) paths += pathPattern()
              body += CreateClause(paths.toSeq)
            } else bodyDone = true
          }
          if (body.isEmpty) throw ParseError("FOREACH body must contain a write clause", pos)
          eatSym(")")
          clauses += ForeachClause(v, lst, body.toSeq)
        } else if (isKw("CALL") && peekAt(1).exists(t => t.isInstanceOf[TSym] && t.text == "{")) {
          eatKw("CALL"); eatSym("{")
          val inner = singleQuery()
          eatSym("}")
          clauses += CallSubquery(inner)
        } else if (tryKw("CALL")) {
          val name = new StringBuilder(ident())
          while (trySym(".")) { name.append('.').append(ident()) }
          eatSym("(")
          val args = ArrayBuffer[Expr]()
          if (!isSym(")")) { args += expr(); while (trySym(",")) args += expr() }
          eatSym(")")
          val yields = ArrayBuffer[(String, Option[String])]()
          if (tryKw("YIELD")) {
            yields += yieldItem()
            while (trySym(",")) yields += yieldItem()
          }
          val where = if (tryKw("WHERE")) Some(expr()) else None
          clauses += CallClause(name.toString, args.toSeq, yields.toSeq, where)
        } else done = true
      }
      // a standalone CALL or a write statement may omit RETURN
      val mayOmitReturn = clauses.lastOption.exists {
        case _: CallClause | _: CreateClause | _: MergeClause | _: SetClause |
             _: RemoveClause | _: DeleteClause | _: ForeachClause => true
        case _ => false
      }
      if (!isKw("RETURN") && mayOmitReturn)
        SingleQuery(clauses.toSeq, ReturnSpec(distinct = false, Seq.empty, Seq.empty, None, None))
      else {
        eatKw("RETURN")
        val (distinct, items, order, skip, limit) = projectionBody()
        SingleQuery(clauses.toSeq, ReturnSpec(distinct, items, order, skip, limit))
      }
    }

    private def yieldItem(): (String, Option[String]) = {
      val y = ident()
      val alias = if (tryKw("AS")) Some(ident()) else None
      (y, alias)
    }

    private def propRef(): Prop = {
      val v = ident(); eatSym("."); Prop(v, ident())
    }

    /** `v.key = expr, ...` (SET / ON CREATE SET / ON MATCH SET). */
    private def assignList(): Seq[(Prop, Expr)] = {
      val out = ArrayBuffer[(Prop, Expr)]()
      var more = true
      while (more) {
        val p = propRef(); eatSym("=")
        out += ((p, expr()))
        more = trySym(",")
      }
      out.toSeq
    }

    /** SET items: `v.key = expr` assignments and `v:Label[:Label2]` label
      * additions, mixed (cypher.pest:56). */
    private def setItems(): (Seq[(Prop, Expr)], Seq[(String, String)]) = {
      val assigns = ArrayBuffer[(Prop, Expr)]()
      val labels = ArrayBuffer[(String, String)]()
      var more = true
      while (more) {
        val v = ident()
        if (isSym(":")) {
          while (trySym(":")) labels += ((v, ident()))
        } else {
          eatSym("."); val k = ident(); eatSym("=")
          assigns += ((Prop(v, k), expr()))
        }
        more = trySym(",")
      }
      (assigns.toSeq, labels.toSeq)
    }

    /** REMOVE items: `v.key` property removals and `v:Label` label removals. */
    private def removeItems(): (Seq[Prop], Seq[(String, String)]) = {
      val props = ArrayBuffer[Prop]()
      val labels = ArrayBuffer[(String, String)]()
      var more = true
      while (more) {
        val v = ident()
        if (isSym(":")) {
          while (trySym(":")) labels += ((v, ident()))
        } else {
          eatSym("."); props += Prop(v, ident())
        }
        more = trySym(",")
      }
      (props.toSeq, labels.toSeq)
    }

    /** [DISTINCT] item, ... [ORDER BY ...] [SKIP n] [LIMIT n] */
    private def projectionBody(): (Boolean, Seq[ReturnItem], Seq[OrderItem], Option[Long], Option[Long]) = {
      val distinct = tryKw("DISTINCT")
      val items = ArrayBuffer(returnItem())
      while (trySym(",")) items += returnItem()
      val order = ArrayBuffer[OrderItem]()
      if (tryKw("ORDER")) {
        eatKw("BY")
        order += orderItem()
        while (trySym(",")) order += orderItem()
      }
      val skip = if (tryKw("SKIP")) Some(longLit()) else None
      val limit = if (tryKw("LIMIT")) Some(longLit()) else None
      (distinct, items.toSeq, order.toSeq, skip, limit)
    }

    private def longLit(): Long = next() match {
      case TNum(t) => t.toLong
      case t => throw ParseError(s"expected number, got ${t.text}", pos)
    }

    private def returnItem(): ReturnItem = {
      val e = expr()
      val alias = if (tryKw("AS")) Some(ident()) else None
      ReturnItem(e, alias)
    }

    private def orderItem(): OrderItem = {
      val e = expr()
      val asc = if (tryKw("DESC")) false else { tryKw("ASC"); true }
      OrderItem(e, asc)
    }

    // p = shortestPath((a)-[*..3]->(b)) | p = (a)-[:T]->(b) | (a)-[:T]->(b)
    private def pathPattern(): PathPat = {
      var pathVar: Option[String] = None
      if (peek.exists(_.isInstanceOf[TId]) && isSymAt(1, "=") &&
          !isKw("shortestPath") && !isKw("allShortestPaths")) {
        pathVar = Some(ident()); eatSym("=")
      }
      var shortest = false
      if (isKw("shortestPath") || isKw("allShortestPaths")) {
        val all = isKw("allShortestPaths")
        pos += 1; shortest = true
        eatSym("(")
        val p = barePathPattern()
        eatSym(")")
        return p.copy(pathVar = pathVar, shortest = true, allPaths = all)
      }
      barePathPattern().copy(pathVar = pathVar, shortest = shortest)
    }

    private def barePathPattern(): PathPat = {
      val nodes = ArrayBuffer(nodePattern())
      val rels = ArrayBuffer[RelPat]()
      while (isSym("-") || isSym("<-")) {
        rels += relPattern()
        nodes += nodePattern()
      }
      PathPat(nodes.toSeq, rels.toSeq)
    }

    private def nodePattern(): NodePat = {
      eatSym("(")
      val v = peek match {
        case Some(TId(t)) if !isSym(":") => pos += 1; Some(t)
        case _ => None
      }
      val labels = ArrayBuffer[String]()
      while (trySym(":")) labels += ident()
      val props = if (isSym("{")) propMap() else Nil
      eatSym(")")
      NodePat(v, labels.toSeq, props)
    }

    private def propMap(): Seq[(String, Expr)] = {
      eatSym("{")
      val out = ArrayBuffer[(String, Expr)]()
      if (!isSym("}")) {
        do {
          val k = ident(); eatSym(":")
          out += ((k, propValue()))
        } while (trySym(","))
      }
      eatSym("}")
      out.toSeq
    }

    /** literal or $param in a property map. */
    /** Property-map values: literals, $params, bare variables (FOREACH loop
      * vars, bound later by substitution), and simple arithmetic over them. */
    private def propValue(): Expr = {
      def atom(): Expr =
        if (isSym("$")) { eatSym("$"); Param(ident()) }
        else if (isSym("[")) { // list literal value, e.g. {embedding: [0.1, 0.2]}
          eatSym("[")
          val items = ArrayBuffer[Expr]()
          if (!isSym("]")) { do items += propValue() while (trySym(",")) }
          eatSym("]")
          ListLit(items.toSeq)
        }
        else if (isSym("{")) MapLit(propMap()) // nested map value
        else peek match {
          case Some(TId(t)) if !Seq("true", "false", "null").contains(t.toLowerCase) =>
            next(); Var(t)
          case _ => literal()
        }
      var e = atom()
      while (peek.exists(t => t.isInstanceOf[TSym] &&
          Seq("+", "-", "*", "/", "%").contains(t.text))) {
        val op = next().text
        e = Bin(op, e, atom())
      }
      e
    }

    private def literal(): Lit = next() match {
      case TNum(t) => if (t.exists(c => c == '.' || c == 'e' || c == 'E')) Lit(t.toDouble) else Lit(t.toLong)
      case TStr(t) => Lit(t)
      case TId(t) if t.equalsIgnoreCase("true") => Lit(true)
      case TId(t) if t.equalsIgnoreCase("false") => Lit(false)
      case TId(t) if t.equalsIgnoreCase("null") => Lit(null)
      case TSym("-") => next() match {
        case TNum(t) => if (t.exists(c => c == '.' || c == 'e' || c == 'E')) Lit(-t.toDouble) else Lit(-t.toLong)
        case t => throw ParseError(s"expected number after -, got ${t.text}", pos)
      }
      case t => throw ParseError(s"expected literal, got ${t.text}", pos)
    }

    private def relPattern(): RelPat = {
      // leading: '-' or '<-'
      val leftArrow = isSym("<-")
      if (leftArrow) eatSym("<-") else eatSym("-")
      var v: Option[String] = None
      val types = ArrayBuffer[String]()
      var min = 1; var max = 1
      var props: Seq[(String, Expr)] = Nil
      if (trySym("[")) {
        peek match {
          case Some(TId(t)) => pos += 1; v = Some(t)
          case _ =>
        }
        if (trySym(":")) {
          types += ident()
          while (trySym("|")) { trySym(":"); types += ident() }
        }
        if (trySym("*")) {
          min = 1; max = Int.MaxValue
          peek match {
            case Some(TNum(t)) => pos += 1; min = t.toInt; max = t.toInt
            case _ =>
          }
          if (trySym("..")) {
            max = Int.MaxValue
            peek match {
              case Some(TNum(t)) => pos += 1; max = t.toInt
              case _ =>
            }
          }
        }
        if (isSym("{")) props = propMap()
        eatSym("]")
      }
      val rightArrow = isSym("->")
      if (rightArrow) eatSym("->") else eatSym("-")
      val dir =
        if (leftArrow && !rightArrow) In
        else if (!leftArrow && rightArrow) Out
        else if (!leftArrow && !rightArrow) Undirected
        else throw ParseError("relationship cannot point both ways", pos)
      RelPat(v, types.toSeq, dir, min, max, props)
    }

    // ---------- expressions (precedence climbing) ----------
    def expr(): Expr = orExpr()

    private def orExpr(): Expr = {
      var l = xorExpr()
      while (tryKw("OR")) l = Bin("OR", l, xorExpr())
      l
    }
    private def xorExpr(): Expr = {
      var l = andExpr()
      while (tryKw("XOR")) l = Bin("XOR", l, andExpr())
      l
    }
    private def andExpr(): Expr = {
      var l = notExpr()
      while (tryKw("AND")) l = Bin("AND", l, notExpr())
      l
    }
    private def notExpr(): Expr =
      if (tryKw("NOT")) Not(notExpr()) else comparison()

    private def comparison(): Expr = {
      var l = addSub()
      var done = false
      while (!done) {
        if (isSym("=") || isSym("<>") || isSym("<") || isSym("<=") || isSym(">") || isSym(">=") ||
            isSym("!=") || isSym("==")) {
          // `!=`/`==` are reference-grammar aliases of `<>`/`=` (cypher.pest
          // comparison_op)
          val op = next().text match {
            case "!=" => "<>"; case "==" => "="; case o => o
          }
          l = Bin(op, l, addSub())
        } else if (isSym("=~")) {
          next(); l = StrPred("REGEX", l, addSub())
        } else if (isKw("IS")) {
          eatKw("IS")
          val neg = tryKw("NOT")
          eatKw("NULL")
          l = IsNull(l, neg)
        } else if (isKw("STARTS")) {
          eatKw("STARTS"); eatKw("WITH"); l = StrPred("STARTS", l, addSub())
        } else if (isKw("ENDS")) {
          eatKw("ENDS"); eatKw("WITH"); l = StrPred("ENDS", l, addSub())
        } else if (isKw("CONTAINS")) {
          eatKw("CONTAINS"); l = StrPred("CONTAINS", l, addSub())
        } else if (isKw("IN")) {
          eatKw("IN"); l = InList(l, addSub())
        } else done = true
      }
      l
    }

    private def addSub(): Expr = {
      var l = mulDiv()
      while (isSym("+") || isSym("-")) {
        val op = next().text
        l = Bin(op, l, mulDiv())
      }
      l
    }
    private def mulDiv(): Expr = {
      var l = powExpr()
      while (isSym("*") || isSym("/") || isSym("%")) {
        val op = next().text
        l = Bin(op, l, powExpr())
      }
      l
    }
    private def powExpr(): Expr = {
      var l = unary()
      while (isSym("^")) { next(); l = Bin("^", l, unary()) }
      l
    }
    private def unary(): Expr =
      if (trySym("-")) Bin("*", Lit(-1L), unary()) else postfix()

    /** atom followed by any number of `[i]` / `[a..b]` index/slice suffixes. */
    private def postfix(): Expr = {
      var e = atom()
      while (isSym("[")) {
        eatSym("[")
        if (isSym("..")) { // x[..b]
          eatSym("..")
          val to = if (!isSym("]")) Some(expr()) else None
          e = Slice(e, None, to)
        } else {
          val first = expr()
          if (trySym("..")) {
            val to = if (!isSym("]")) Some(expr()) else None
            e = Slice(e, Some(first), to)
          } else e = Index(e, first)
        }
        eatSym("]")
      }
      e
    }

    private def atom(): Expr = {
      if (trySym("$")) return Param(ident())
      if (trySym("(")) { val e = expr(); eatSym(")"); return e }
      if (isSym("[")) return listLitOrComprehension()
      if (isSym("{")) return MapLit(propMap()) // {k: v, ...} map literal
      if (isKw("CASE")) return caseExpr()
      if (isKw("EXISTS") && isSymAt(1, "{")) return existsSubquery()
      next() match {
        case TNum(t) => if (t.exists(c => c == '.' || c == 'e' || c == 'E')) Lit(t.toDouble) else Lit(t.toLong)
        case TStr(t) => Lit(t)
        case TId(t) if t.equalsIgnoreCase("true") => Lit(true)
        case TId(t) if t.equalsIgnoreCase("false") => Lit(false)
        case TId(t) if t.equalsIgnoreCase("null") => Lit(null)
        case TId(t) if Set("all", "any", "none", "single").contains(t.toLowerCase) && isSym("(") &&
            peekAt(1).exists(_.isInstanceOf[TId]) && isKwAt(2, "IN") =>
          eatSym("(")
          val v = ident(); eatKw("IN"); val lst = expr()
          eatKw("WHERE"); val p = expr()
          eatSym(")")
          LambdaPred(t.toLowerCase, v, lst, p)
        case TId(t) if t.equalsIgnoreCase("reduce") && isSym("(") =>
          eatSym("(")
          val acc = ident(); eatSym("="); val init = expr()
          eatSym(","); val v = ident(); eatKw("IN"); val lst = expr()
          eatSym("|"); val body = expr()
          eatSym(")")
          ReduceExpr(acc, init, v, lst, body)
        case TId(t) =>
          if (trySym("(")) { // function call
            val distinct = tryKw("DISTINCT")
            val args = ArrayBuffer[Expr]()
            if (isSym("*")) { next() } // count(*)
            else if (!isSym(")")) { do args += expr() while (trySym(",")) }
            eatSym(")")
            Fn(t, args.toSeq, distinct)
          } else if (trySym(".")) {
            val key = ident()
            // qualified function name (duration.between(...)) vs property
            if (isSym("(")) {
              eatSym("(")
              val args = ArrayBuffer[Expr]()
              if (!isSym(")")) { do args += expr() while (trySym(",")) }
              eatSym(")")
              Fn(s"$t.$key", args.toSeq)
            } else Prop(t, key)
          } else Var(t)
        case tok => throw ParseError(s"unexpected '${tok.text}'", pos)
      }
    }

    /** `[e, ...]` literal or `[v IN list WHERE p | body]` comprehension. */
    private def listLitOrComprehension(): Expr = {
      eatSym("[")
      // comprehension: ident IN ...
      if (peek.exists(_.isInstanceOf[TId]) && isKwAt(1, "IN")) {
        val v = ident(); eatKw("IN"); val lst = expr()
        val pred = if (tryKw("WHERE")) Some(expr()) else None
        val body = if (trySym("|")) Some(expr()) else None
        eatSym("]")
        return ListComp(v, lst, pred, body)
      }
      // pattern comprehension: [ (a)-[:R]->(b) [WHERE e] | proj ] — try a
      // path pattern with backtracking (a parenthesized expression like
      // `[(1+2), 3]` fails nodePattern and falls through to the literal)
      if (isSym("(")) {
        val saved = pos
        try {
          val p = barePathPattern()
          if (p.rels.nonEmpty) {
            val where = if (tryKw("WHERE")) Some(expr()) else None
            eatSym("|")
            val proj = expr()
            eatSym("]")
            return PatternComp(p, where, proj)
          } else pos = saved
        } catch { case _: ParseError => pos = saved }
      }
      val items = ArrayBuffer[Expr]()
      if (!isSym("]")) { do items += expr() while (trySym(",")) }
      eatSym("]")
      ListLit(items.toSeq)
    }

    /** EXISTS { (pattern)[, pattern...] [WHERE expr] } — also accepts an
      * optional leading MATCH inside the braces. */
    private def existsSubquery(): Expr = {
      eatKw("EXISTS")
      eatSym("{")
      tryKw("MATCH")
      val paths = ArrayBuffer(pathPattern())
      while (trySym(",")) paths += pathPattern()
      val where = if (tryKw("WHERE")) Some(expr()) else None
      eatSym("}")
      ExistsPattern(paths.toSeq, where)
    }

    private def caseExpr(): Expr = {
      eatKw("CASE")
      // simple CASE: subject expression before the first WHEN
      val subject = if (!isKw("WHEN")) Some(expr()) else None
      val branches = ArrayBuffer[(Expr, Expr)]()
      while (tryKw("WHEN")) {
        val c = expr(); eatKw("THEN"); val v = expr()
        branches += ((c, v))
      }
      val default = if (tryKw("ELSE")) Some(expr()) else None
      eatKw("END")
      CaseExpr(subject, branches.toSeq, default)
    }
  }
}
