package graft.cypher

import Ast._
import scala.collection.mutable.ArrayBuffer

/** Hand-rolled tokenizer + recursive-descent parser for the Cypher subset
  * (the reference uses a pest PEG + Pratt expressions,
  * `src/query/parser.rs:1-60` — same language, independent implementation).
  * Keywords are case-insensitive; identifiers are case-sensitive. */
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
      } else if (c.isDigit) {
        val s = i
        while (i < n && (src(i).isDigit || src(i) == '.') &&
          !(src(i) == '.' && i + 1 < n && src(i + 1) == '.')) i += 1
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
        if (Set("<=", ">=", "<>", "->", "<-", "..", "=~").contains(two)) {
          out += TSym(two); i += 2
        } else { out += TSym(c.toString); i += 1 }
      }
    }
    out.toVector
  }

  // ---------- parser ----------
  def parse(src: String): Query = new P(tokenize(src)).query()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = { val t = toks.lift(pos).getOrElse(throw ParseError("unexpected end", pos)); pos += 1; t }
    private def isKw(kw: String): Boolean = peek.exists {
      case TId(t) => t.equalsIgnoreCase(kw); case _ => false
    }
    private def eatKw(kw: String): Unit =
      if (isKw(kw)) pos += 1 else throw ParseError(s"expected $kw", pos)
    private def tryKw(kw: String): Boolean = { if (isKw(kw)) { pos += 1; true } else false }
    private def isSym(s: String): Boolean = peek.exists { case TSym(t) => t == s; case _ => false }
    private def eatSym(s: String): Unit =
      if (isSym(s)) pos += 1 else throw ParseError(s"expected '$s'", pos)
    private def trySym(s: String): Boolean = { if (isSym(s)) { pos += 1; true } else false }
    private def ident(): String = next() match {
      case TId(t) => t
      case t => throw ParseError(s"expected identifier, got ${t.text}", pos)
    }

    def query(): Query = {
      val matches = ArrayBuffer[MatchClause]()
      var unwind: Option[(Expr, String)] = None
      while (isKw("MATCH") || isKw("OPTIONAL") || isKw("UNWIND")) {
        if (tryKw("UNWIND")) {
          val e = expr(); eatKw("AS"); val v = ident()
          unwind = Some((e, v))
        } else {
          val optional = tryKw("OPTIONAL")
          eatKw("MATCH")
          val paths = ArrayBuffer(pathPattern())
          while (trySym(",")) paths += pathPattern()
          val where = if (tryKw("WHERE")) Some(expr()) else None
          matches += MatchClause(paths.toSeq, optional, where)
        }
      }
      eatKw("RETURN")
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
      if (pos < toks.length) throw ParseError(s"trailing input '${toks(pos).text}'", pos)
      Query(matches.toSeq, unwind, distinct, items.toSeq, order.toSeq, skip, limit)
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

    // (a:Label {k: v})-[r:T1|T2 *1..3]->(b)
    private def pathPattern(): PathPat = {
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

    private def propMap(): Seq[(String, Lit)] = {
      eatSym("{")
      val out = ArrayBuffer[(String, Lit)]()
      if (!isSym("}")) {
        do {
          val k = ident(); eatSym(":")
          out += ((k, literal()))
        } while (trySym(","))
      }
      eatSym("}")
      out.toSeq
    }

    private def literal(): Lit = next() match {
      case TNum(t) => if (t.contains('.')) Lit(t.toDouble) else Lit(t.toLong)
      case TStr(t) => Lit(t)
      case TId(t) if t.equalsIgnoreCase("true") => Lit(true)
      case TId(t) if t.equalsIgnoreCase("false") => Lit(false)
      case TId(t) if t.equalsIgnoreCase("null") => Lit(null)
      case TSym("-") => next() match {
        case TNum(t) => if (t.contains('.')) Lit(-t.toDouble) else Lit(-t.toLong)
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
      var props: Seq[(String, Lit)] = Nil
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
      var l = andExpr()
      while (tryKw("OR")) l = Bin("OR", l, andExpr())
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
        if (isSym("=") || isSym("<>") || isSym("<") || isSym("<=") || isSym(">") || isSym(">=")) {
          val op = next().text
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
      var l = unary()
      while (isSym("*") || isSym("/") || isSym("%")) {
        val op = next().text
        l = Bin(op, l, unary())
      }
      l
    }
    private def unary(): Expr =
      if (trySym("-")) Bin("*", Lit(-1L), unary()) else atom()

    private def atom(): Expr = {
      if (trySym("(")) { val e = expr(); eatSym(")"); return e }
      if (trySym("[")) {
        val items = ArrayBuffer[Expr]()
        if (!isSym("]")) { do items += expr() while (trySym(",")) }
        eatSym("]")
        return ListLit(items.toSeq)
      }
      if (isKw("CASE")) return caseExpr()
      next() match {
        case TNum(t) => if (t.contains('.')) Lit(t.toDouble) else Lit(t.toLong)
        case TStr(t) => Lit(t)
        case TId(t) if t.equalsIgnoreCase("true") => Lit(true)
        case TId(t) if t.equalsIgnoreCase("false") => Lit(false)
        case TId(t) if t.equalsIgnoreCase("null") => Lit(null)
        case TId(t) =>
          if (trySym("(")) { // function call
            val distinct = tryKw("DISTINCT")
            val args = ArrayBuffer[Expr]()
            if (isSym("*")) { next() } // count(*)
            else if (!isSym(")")) { do args += expr() while (trySym(",")) }
            eatSym(")")
            Fn(t, args.toSeq, distinct)
          } else if (trySym(".")) {
            Prop(t, ident())
          } else Var(t)
        case tok => throw ParseError(s"unexpected '${tok.text}'", pos)
      }
    }

    private def caseExpr(): Expr = {
      eatKw("CASE")
      val branches = ArrayBuffer[(Expr, Expr)]()
      while (tryKw("WHEN")) {
        val c = expr(); eatKw("THEN"); val v = expr()
        branches += ((c, v))
      }
      val default = if (tryKw("ELSE")) Some(expr()) else None
      eatKw("END")
      CaseExpr(branches.toSeq, default)
    }
  }
}
