package graft.cypher

/** AST for the supported OpenCypher subset (reference grammar:
  * `src/query/cypher.pest`, AST `src/query/ast.rs:69-458` — re-derived, not
  * ported; this subset covers MATCH / OPTIONAL MATCH patterns with
  * var-length relationships, WHERE expressions, RETURN with implicit
  * aggregation, ORDER BY / SKIP / LIMIT / DISTINCT). */
object Ast {

  sealed trait Expr
  final case class Lit(v: Any) extends Expr                      // string/long/double/bool/null
  final case class Var(name: String) extends Expr                // bound variable
  final case class Prop(variable: String, key: String) extends Expr // a.name
  final case class Fn(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr // = <> < <= > >= + - * / % AND OR
  final case class Not(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class StrPred(op: String, l: Expr, r: Expr) extends Expr // STARTS/ENDS/CONTAINS/REGEX
  final case class InList(e: Expr, list: Expr) extends Expr
  final case class CaseExpr(branches: Seq[(Expr, Expr)], default: Option[Expr]) extends Expr

  sealed trait Direction
  case object Out extends Direction
  case object In extends Direction
  case object Undirected extends Direction

  final case class NodePat(variable: Option[String], labels: Seq[String],
                           props: Seq[(String, Lit)])
  final case class RelPat(variable: Option[String], types: Seq[String],
                          dir: Direction, minHops: Int = 1, maxHops: Int = 1,
                          props: Seq[(String, Lit)] = Nil) {
    def isVarLength: Boolean = !(minHops == 1 && maxHops == 1)
  }
  /** A linear path pattern: n0 (r0 n1 (r1 n2 ...)). */
  final case class PathPat(nodes: Seq[NodePat], rels: Seq[RelPat])

  final case class ReturnItem(expr: Expr, alias: Option[String]) {
    def name: String = alias.getOrElse(Render.name(expr))
  }
  final case class OrderItem(expr: Expr, asc: Boolean)

  final case class MatchClause(paths: Seq[PathPat], optional: Boolean,
                               where: Option[Expr])

  final case class Query(matches: Seq[MatchClause],
                         unwind: Option[(Expr, String)],
                         returnDistinct: Boolean,
                         returnItems: Seq[ReturnItem],
                         orderBy: Seq[OrderItem],
                         skip: Option[Long],
                         limit: Option[Long])

  /** Default output names for un-aliased return items (Cypher renders the
    * expression text; we use a stable compact form). */
  object Render {
    def name(e: Expr): String = e match {
      case Var(n) => n
      case Prop(v, k) => s"$v.$k"
      case Fn(n, args, d) =>
        val inner = if (args.isEmpty) "*" else args.map(name).mkString(",")
        s"$n(${if (d) "DISTINCT " else ""}$inner)"
      case Lit(v) => String.valueOf(v)
      case Bin(op, l, r) => s"${name(l)}$op${name(r)}"
      case other => other.toString.take(40)
    }
  }

  val AggregateFns: Set[String] =
    Set("count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
      "percentilecont", "percentiledisc")

  def isAggregate(e: Expr): Boolean = e match {
    case Fn(n, args, _) =>
      AggregateFns.contains(n.toLowerCase) || args.exists(isAggregate)
    case Bin(_, l, r) => isAggregate(l) || isAggregate(r)
    case Not(x) => isAggregate(x)
    case CaseExpr(bs, d) =>
      bs.exists(b => isAggregate(b._1) || isAggregate(b._2)) || d.exists(isAggregate)
    case _ => false
  }
}
