package graft.cypher

import Ast._
import graft.functions.CypherFunctions
import graft.model.PropertyGraph
import graft.operators.Traversals
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles a parsed Cypher query into a DataFrame pipeline over the
  * canonical PropertyGraph.
  *
  * This replaces the reference's Volcano planner+executor
  * (`src/query/planner.rs`, `executor/operator.rs`) with a declarative
  * translation: every MATCH step becomes a join against the edges DataFrame,
  * WHERE becomes a Catalyst filter (predicate pushdown applies), implicit
  * Cypher grouping becomes groupBy/agg, and Catalyst+AQE pick physical join
  * strategies (broadcast for small sides — the label-scan of a selective
  * label is typically broadcast, the expand join shuffles on node id).
  *
  * Variable binding convention: each pattern variable `v` contributes columns
  * `v__id`, `v__labels`, `v__<prop>` (nodes) or `v__id`, `v__relationship`,
  * `v__src`, `v__dst`, `v__<prop>` (edges). Node/edge identity and equality
  * are BY ID, matching the reference (`record.rs:95-131`).
  */
final class Translator(g: PropertyGraph) {

  private var anonCount = 0
  private def fresh(): String = { anonCount += 1; s"_a$anonCount" }
  private var unwindVars: Set[String] = Set.empty

  def translate(q: Query): DataFrame = {
    var df: DataFrame = null
    var bound: Set[String] = Set.empty

    for (clause <- q.matches) {
      val (cdf, cvars) = translateClause(clause, bound)
      if (df == null) {
        df = cdf; bound = cvars
        if (!clause.optional) clause.where.foreach(w => df = df.filter(toCol(w)))
      } else {
        val shared = (bound intersect cvars).toSeq
        val joinType = if (clause.optional) "left_outer" else "inner"
        if (shared.isEmpty) {
          df = if (clause.optional) df.crossJoin(cdf) else df.crossJoin(cdf)
        } else {
          // join on shared node ids; drop the right side's duplicate columns
          var right = cdf
          val conds = shared.map { v =>
            right = right.withColumnRenamed(s"${v}__id", s"__r_${v}__id")
            col(s"${v}__id") === col(s"__r_${v}__id")
          }
          // drop right-side duplicates of every shared var's other columns
          val dupCols = right.columns.filter(c =>
            shared.exists(v => c.startsWith(s"${v}__")))
          right = right.drop(dupCols: _*)
          df = df.join(right, conds.reduce(_ && _), joinType)
            .drop(shared.map(v => s"__r_${v}__id"): _*)
        }
        bound = bound union cvars
        if (!clause.optional) clause.where.foreach(w => df = df.filter(toCol(w)))
      }
    }

    q.unwind.foreach { case (listExpr, v) =>
      val src = if (df == null) g.nodes.sparkSession.range(1).toDF() else df
      df = src.withColumn(v, explode(toCol(listExpr)))
      unwindVars += v
    }
    if (df == null)
      df = g.nodes.sparkSession.range(1).toDF() // RETURN-only query

    // RETURN: implicit grouping if any item aggregates
    val items = q.returnItems
    val hasAgg = items.exists(i => isAggregate(i.expr))
    var out =
      if (hasAgg) {
        val keys = items.filter(i => !isAggregate(i.expr))
        val aggs = items.filter(i => isAggregate(i.expr))
        val keyCols = keys.map(i => toCol(i.expr).as(i.name))
        val aggCols = aggs.map(i => toAggCol(i.expr).as(i.name))
        if (keys.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      } else df.select(items.map(i => toCol(i.expr).as(i.name)): _*)

    if (q.returnDistinct) out = out.distinct()

    if (q.orderBy.nonEmpty) {
      val names = items.map(_.name).toSet
      val sortCols = q.orderBy.map { o =>
        val c = o.expr match {
          case Var(n) if names.contains(n) => col(n)
          case Prop(v, k) if names.contains(s"$v.$k") => col(s"`$v.$k`")
          case e if names.contains(Render.name(e)) => col(s"`${Render.name(e)}`")
          case e => toCol(e)
        }
        if (o.asc) c.asc else c.desc
      }
      out = out.orderBy(sortCols: _*)
    }
    q.skip.foreach(n => out = out.offset(n.toInt))
    q.limit.foreach(n => out = out.limit(n.toInt))
    out
  }

  // ---------- clause / path translation ----------

  private def translateClause(clause: MatchClause, outerBound: Set[String]): (DataFrame, Set[String]) = {
    var df: DataFrame = null
    var vars: Set[String] = Set.empty
    for (path <- clause.paths) {
      val (pdf, pvars) = translatePath(path)
      if (df == null) { df = pdf; vars = pvars }
      else {
        val shared = (vars intersect pvars).toSeq
        if (shared.isEmpty) df = df.crossJoin(pdf)
        else {
          var right = pdf
          val conds = shared.map { v =>
            right = right.withColumnRenamed(s"${v}__id", s"__p_${v}__id")
            col(s"${v}__id") === col(s"__p_${v}__id")
          }
          val dup = right.columns.filter(c => shared.exists(v => c.startsWith(s"${v}__")))
          df = df.join(right.drop(dup: _*), conds.reduce(_ && _))
            .drop(shared.map(v => s"__p_${v}__id"): _*)
        }
        vars = vars union pvars
      }
    }
    if (clause.optional) clause.where.foreach(w => df = df.filter(toCol(w)))
    (df, vars)
  }

  private def translatePath(path0: PathPat): (DataFrame, Set[String]) = {
    // anchor heuristic: start from a labeled/constrained end (reference's
    // cost-based anchor selection, ADR-015 — simplified to
    // "prefer the selective end" pending a stats catalog)
    val path = {
      def selective(n: NodePat) = n.labels.nonEmpty || n.props.nonEmpty
      if (path0.nodes.nonEmpty && !selective(path0.nodes.head) &&
          selective(path0.nodes.last) && path0.rels.forall(!_.isVarLength))
        PathPat(path0.nodes.reverse, path0.rels.reverse.map(r => r.copy(dir = r.dir match {
          case Out => In; case In => Out; case Undirected => Undirected
        })))
      else path0
    }

    val headVar = path.nodes.head.variable.getOrElse(fresh())
    var df = scanNode(path.nodes.head, headVar)
    var vars = Set(headVar)
    var cur = headVar
    for ((rel, node) <- path.rels.zip(path.nodes.tail)) {
      val tgtVar = node.variable.getOrElse(fresh())
      df =
        if (rel.isVarLength) expandVarLength(df, cur, rel, node, tgtVar, vars)
        else expandOne(df, cur, rel, node, tgtVar, vars)
      rel.variable.foreach(v => vars += v)
      vars += tgtVar
      cur = tgtVar
    }
    (df, vars)
  }

  private def prefixAll(df: DataFrame, v: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"${v}__$c")): _*)

  private def scanNode(n: NodePat, v: String): DataFrame = {
    var df = n.labels.foldLeft(g.nodes)((d, l) => d.filter(array_contains(col("labels"), l)))
    for ((k, Lit(value)) <- n.props) df = df.filter(col(k) === lit(value))
    prefixAll(df, v)
  }

  /** Oriented candidate edges for one hop: (__from, __to, <relVar>__*). */
  private def orientedEdges(rel: RelPat, relVar: String): DataFrame = {
    var e = g.edgesOfType(rel.types: _*)
    for ((k, Lit(value)) <- rel.props) e = e.filter(col(k) === lit(value))
    val pre = prefixAll(e, relVar)
    def orient(from: String, to: String) =
      pre.withColumn("__from", col(s"${relVar}__$from"))
        .withColumn("__to", col(s"${relVar}__$to"))
    rel.dir match {
      case Out => orient("src", "dst")
      case In => orient("dst", "src")
      case Undirected => orient("src", "dst").unionAll(orient("dst", "src"))
    }
  }

  private def expandOne(df: DataFrame, srcVar: String, rel: RelPat,
                        node: NodePat, tgtVar: String, bound: Set[String]): DataFrame = {
    val relVar = rel.variable.getOrElse(fresh())
    val e = orientedEdges(rel, relVar)
    var joined = df.join(e, col(s"${srcVar}__id") === col("__from"))
    if (bound.contains(tgtVar)) {
      // ExpandInto: target already bound -> existence filter on its id
      joined = joined.filter(col("__to") === col(s"${tgtVar}__id"))
    } else {
      val tgt = scanNode(node, tgtVar)
      joined = joined.join(tgt, col("__to") === col(s"${tgtVar}__id"))
    }
    val out = joined.drop("__from", "__to")
    if (rel.variable.isDefined) out
    else out.drop(out.columns.filter(_.startsWith(s"${relVar}__")): _*)
  }

  private def expandVarLength(df: DataFrame, srcVar: String, rel: RelPat,
                              node: NodePat, tgtVar: String, bound: Set[String]): DataFrame = {
    val maxHops = if (rel.maxHops == Int.MaxValue) 15 else rel.maxHops
    var e = g.edgesOfType(rel.types: _*)
    e = rel.dir match {
      case Out => e
      case In => e.select(col("dst").as("src"), col("src").as("dst"))
      case Undirected => e.select(col("src"), col("dst"))
        .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    }
    val starts = df.select(col(s"${srcVar}__id").as("__s")).distinct()
    val pairs = Traversals.varLengthExpand(e, starts, "__s", math.max(rel.minHops, 1), maxHops)
      .select(col("start").as("__vfrom"), col("node").as("__vto"))
    var joined = df.join(pairs, col(s"${srcVar}__id") === col("__vfrom"))
    if (bound.contains(tgtVar)) {
      joined = joined.filter(col("__vto") === col(s"${tgtVar}__id"))
    } else {
      val tgt = scanNode(node, tgtVar)
      joined = joined.join(tgt, col("__vto") === col(s"${tgtVar}__id"))
    }
    joined.drop("__vfrom", "__vto")
  }

  // ---------- expression translation ----------

  def toCol(e: Expr): Column = e match {
    case Lit(null) => lit(null)
    case Lit(v) => lit(v)
    case Var(n) => if (unwindVars.contains(n)) col(n) else col(s"${n}__id")
    case Prop(v, k) => col(s"${v}__$k")
    case ListLit(items) => array(items.map(toCol): _*)
    case Bin(op, l, r) =>
      val (a, b) = (toCol(l), toCol(r))
      op match {
        case "=" => a === b
        case "<>" => a =!= b
        case "<" => a < b
        case "<=" => a <= b
        case ">" => a > b
        case ">=" => a >= b
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
        case "AND" => a && b
        case "OR" => a || b
      }
    case Not(x) => !toCol(x)
    case IsNull(x, neg) => if (neg) toCol(x).isNotNull else toCol(x).isNull
    case StrPred(op, l, r) =>
      val (a, b) = (toCol(l), toCol(r))
      op match {
        case "STARTS" => a.startsWith(b)
        case "ENDS" => a.endsWith(b)
        case "CONTAINS" => a.contains(b)
        case "REGEX" => r match {
          case Lit(s: String) => a.rlike(s)
          case _ => a.rlike(b.toString)
        }
      }
    case InList(x, list) => list match {
      case ListLit(items) => toCol(x).isin(items.map { case Lit(v) => v; case o => o }: _*)
      case other => array_contains(toCol(other), toCol(x))
    }
    case CaseExpr(branches, default) =>
      val start = when(toCol(branches.head._1), toCol(branches.head._2))
      val chained = branches.tail.foldLeft(start)((acc, b) =>
        acc.when(toCol(b._1), toCol(b._2)))
      default.map(d => chained.otherwise(toCol(d))).getOrElse(chained)
    case Fn(name, args, _) => scalarFn(name.toLowerCase, args, toCol)
  }

  /** Scalar function registry — Cypher surface from the reference's
    * eval_function (`operator.rs:838-1824`) mapped onto CypherFunctions /
    * built-ins. `tr` translates argument expressions (toCol normally;
    * toAggCol when the call wraps an aggregate, e.g. round(sum(x), 2)). */
  private def scalarFn(name: String, args: Seq[Expr], tr: Expr => Column): Column = {
    def toCol(e: Expr): Column = tr(e)
    def a0 = toCol(args(0)); def a1 = toCol(args(1))
    name match {
      case "id" | "elementid" => args.head match {
        case Var(n) => col(s"${n}__id")
        case e => toCol(e)
      }
      case "labels" => args.head match { case Var(n) => col(s"${n}__labels"); case e => toCol(e) }
      case "type" => args.head match { case Var(n) => col(s"${n}__relationship"); case e => toCol(e) }
      case "startnode" => args.head match { case Var(n) => col(s"${n}__src"); case e => toCol(e) }
      case "endnode" => args.head match { case Var(n) => col(s"${n}__dst"); case e => toCol(e) }
      case "toupper" | "touppercase" => upper(a0)
      case "tolower" | "tolowercase" => lower(a0)
      case "trim" => trim(a0)
      case "ltrim" => ltrim(a0)
      case "rtrim" => rtrim(a0)
      case "reverse" => reverse(a0)
      case "replace" => CypherFunctions.replaceAll(a0, a1, toCol(args(2)))
      case "substring" =>
        if (args.length >= 3) CypherFunctions.substring0(a0, a1, toCol(args(2)))
        else CypherFunctions.substring0(a0, a1)
      case "left" => CypherFunctions.left(a0, a1)
      case "right" => CypherFunctions.right(a0, a1)
      case "split" => split(a0, args(1) match { case Lit(s: String) => java.util.regex.Pattern.quote(s); case _ => "," })
      case "tostring" => a0.cast("string")
      case "tointeger" | "toint" => a0.cast("long")
      case "tofloat" => a0.cast("double")
      case "toboolean" => a0.cast("boolean")
      case "tointegerornull" => CypherFunctions.toIntegerOrNull(a0)
      case "tofloatornull" => CypherFunctions.toFloatOrNull(a0)
      case "tobooleanornull" => CypherFunctions.toBooleanOrNull(a0)
      case "size" => size(a0)            // lists (Cypher size)
      case "length" | "char_length" | "character_length" => length(a0) // strings
      case "abs" => abs(a0)
      case "ceil" => ceil(a0)
      case "floor" => floor(a0)
      case "round" => if (args.length > 1) args(1) match {
        case Lit(n: Long) => CypherFunctions.roundC(a0, n.toInt)
        case _ => CypherFunctions.roundC(a0, 0)
      } else CypherFunctions.roundC(a0, 0)
      case "sqrt" => sqrt(a0)
      case "sign" => signum(a0)
      case "log" => log(a0)
      case "log10" => log10(a0)
      case "exp" => exp(a0)
      case "e" => lit(math.E)
      case "pi" => lit(math.Pi)
      case "sin" => sin(a0); case "cos" => cos(a0); case "tan" => tan(a0)
      case "asin" => asin(a0); case "acos" => acos(a0); case "atan" => atan(a0)
      case "atan2" => atan2(a0, a1)
      case "cot" => CypherFunctions.cot(a0)
      case "haversin" => CypherFunctions.haversin(a0)
      case "degrees" => degrees(a0); case "radians" => radians(a0)
      case "rand" => rand()
      case "randomuuid" => expr("uuid()")
      case "coalesce" => coalesce(args.map(toCol): _*)
      case "head" => CypherFunctions.head(a0)
      case "last" => CypherFunctions.last0(a0)
      case "tail" => CypherFunctions.tail(a0)
      case "range" =>
        if (args.length > 2) CypherFunctions.rangeList(a0, a1, toCol(args(2)))
        else CypherFunctions.rangeList(a0, a1)
      case "exists" => toCol(args.head).isNotNull
      case "isempty" => CypherFunctions.isEmpty(a0)
      case "timestamp" => (unix_micros(current_timestamp()) / 1000).cast("long")
      case "date" => if (args.isEmpty) current_date() else to_date(a0)
      case "datetime" => if (args.isEmpty) current_timestamp() else to_timestamp(a0)
      case other => call_function(other, args.map(toCol): _*)
    }
  }

  private def toAggCol(e: Expr): Column = e match {
    case Fn(name, args, distinct) if AggregateFns.contains(name.toLowerCase) =>
      val n = name.toLowerCase
      n match {
        case "count" =>
          if (args.isEmpty) count(lit(1))
          else if (distinct) countDistinct(toCol(args.head))
          else count(toCol(args.head))
        case "sum" => sum(toCol(args.head))
        case "avg" => avg(toCol(args.head))
        case "min" => min(toCol(args.head))
        case "max" => max(toCol(args.head))
        case "collect" =>
          if (distinct) sort_array(collect_set(toCol(args.head)))
          else collect_list(toCol(args.head))
        case "stdev" => stddev_samp(toCol(args.head))
        case "stdevp" => stddev_pop(toCol(args.head))
        case "percentilecont" => percentile(toCol(args.head), toCol(args(1)))
        case "percentiledisc" => percentile(toCol(args.head), toCol(args(1)))
      }
    case Fn(name, args, _) if !AggregateFns.contains(name.toLowerCase) =>
      scalarFn(name.toLowerCase, args, toAggCol) // e.g. round(sum(x), 2)
    case Bin(op, l, r) =>
      val (a, b) = (toAggCol(l), toAggCol(r))
      op match {
        case "+" => a + b; case "-" => a - b; case "*" => a * b
        case "/" => a / b; case "%" => a % b
        case _ => toCol(e)
      }
    case other => toCol(other) // grouping-key expr nested inside agg item
  }
}

/** Public entry: `QueryEngine.execute(cypher, graph)` — parse + translate +
  * hand Catalyst the declarative plan (reference lifecycle §3.1 stages 1-3;
  * stages 4+ are Spark). */
object QueryEngine {
  def execute(cypher: String, g: PropertyGraph): DataFrame =
    new Translator(g).translate(CypherParser.parse(cypher))

  /** Our planner's view + Catalyst's — reference EXPLAIN analog. */
  def explain(cypher: String, g: PropertyGraph): String = {
    val ast = CypherParser.parse(cypher)
    val df = new Translator(g).translate(ast)
    s"AST: $ast\n\n${df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))}"
  }
}
