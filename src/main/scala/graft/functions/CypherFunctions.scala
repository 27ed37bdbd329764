package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar-function surface (`eval_function` dispatch,
  * `src/query/executor/operator.rs:838-1824`) re-expressed as Catalyst
  * `Column` combinators — every function here compiles to built-in,
  * whole-stage-codegen'd expressions (no UDFs), so they inline into any
  * query plan.
  *
  * Naming follows Cypher; semantic deltas vs Spark built-ins are shimmed:
  * Cypher `substring` is 0-based (`operator.rs:868`) while Spark's is
  * 1-based; `log` is natural log; `head/last/tail` index lists; `range`
  * is inclusive.
  */
object CypherFunctions {

  // ---- strings (operator.rs:841-920) ----
  def toUpper(c: Column): Column = upper(c)
  def toLower(c: Column): Column = lower(c)
  /** Cypher 0-based substring(s, start[, len]). */
  def substring0(c: Column, start: Column, len: Column): Column =
    c.substr(start + lit(1), len)
  def substring0(c: Column, start: Column): Column =
    c.substr(start + lit(1), length(c))
  def left(c: Column, n: Column): Column = c.substr(lit(1), n)
  def right(c: Column, n: Column): Column =
    when(n >= length(c), c).otherwise(c.substr(length(c) - n + 1, n))
  def replaceAll(c: Column, find: Column, repl: Column): Column =
    // literal (non-regex) replace, like the reference's String::replace
    expr2("replace", c, find, repl)
  def toStringC(c: Column): Column = c.cast("string")

  // ---- conversions (operator.rs:921-943, 1531-1571) ----
  def toInteger(c: Column): Column = c.cast("long")
  def toFloat(c: Column): Column = c.cast("double")
  def toBoolean(c: Column): Column = c.cast("boolean")
  /** *OrNull variants — non-coercible input yields NULL (regex-guarded cast;
    * ANSI-safe without needing a TryCast binding). */
  def toIntegerOrNull(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s.rlike("^[+-]?[0-9]+$"), s.cast("long"))
  }
  def toFloatOrNull(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"), s.cast("double"))
  }
  def toBooleanOrNull(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    when(s.isin("true", "false", "1", "0"), s.isin("true", "1"))
  }

  /** round-half-away-from-zero on the BINARY double value —
    * `sign(x)*floor(|x|*10^s + 0.5)/10^s`, matching C `round()` and the
    * DuckDB oracle. Spark's built-in `round` re-parses the double's shortest
    * decimal string (BigDecimal HALF_UP), which disagrees with C rounding on
    * half-boundary values like 1222.745 → use this in any result that an
    * external engine will hash-compare. */
  def roundC(c: Column, s: Int): Column = {
    val p = math.pow(10, s)
    when(c.isNull, lit(null).cast("double"))
      .otherwise(signum(c) * floor(abs(c) * p + lit(0.5)) / p)
  }

  // ---- math (operator.rs:976-1044, 1465-1489) ----
  /** Cypher log = natural log. */
  def logE(c: Column): Column = log(c)
  def cot(c: Column): Column = lit(1.0) / tan(c)
  def haversin(c: Column): Column = (lit(1.0) - cos(c)) / 2.0
  def sign0(c: Column): Column = signum(c)

  // ---- lists (operator.rs:1051-1175) ----
  def head(c: Column): Column = element_at(c, 1)
  def last0(c: Column): Column = element_at(c, -1)
  def tail(c: Column): Column = slice(c, lit(2), greatest(size(c) - 1, lit(0)))
  /** Cypher range(start, end[, step]) is INCLUSIVE of end, and EMPTY when
    * the step can't reach end from start (range(1, 0) = []) — unlike
    * Spark's `sequence`, which auto-reverses the two-arg form and throws
    * on a sign-mismatched step. */
  def rangeList(start: Column, end: Column): Column =
    when(start <= end, sequence(start, end)).otherwise(typedlit(Seq.empty[Long]))
  def rangeList(start: Column, end: Column, step: Column): Column =
    when((step > 0 && start <= end) || (step < 0 && start >= end),
      sequence(start, end, step)).otherwise(typedlit(Seq.empty[Long]))
  def isEmpty(c: Column): Column = size(c) === 0

  // ---- aggregates (operator.rs percentileDisc) ----
  /** SQL-standard discrete percentile: smallest element whose cumulative
    * distribution >= p (1-based index ceil(p*n) into the sorted group).
    * Built from sort_array(collect_list) — the two identical collect_list
    * buffers are deduplicated by the physical aggregation, so this is one
    * sort-based aggregate per group. */
  def percentileDisc(c: Column, p: Column): Column = {
    val arr = sort_array(collect_list(c))
    element_at(arr, greatest(lit(1), ceil(p * size(arr)).cast("int")))
  }

  // ---- 3VL predicates (ast.rs:367-390) ----
  def allIn(list: Column, p: Column => Column): Column = forall(list, p)
  def anyIn(list: Column, p: Column => Column): Column = exists(list, p)
  def noneIn(list: Column, p: Column => Column): Column = !exists(list, p)
  def singleIn(list: Column, p: Column => Column): Column =
    size(filter(list, p)) === 1
  def reduceList(list: Column, zero: Column, f: (Column, Column) => Column): Column =
    aggregate(list, zero, f)

  // ---- graph introspection on the canonical layout ----
  def labels(nodeLabels: Column): Column = nodeLabels
  def propExists(c: Column): Column = c.isNotNull

  /** Cypher `valueType(x)` (reference `operator.rs:1513`): the Cypher type
    * name of the value. Spark's `typeof` gives the SQL type; map it onto the
    * Cypher names. */
  def valueType(c: Column): Column = {
    val t = call_function("typeof", c)
    when(c.isNull, lit("NULL"))
      .when(t.isin("tinyint", "smallint", "int", "bigint"), lit("INTEGER"))
      .when(t.isin("float", "double") || t.startsWith("decimal"), lit("FLOAT"))
      .when(t === "string", lit("STRING"))
      .when(t === "boolean", lit("BOOLEAN"))
      .when(t.startsWith("array"), lit("LIST"))
      .when(t === "date", lit("DATE"))
      .when(t.startsWith("timestamp"), lit("DATETIME"))
      .when(t.startsWith("interval"), lit("DURATION"))
      .otherwise(upper(t))
  }

  // helper: call a named SQL function on Columns (for builtins without a
  // Scala functions._ binding)
  private def expr2(name: String, cs: Column*): Column =
    call_function(name, cs: _*)
}
