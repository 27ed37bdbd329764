package graft.queries

import graft.functions.CypherFunctions
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational / expression / aggregation operator catalog (SURVEY.md §2.1,
  * §2.2, §2.5, §2.6, §2.7, §2.11). Every query here has a DuckDB oracle in
  * `oracles` with IDENTICAL column names and types; double aggregates are
  * rounded on both sides to absorb summation-order ULP differences.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 NodeScanOperator: label scan + pushed filter
    "q_scan_filter" -> ((s, d) => t(s, d, "part")
      .filter(col("p_size") >= 25 && col("p_type") === "ECONOMY")
      .select(col("p_partkey"), col("p_name"), col("p_size"))
      .orderBy(col("p_partkey"))),

    // §2.1 NodeByIdOperator: point lookup
    "q_node_by_id" -> ((s, d) => t(s, d, "customer")
      .filter(col("c_custkey") === 42)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),

    // §2.1 LabelCountOperator (ADR-027 count store)
    "q_label_count" -> ((s, d) => t(s, d, "customer")
      .agg(count(lit(1)).as("n_customers"))),

    // §2.2 ProjectOperator: expressions + aliases
    "q_project_expr" -> ((s, d) => t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        CypherFunctions.roundC(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_price"),
        (col("l_quantity") > 25).as("bulk"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // §2.2 FilterOperator with 3VL null semantics
    "q_filter_3vl" -> ((s, d) => {
      val maybe = when(col("o_orderstatus") === "F", lit(null)).otherwise(col("o_orderstatus"))
      t(s, d, "orders")
        .filter(maybe.isNull || maybe === "O")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // §2.2 CASE (searched) expression
    "q_case_when" -> ((s, d) => t(s, d, "orders")
      .groupBy(col("o_orderpriority"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("bucket"))
      .agg(count(lit(1)).as("n"), CypherFunctions.roundC(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("o_orderpriority"), col("bucket"))),

    // §2.11 string functions (Cypher 0-based substring shims)
    "q_string_fns" -> ((s, d) => t(s, d, "customer")
      .filter(col("c_custkey") < 300)
      .select(col("c_custkey"),
        CypherFunctions.toUpper(col("c_name")).as("up"),
        CypherFunctions.toLower(col("c_mktsegment")).as("lo"),
        CypherFunctions.substring0(col("c_name"), lit(9)).as("tail9"),
        CypherFunctions.left(col("c_name"), lit(8)).as("l8"),
        CypherFunctions.right(col("c_name"), lit(4)).as("r4"),
        CypherFunctions.replaceAll(col("c_name"), lit("Customer"), lit("Cust")).as("repl"),
        reverse(col("c_mktsegment")).as("rev"),
        concat(col("c_mktsegment"), lit("_"), col("c_name")).as("cat"),
        col("c_name").startsWith("Customer").as("sw"),
        col("c_name").endsWith("1").as("ew"),
        col("c_name").contains("00").as("has00"))
      .orderBy(col("c_custkey"))),

    // §2.11 math functions
    "q_math_fns" -> ((s, d) => t(s, d, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        CypherFunctions.roundC(abs(col("o_totalprice") - 150000), 2).as("dev"),
        ceil(col("o_totalprice") / 1000).as("ceil_k"),
        floor(col("o_totalprice") / 1000).as("floor_k"),
        CypherFunctions.roundC(sqrt(col("o_totalprice")), 4).as("sq"),
        signum(col("o_totalprice") - lit(150000.0)).as("sgn"),
        CypherFunctions.roundC(log(col("o_totalprice")), 4).as("ln_p"),
        CypherFunctions.roundC(log10(col("o_totalprice")), 4).as("lg"),
        CypherFunctions.roundC(exp(col("o_totalprice") / lit(1000000.0)), 4).as("ex"),
        pmod(col("o_orderkey"), lit(7)).as("m7"))
      .orderBy(col("o_orderkey"))),

    // §2.11 temporal functions
    "q_temporal_fns" -> ((s, d) => t(s, d, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("dd"))
      .orderBy(col("o_orderkey"))),

    // §2.11 list functions (head/last/size/contains/slice)
    "q_list_fns" -> ((s, d) => {
      val w = split(col("text"), " ")
      t(s, d, "documents").select(col("doc_id"),
        size(w).as("n_words"),
        CypherFunctions.head(w).as("first_w"),
        CypherFunctions.last0(w).as("last_w"),
        array_contains(w, "spark").as("has_spark"),
        array_join(slice(w, lit(1), lit(3)), "_").as("first3"))
        .orderBy(col("doc_id"))
    }),

    // §2.2 regex operators (=~, regexp_extract/replace)
    "q_regex_fns" -> ((s, d) => t(s, d, "customer")
      .filter(col("c_custkey") < 300)
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        col("c_name").rlike("0{3}").as("has3z"),
        regexp_replace(lower(col("c_mktsegment")), "[aeiou]", "_").as("vowels"))
      .orderBy(col("c_custkey"))),

    // §2.11 coalesce / nullif
    "q_coalesce" -> ((s, d) => {
      val maybe = when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_orderstatus"))
      t(s, d, "orders").filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          coalesce(maybe, lit("pending")).as("st"),
          when(maybe.isNotNull, "known").otherwise("unknown").as("known"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.5 AggregateOperator: multi-key hash aggregation (TPC-H Q1 shape)
    "q1_agg" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(CypherFunctions.roundC(sum(col("l_quantity")), 2).as("sum_qty"),
        CypherFunctions.roundC(sum(col("l_extendedprice")), 2).as("sum_base"),
        CypherFunctions.roundC(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
        CypherFunctions.roundC(avg(col("l_quantity")), 4).as("avg_qty"),
        CypherFunctions.roundC(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // §2.5 count(DISTINCT)
    "q_count_distinct" -> ((s, d) => t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("c_mktsegment")).as("n_seg"), count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))),

    // §2.5 collect(DISTINCT) — sorted + joined to a scalar string so the
    // cross-engine compare never has to hash an array column
    "q_collect_list" -> ((s, d) => t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segs"))
      .orderBy(col("c_nationkey"))),

    // §2.5 percentileCont
    "q_percentile" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(CypherFunctions.roundC(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
        CypherFunctions.roundC(percentile(col("l_quantity"), lit(0.9)), 4).as("p90"))
      .orderBy(col("l_returnflag"))),

    // §2.5 percentileDisc — true discrete percentile (actual group element)
    "q_percentile_disc" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(CypherFunctions.percentileDisc(col("l_quantity"), lit(0.5)).as("p50"),
        CypherFunctions.percentileDisc(col("l_quantity"), lit(0.9)).as("p90"),
        CypherFunctions.percentileDisc(col("l_extendedprice"), lit(0.25)).as("p25_price"))
      .orderBy(col("l_returnflag"))),

    // §2.5 stDev / stDevP / variance
    "q_stddev" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(CypherFunctions.roundC(stddev_samp(col("l_extendedprice")), 2).as("sd"),
        CypherFunctions.roundC(var_samp(col("l_quantity")), 4).as("vr"),
        CypherFunctions.roundC(stddev_pop(col("l_discount")), 6).as("sdp"))
      .orderBy(col("l_returnflag"))),

    // §2.7 WITH ... WHERE on aggregate (HAVING)
    "q_having" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), CypherFunctions.roundC(sum(col("l_quantity")), 2).as("qty"))
      .filter(col("n") >= 40)
      .orderBy(col("l_partkey"))),

    // §2.5 DISTINCT
    "q_distinct" -> ((s, d) => t(s, d, "customer")
      .select(col("c_mktsegment"), col("c_nationkey")).distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))),

    // §2.6 Sort + Skip + Limit
    "q_sort_skip_limit" -> ((s, d) => t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_totalprice"))
      .offset(10).limit(20)),

    // §2.6 top-K (TakeOrderedAndProject)
    "q_top_k" -> ((s, d) => t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)),

    // §2.6 UNION ALL (full semantics — exceeds the reference, SURVEY §2.6)
    "q_union_all" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_custkey") < 100)
        .select(col("c_nationkey").as("k"), lit("cust").as("side"))
      val b = t(s, d, "supplier").select(col("s_nationkey").as("k"), lit("supp").as("side"))
      a.unionAll(b).orderBy(col("k"), col("side"))
    }),

    // §2.6 UNION (distinct)
    "q_union" -> ((s, d) => {
      val a = t(s, d, "customer").select(col("c_nationkey").as("k"))
      val b = t(s, d, "supplier").select(col("s_nationkey").as("k"))
      a.union(b).distinct().orderBy(col("k"))
    }),

    // §2.7 UnwindOperator (explode)
    "q_unwind" -> ((s, d) => t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 50)
      .orderBy(col("word"))),

    // §2.7 EXISTS subquery → left_semi
    "q_exists_subquery" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // §2.4 anti-join (NOT EXISTS / none())
    "q_anti_join" -> ((s, d) => {
      val p = t(s, d, "orders").filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      t(s, d, "customer")
        .join(p, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // §2.4 LeftOuterJoinOperator (OPTIONAL MATCH) + aggregation over nulls
    "q_optional_match" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "O")
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          CypherFunctions.roundC(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total"))
        .orderBy(col("c_custkey"))
    }),

    // beyond-parity: window ranking (Spark Window, LDBC BI idiom)
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders").withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // beyond-parity: running aggregate window
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem").filter(col("l_suppkey") < 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          CypherFunctions.roundC(sum(col("l_extendedprice")).over(w), 2).as("running"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // beyond-parity: ROLLUP grouping sets
    "q_rollup" -> ((s, d) => t(s, d, "customer")
      .rollup(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), CypherFunctions.roundC(sum(col("c_acctbal")), 2).as("bal"))
      .orderBy(col("c_nationkey").asc_nulls_first, col("c_mktsegment").asc_nulls_first)),

    // §2.3 CartesianProductOperator
    "q_cartesian" -> ((s, d) => {
      val r1 = t(s, d, "region").select(col("r_name").as("a"))
      val r2 = t(s, d, "region").select(col("r_name").as("b"))
      r1.crossJoin(r2).orderBy(col("a"), col("b"))
    }),

    // §2.7 WithBarrierOperator: multi-stage WITH pipeline
    "q_with_pipeline" -> ((s, d) => {
      val rev = t(s, d, "orders")
        .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .agg(sum(col("o_totalprice")).as("rev_raw"))
        .filter(col("rev_raw") > 2000000)
      rev.join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_big_customers"), CypherFunctions.roundC(sum(col("rev_raw")), 2).as("nation_rev"))
        .orderBy(col("n_name"))
    }))

  val oracles: Map[String, String] = Map(
    "q_scan_filter" ->
      "SELECT p_partkey, p_name, p_size FROM part WHERE p_size >= 25 AND p_type = 'ECONOMY' ORDER BY p_partkey",
    "q_node_by_id" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 42",
    "q_label_count" ->
      "SELECT count(*) AS n_customers FROM customer",
    "q_project_expr" ->
      "SELECT l_orderkey, l_linenumber, round(l_extendedprice * (1 - l_discount), 2) AS net_price, l_quantity > 25 AS bulk FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_filter_3vl" ->
      "SELECT o_orderstatus, count(*) AS n FROM orders WHERE nullif(o_orderstatus, 'F') IS NULL OR nullif(o_orderstatus, 'F') = 'O' GROUP BY 1 ORDER BY 1",
    "q_case_when" ->
      "SELECT o_orderpriority, CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price FROM orders GROUP BY 1, 2 ORDER BY 1, 2",
    "q_string_fns" ->
      "SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo, substr(c_name, 10) AS tail9, substr(c_name, 1, 8) AS l8, substr(c_name, length(c_name) - 3, 4) AS r4, replace(c_name, 'Customer', 'Cust') AS repl, reverse(c_mktsegment) AS rev, c_mktsegment || '_' || c_name AS cat, starts_with(c_name, 'Customer') AS sw, ends_with(c_name, '1') AS ew, contains(c_name, '00') AS has00 FROM customer WHERE c_custkey < 300 ORDER BY c_custkey",
    "q_math_fns" ->
      "SELECT o_orderkey, round(abs(o_totalprice - 150000), 2) AS dev, CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k, CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k, round(sqrt(o_totalprice), 4) AS sq, CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sgn, round(ln(o_totalprice), 4) AS ln_p, round(log10(o_totalprice), 4) AS lg, round(exp(o_totalprice / 1000000.0), 4) AS ex, o_orderkey % 7 AS m7 FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey",
    "q_temporal_fns" ->
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo, CAST(day(o_orderdate) AS INTEGER) AS dy, date_trunc('month', o_orderdate) AS mstart, CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS INTEGER) AS dd FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey",
    "q_list_fns" ->
      "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words, string_split(text, ' ')[1] AS first_w, string_split(text, ' ')[-1] AS last_w, list_contains(string_split(text, ' '), 'spark') AS has_spark, array_to_string(string_split(text, ' ')[1:3], '_') AS first3 FROM documents ORDER BY doc_id",
    "q_regex_fns" ->
      "SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits, regexp_matches(c_name, '0{3}') AS has3z, regexp_replace(lower(c_mktsegment), '[aeiou]', '_', 'g') AS vowels FROM customer WHERE c_custkey < 300 ORDER BY c_custkey",
    "q_coalesce" ->
      "SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'P'), 'pending') AS st, CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL THEN 'known' ELSE 'unknown' END AS known FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey",
    "q1_agg" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_base, round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc, round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price, count(*) AS n FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2",
    "q_count_distinct" ->
      "SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_seg, count(*) AS n FROM customer GROUP BY 1 ORDER BY 1",
    "q_collect_list" ->
      "SELECT c_nationkey, array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segs FROM customer GROUP BY 1 ORDER BY 1",
    "q_percentile" ->
      "SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS p50, round(quantile_cont(l_quantity, 0.9), 4) AS p90 FROM lineitem GROUP BY 1 ORDER BY 1",
    "q_percentile_disc" ->
      "SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS p50, quantile_disc(l_quantity, 0.9) AS p90, quantile_disc(l_extendedprice, 0.25) AS p25_price FROM lineitem GROUP BY 1 ORDER BY 1",
    "q_stddev" ->
      "SELECT l_returnflag, round(stddev_samp(l_extendedprice), 2) AS sd, round(var_samp(l_quantity), 4) AS vr, round(stddev_pop(l_discount), 6) AS sdp FROM lineitem GROUP BY 1 ORDER BY 1",
    "q_having" ->
      "SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS qty FROM lineitem GROUP BY 1 HAVING count(*) >= 40 ORDER BY 1",
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer ORDER BY 1, 2",
    "q_sort_skip_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10",
    "q_top_k" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_union_all" ->
      "SELECT k, side FROM (SELECT c_nationkey AS k, 'cust' AS side FROM customer WHERE c_custkey < 100 UNION ALL SELECT s_nationkey AS k, 'supp' AS side FROM supplier) ORDER BY k, side",
    "q_union" ->
      "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier ORDER BY k",
    "q_unwind" ->
      "SELECT w AS word, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1 HAVING count(*) > 50 ORDER BY 1",
    "q_exists_subquery" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000) ORDER BY 1",
    "q_anti_join" ->
      "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') ORDER BY 1",
    "q_optional_match" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders, round(coalesce(sum(o_totalprice), 0), 2) AS total FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O' GROUP BY 1 ORDER BY 1",
    "q_window_rank" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn",
    "q_window_running" ->
      "SELECT l_suppkey, l_orderkey, l_linenumber, round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS UNBOUNDED PRECEDING), 2) AS running FROM lineitem WHERE l_suppkey < 10 ORDER BY 1, 2, 3",
    "q_rollup" ->
      "SELECT c_nationkey, c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal FROM customer GROUP BY ROLLUP(c_nationkey, c_mktsegment) ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST",
    "q_cartesian" ->
      "SELECT r1.r_name AS a, r2.r_name AS b FROM region r1 CROSS JOIN region r2 ORDER BY 1, 2",
    "q_with_pipeline" ->
      "SELECT n_name, count(*) AS n_big_customers, round(sum(rev_raw), 2) AS nation_rev FROM (SELECT c_custkey, c_nationkey, sum(o_totalprice) AS rev_raw FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1, 2 HAVING sum(o_totalprice) > 2000000) t JOIN nation ON n_nationkey = c_nationkey GROUP BY 1 ORDER BY 1")
}
