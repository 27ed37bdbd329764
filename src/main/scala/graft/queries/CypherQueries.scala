package graft.queries

import graft.cypher.QueryEngine
import graft.model.GraphLoader
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end Cypher surface (SURVEY.md §3 lifecycle): each query is a Cypher
  * STRING parsed by graft.cypher.CypherParser, translated to a DataFrame
  * pipeline over the TPC-H graph projection, and checked against a DuckDB
  * oracle — validating parser + translator + execution together.
  */
object CypherQueries {

  private def run(cy: String)(s: SparkSession, d: String): DataFrame =
    QueryEngine.execute(cy, GraphLoader.tpch(s, d))

  private def runP(cy: String, params: Map[String, Any])(s: SparkSession, d: String): DataFrame =
    QueryEngine.execute(cy, GraphLoader.tpch(s, d), params)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §7.2 flagship slice: scan+filter+expand+agg+sort+limit
    "q_cypher_match_agg" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.balance > 200000
        |RETURN c.name AS name, count(o) AS n
        |ORDER BY n DESC, name LIMIT 10""".stripMargin) _),

    // two-hop pattern with edge-property aggregation
    "q_cypher_2hop" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(:Order)-[r:CONTAINS]->()
        |RETURN id(c) AS cid, count(r) AS n_items, round(sum(r.weight), 2) AS total_qty
        |ORDER BY cid""".stripMargin) _),

    // OPTIONAL MATCH with property map + null-skipping count
    "q_cypher_optional" -> (run(
      """MATCH (c:Customer)
        |OPTIONAL MATCH (c)-[:PLACED]->(o:Order {name: 'O'})
        |RETURN id(c) AS cid, count(o) AS n
        |ORDER BY cid""".stripMargin) _),

    // variable-length expansion *1..2 over all edge types
    "q_cypher_varlength" -> (run(
      """MATCH (c:Customer)-[*1..2]->(x)
        |WHERE id(c) < 20
        |RETURN id(c) AS start, id(x) AS node
        |ORDER BY start, node""".stripMargin) _),

    // variable-length expansion with a relationship property predicate —
    // EVERY traversed edge must satisfy it (round-2 bug: props were
    // silently ignored on the var-length path)
    "q_cypher_varlength_props" -> (run(
      """MATCH (o:Order)-[*1..2 {weight: 5.0}]->(x)
        |WHERE id(o) < 10000050
        |RETURN id(o) AS start, id(x) AS node
        |ORDER BY start, node""".stripMargin) _),

    // named path with an ANONYMOUS interior node: nodes(p) must carry the
    // interior node's real id (round-2 bug: head id was repeated in place
    // of anonymous interior nodes)
    "q_cypher_path_anon" -> (run(
      """MATCH p = (c:Customer)-[:PLACED]->()-[:CONTAINS]->(l)
        |WHERE id(c) < 3
        |RETURN id(c) AS cid, nodes(p)[1] AS mid, id(l) AS lid, length(p) AS len
        |ORDER BY cid, mid, lid""".stripMargin) _),

    // relationships(p): named paths carry edge ids too (record.rs:85-89)
    "q_cypher_path_rels" -> (run(
      """MATCH p = (c:Customer)-[:PLACED]->(o:Order)
        |WHERE id(c) < 3
        |RETURN id(c) AS cid, relationships(p)[0] AS eid
        |ORDER BY cid, eid""".stripMargin) _),

    // string predicates in WHERE
    "q_cypher_where_str" -> (run(
      """MATCH (p:Part)
        |WHERE p.name STARTS WITH 'a' OR p.name CONTAINS 'ol'
        |RETURN id(p) AS pid, p.name AS name
        |ORDER BY pid""".stripMargin) _),

    // DISTINCT projection over an expand
    "q_cypher_distinct" -> (run(
      """MATCH (:Customer)-[:IN_NATION]->(n:Nation)
        |RETURN DISTINCT id(n) AS nid
        |ORDER BY nid""".stripMargin) _),

    // CASE expression as implicit grouping key
    "q_cypher_case" -> (run(
      """MATCH (o:Order)
        |RETURN CASE WHEN o.balance > 200000 THEN 'high'
        |            WHEN o.balance > 100000 THEN 'mid'
        |            ELSE 'low' END AS bucket, count(o) AS n
        |ORDER BY bucket""".stripMargin) _),

    // cyclic pattern — the closing two hops lower through the WCO
    // adjacency-intersect fusion (Translator.expandCycleClose, the
    // Spark-first analog of reference `executor/leapfrog.rs`): supplier
    // and customer must share the nation that closes the cycle
    "q_cypher_wco_cycle" -> (run(
      "MATCH (o:Order)-[:CONTAINS]->(l1:Lineitem)-[:HAS_PART]->(p:Part)" +
        "<-[:HAS_PART]-(l2:Lineitem)<-[:CONTAINS]-(o) " +
        "WHERE id(o) < 10002000 " +
        "RETURN count(*) AS n_pairs") _),

    // CY-24 elementId() string form + isNaN + toStringOrNull
    "q_cypher_fn_parity" -> (run(
      """MATCH (n:Nation)
        |RETURN elementId(n) AS eid, isNaN(sqrt(-1)) AS nan_t,
        |       toStringOrNull(id(n)) AS sid
        |ORDER BY eid""".stripMargin) _),

    // two comma patterns sharing a variable (join on c)
    "q_cypher_multipattern" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order), (c)-[:IN_NATION]->(n:Nation)
        |WHERE id(c) < 50
        |RETURN id(n) AS nid, count(o) AS n_orders
        |ORDER BY nid""".stripMargin) _),

    // UNWIND a generated list
    "q_cypher_unwind" -> (run(
      """MATCH (n:Nation)
        |UNWIND range(1, 3) AS i
        |RETURN id(n) AS nid, i
        |ORDER BY nid, i""".stripMargin) _),

    // ORDER BY + SKIP + LIMIT pagination
    "q_cypher_skip_limit" -> (run(
      """MATCH (o:Order)
        |RETURN id(o) AS oid, o.balance AS price
        |ORDER BY price DESC, oid
        |SKIP 5 LIMIT 10""".stripMargin) _),

    // §2.7 WITH barrier: aggregate → HAVING-style filter (WithBarrierOperator)
    "q_cypher_with_agg" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, count(o) AS n, round(sum(o.balance), 2) AS rev
        |WHERE n >= 10
        |RETURN id(c) AS cid, n, rev
        |ORDER BY cid""".stripMargin) _),

    // §2.7 WITH: aggregate → filter → expand (the reference's canonical
    // multi-stage pipeline shape)
    "q_cypher_with_expand" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, sum(o.balance) AS rev
        |WHERE rev > 2000000
        |MATCH (c)-[:IN_NATION]->(n:Nation)
        |RETURN n.name AS nation, count(c) AS n_big, round(sum(rev), 2) AS total
        |ORDER BY nation""".stripMargin) _),

    // §2.7 chained WITH barriers re-aggregating each stage
    "q_cypher_with_chain" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, count(o) AS n
        |WITH CASE WHEN n >= 15 THEN 'many' WHEN n >= 5 THEN 'some' ELSE 'few' END AS bucket, n
        |WITH bucket, count(n) AS customers, round(avg(n), 4) AS avg_orders
        |RETURN bucket, customers, avg_orders
        |ORDER BY bucket""".stripMargin) _),

    // §2.7 WITH ... ORDER BY ... LIMIT mid-pipeline (top-k then continue)
    "q_cypher_with_topk" -> (run(
      """MATCH (o:Order)
        |WITH o ORDER BY o.balance DESC, id(o) LIMIT 10
        |RETURN id(o) AS oid, round(o.balance, 2) AS price
        |ORDER BY oid""".stripMargin) _),

    // §2.7 EXISTS subquery in WHERE (semi-join lowering)
    "q_cypher_exists" -> (run(
      """MATCH (c:Customer)
        |WHERE EXISTS { (c)-[:PLACED]->(o:Order {name: 'P'}) }
        |RETURN id(c) AS cid
        |ORDER BY cid""".stripMargin) _),

    // §2.7 NOT EXISTS (anti-join lowering)
    "q_cypher_not_exists" -> (run(
      """MATCH (c:Customer)
        |WHERE NOT EXISTS { (c)-[:PLACED]->(o:Order {name: 'P'}) }
        |RETURN id(c) AS cid
        |ORDER BY cid""".stripMargin) _),

    // §2.6 UNION (distinct) between full queries
    "q_cypher_union" -> (run(
      """MATCH (:Customer)-[:IN_NATION]->(n) RETURN id(n) AS nid
        |UNION
        |MATCH (:Supplier)-[:IN_NATION]->(n) RETURN id(n) AS nid""".stripMargin) _),

    // query parameters $p (reference cypher.pest:136-137)
    "q_cypher_param" -> (runP(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.balance > $minTotal AND id(c) < $maxId
        |RETURN id(c) AS cid, count(o) AS n
        |ORDER BY cid""".stripMargin,
      Map("minTotal" -> 150000.0, "maxId" -> 200L)) _),

    // shortestPath() + named path: length(p) (ShortestPathOperator)
    "q_cypher_shortestpath" -> (run(
      """MATCH p = shortestPath((c:Customer)-[*1..3]->(n:Nation))
        |WHERE id(c) < 20
        |RETURN id(c) AS cid, id(n) AS nid, length(p) AS len
        |ORDER BY cid, nid""".stripMargin) _),

    // pattern comprehension (reference ast.rs:392): per-customer list of
    // order totals collected inline — lowered to a grouped left join, empty
    // list for customers without orders. The array result is scalarized
    // (sorted + fixed-precision + joined) so the cross-engine compare never
    // has to hash an array column — the q_collect_list precedent.
    "q_cypher_pattern_comp" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      run(
        """MATCH (c:Customer)
          |WHERE id(c) < 10
          |RETURN id(c) AS cid, [(c)-[:PLACED]->(o) | o.balance] AS order_totals
          |ORDER BY cid""".stripMargin)(s, d)
        .withColumn("order_totals",
          array_join(transform(sort_array(col("order_totals")),
            x => format_string("%.4f", x)), ","))
    }),

    // allShortestPaths(): ALL distinct min-depth node sequences, one row per
    // path (reference operator.rs:7534 all_paths) — customers reach a part
    // only at depth 3 (PLACED/CONTAINS/HAS_PART chain), so n_paths counts
    // the distinct (order, lineitem-node) chains per (customer, part)
    "q_cypher_allshortest" -> (run(
      """MATCH p = allShortestPaths((c:Customer)-[*1..3]->(x:Part))
        |WHERE id(c) < 5
        |RETURN id(c) AS cid, id(x) AS pid, count(*) AS n_paths
        |ORDER BY cid, pid""".stripMargin) _),

    // list index / reduce / quantified predicate in projections
    "q_cypher_listops" -> (run(
      """MATCH (c:Customer)
        |WHERE id(c) < 100
        |RETURN id(c) AS cid, split(c.name, '#')[1] AS num,
        |       reduce(acc = 0, x IN range(1, 3) | acc + x) AS s,
        |       all(x IN range(1, 2) WHERE x > 0) AS b
        |ORDER BY cid""".stripMargin) _),

    // r12: split with a NON-LITERAL separator — computed per row, so the
    // regex-quoting happens in-plan. The '.' branch is the differential:
    // an unquoted '.' is a regex that splits on EVERY character. The array
    // is joined to a scalar string (q_collect_list convention) so the
    // cross-engine compare never has to hash an array column; the split
    // itself still runs inside the Cypher plan.
    "q_cypher_split_dynamic" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.{array_join, col}
      run(
        """MATCH (c:Customer)
          |WHERE id(c) < 200
          |WITH id(c) AS k, c.name AS nm,
          |     CASE WHEN id(c) % 2 = 0 THEN '.' ELSE toString(id(c) % 10) END AS sep
          |RETURN k, split(nm, sep) AS parts
          |ORDER BY k""".stripMargin)(s, d)
        .select(col("k"), array_join(col("parts"), "|").as("parts"))
    }),

    // the SAME Cypher text as q_cypher_2hop, executed over the bucketed
    // store (sources/BucketedGraph) through the full engine — identical
    // result, but both expand joins consume the edge table in its stored
    // HashPartitioning(src): the per-query edge shuffle is gone
    "q_cypher_2hop_bucketed" -> ((s: SparkSession, d: String) => {
      val name = "graft_bkt_" + java.lang.Long.toHexString(d.hashCode.toLong & 0xffffffffL)
      if (!s.catalog.tableExists(s"${name}_nodes"))
        graft.sources.BucketedGraph.save(GraphLoader.tpch(s, d), name, 8)
      QueryEngine.execute(
        """MATCH (c:Customer)-[:PLACED]->(:Order)-[r:CONTAINS]->()
          |RETURN id(c) AS cid, count(r) AS n_items, round(sum(r.weight), 2) AS total_qty
          |ORDER BY cid""".stripMargin,
        graft.sources.BucketedGraph.load(s, name))
    }),

    // valueType + time()/duration.between temporal surface (operator.rs:1265-1513)
    "q_cypher_valuetype" -> (run(
      """UNWIND [1] AS x
        |RETURN valueType(1) AS t_int, valueType(1.5) AS t_flt,
        |       valueType('a') AS t_str, valueType(true) AS t_bool,
        |       valueType([1, 2]) AS t_list,
        |       time('2024-03-05 12:34:56') AS t_time,
        |       toString(duration.between(datetime('2024-01-01 00:00:00'),
        |                                 datetime('2024-01-02 03:30:00'))) AS dur""".stripMargin) _),

    // CALL procedure surface (reference ast.rs:166-169): algo.* from Cypher,
    // with YIELD + trailing edge-type restriction
    "q_cypher_call_bfs" -> (run(
      """CALL algo.bfs(1, 4, 'PLACED,CONTAINS,HAS_PART,SUPPLIED_BY')
        |YIELD id, dist
        |RETURN id, dist ORDER BY id""".stripMargin) _),

    // config-map CALL of the round-12 multi-source harmonic centrality —
    // must agree with the Scala API (same oracle as q_harmonic_centrality)
    "q_cypher_call_harmonic" -> (run(
      """CALL algo.harmonicCentrality([1, 2, 3], 3, 'PLACED,CONTAINS,HAS_PART,SUPPLIED_BY')
        |YIELD seed, n_reached, harmonic
        |RETURN seed, n_reached, harmonic ORDER BY seed""".stripMargin) _),

    // CALL twins of q_graph_stats / q_modularity over the PLACED bipartite
    // projection — the procedure surface must agree with the Scala APIs
    "q_cypher_call_stats" -> (run(
      """CALL algo.graphStats('PLACED') YIELD stat, value
        |RETURN stat, value ORDER BY stat""".stripMargin) _),
    "q_cypher_call_modularity" -> (run(
      """CALL algo.modularity(8, 'PLACED') YIELD modularity
        |RETURN modularity""".stripMargin) _),

    // CALL twin of q_louvain_moves over the PLACED projection
    "q_cypher_call_louvain" -> (run(
      """CALL algo.louvain(2, 'PLACED') YIELD id, community
        |RETURN id, community ORDER BY id""".stripMargin) _),

    // CALL twin of q_louvain_levels: second numeric arg = levels
    "q_cypher_call_louvain_levels" -> (run(
      """CALL algo.louvain(2, 2, 'PLACED') YIELD id, community
        |RETURN id, community ORDER BY id""".stripMargin) _),

    // CALL twin of q_node2vec_walks over the PLACED projection — must
    // agree with the Scala API's biased second-order picks exactly
    "q_cypher_call_node2vec" -> (run(
      """CALL algo.node2vec(3, 'PLACED') YIELD start, v1, v2, v3
        |RETURN start, v1, v2, v3 ORDER BY start""".stripMargin) _),

    // CALL twin of q_bidir_bfs: one (src, dst) pair over the full 4-type
    // graph; customers connect only through order→lineitem→part/supplier
    // chains, so d(c1, c2) = 6 exactly when they share a part or supplier
    "q_cypher_call_bidirbfs" -> (run(
      """CALL algo.bidirBfs(1, 2, 6, 'PLACED,CONTAINS,HAS_PART,SUPPLIED_BY')
        |YIELD src, dst, dist
        |RETURN src, dst, dist ORDER BY src""".stripMargin) _),

    // CALL twin of q_closeness_centrality — must agree with the Scala API
    "q_cypher_call_closeness" -> (run(
      """CALL algo.closenessCentrality([1, 2, 3], 3, 'PLACED,CONTAINS,HAS_PART,SUPPLIED_BY')
        |YIELD seed, n_reached, closeness, eccentricity
        |RETURN seed, n_reached, closeness, eccentricity ORDER BY seed""".stripMargin) _),

    // CALL twin of q_betweenness — must agree with the Scala API
    "q_cypher_call_betweenness" -> (run(
      """CALL algo.betweenness([1, 2, 3], 3, 'PLACED,CONTAINS,HAS_PART,SUPPLIED_BY')
        |YIELD id, bc
        |RETURN id, bc ORDER BY id""".stripMargin) _),

    // relationship MERGE: insert-if-absent by (src, dst, type) — applied
    // TWICE to prove idempotency; the read counts exactly one edge per pair
    "q_cypher_write_merge_rel" -> ((s: SparkSession, d: String) => {
      val m = """MATCH (c:Customer), (n:Nation)
                |WHERE id(c) < 3 AND id(n) = 1200000001
                |MERGE (c)-[:SPONSORS]->(n)""".stripMargin
      val (g2, _) = QueryEngine.executeWrite(m, GraphLoader.tpch(s, d))
      val (g3, _) = QueryEngine.executeWrite(m, g2)
      QueryEngine.execute("MATCH ()-[r:SPONSORS]->() RETURN count(r) AS n", g3)
    }),

    // §2.10 algo.or.solve (operator.rs:6617; samyama-optimization crate):
    // minimize sum(balance_i * x_i) s.t. sum(x_i) >= 20, x in [0,1], via
    // parallel multi-start Jaya; contract: feasible + cheaper than uniform
    "q_cypher_or_solve" -> (run(
      """CALL algo.or.solve('Supplier', 'balance', 'Jaya', 20)
        |YIELD algorithm, feasible, beats_uniform
        |RETURN algorithm, feasible, beats_uniform""".stripMargin) _),

    // NSGA-II through the same CALL surface (reference nsga2.rs — the one
    // qualitatively multi-objective solver): Pareto front over
    // (cost, −allocation); contract = non-trivial front whose hypervolume
    // strictly contains the uniform allocation's
    "q_cypher_or_solve_nsga2" -> (run(
      """CALL algo.or.solve({label: 'Supplier', costProperty: 'balance',
        |                    algorithm: 'NSGA2', minTotal: 20})
        |YIELD algorithm, has_front, beats_uniform
        |RETURN algorithm, has_front, beats_uniform""".stripMargin) _),

    // the other two MOO families (reference motlbo.rs / mo_rao_de.rs)
    // through the same Pareto harness and contract
    "q_cypher_or_solve_motlbo" -> (run(
      """CALL algo.or.solve({label: 'Supplier', costProperty: 'balance',
        |                    algorithm: 'MOTLBO', minTotal: 20})
        |YIELD algorithm, has_front, beats_uniform
        |RETURN algorithm, has_front, beats_uniform""".stripMargin) _),
    "q_cypher_or_solve_moraode" -> (run(
      """CALL algo.or.solve({label: 'Supplier', costProperty: 'balance',
        |                    algorithm: 'MORaoDE', minTotal: 20})
        |YIELD algorithm, has_front, beats_uniform
        |RETURN algorithm, has_front, beats_uniform""".stripMargin) _),

    // two of the newer single-objective families (reference rao.rs variants /
    // samp_jaya.rs) through the same contract
    "q_cypher_or_solve_rao2" -> (run(
      """CALL algo.or.solve('Supplier', 'balance', 'Rao2', 20)
        |YIELD algorithm, feasible, beats_uniform
        |RETURN algorithm, feasible, beats_uniform""".stripMargin) _),
    "q_cypher_or_solve_sampjaya" -> (run(
      """CALL algo.or.solve('Supplier', 'balance', 'SampJaya', 20)
        |YIELD algorithm, feasible, beats_uniform
        |RETURN algorithm, feasible, beats_uniform""".stripMargin) _),

    // the last three reference families (saphr.rs — self-adaptive selection
    // over the Rao-1/2/3 moves; ehrjaya.rs — rank-split Jaya/Rao-1 hybrid;
    // mo_bmwr_family.rs — Pareto BMWR with elite seeding/local
    // exploration/edge boosting), completing 29/29 solver coverage
    "q_cypher_or_solve_saphr" -> (run(
      """CALL algo.or.solve('Supplier', 'balance', 'SAPHR', 20)
        |YIELD algorithm, feasible, beats_uniform
        |RETURN algorithm, feasible, beats_uniform""".stripMargin) _),
    "q_cypher_or_solve_ehrjaya" -> (run(
      """CALL algo.or.solve('Supplier', 'balance', 'EHRJaya', 20)
        |YIELD algorithm, feasible, beats_uniform
        |RETURN algorithm, feasible, beats_uniform""".stripMargin) _),
    "q_cypher_or_solve_mobmwr" -> (run(
      """CALL algo.or.solve({label: 'Supplier', costProperty: 'balance',
        |                    algorithm: 'MO-BMWR', minTotal: 20})
        |YIELD algorithm, has_front, beats_uniform
        |RETURN algorithm, has_front, beats_uniform""".stripMargin) _),

    // introspection surface (reference ShowLabels/RelationshipTypes/
    // PropertyKeys operators, operator.rs:5654-5785)
    "q_cypher_show_labels" -> (run("SHOW LABELS") _),

    // CALL db.schema.visualization() (reference operator.rs:5784-5833):
    // distinct (source_label, relationship_type, target_label) triples —
    // the TPC-H projection's 7-edge schema is fixed, so the oracle is exact
    "q_cypher_schema_viz" -> (run(
      """CALL db.schema.visualization()
        |YIELD source_label, relationship_type, target_label
        |RETURN source_label, relationship_type, target_label
        |ORDER BY source_label, relationship_type, target_label""".stripMargin) _),

    // PROFILE executes (reference ADR-014, executor/mod.rs:198-215 — runs
    // the query and appends rows + wall time to the plan): the entry pins
    // the engine-independent parts — profile section present, profiled row
    // count correct, a timing figure reported
    "q_cypher_profile" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      QueryEngine.execute(
        "PROFILE MATCH (n:Nation) RETURN count(n) AS n", GraphLoader.tpch(s, d))
        .select(
          col("plan").contains("--- Profile ---").as("has_profile"),
          regexp_extract(col("plan"), "Rows: (\\d+)", 1).cast("long").as("profiled_rows"),
          col("plan").rlike("Execution time: \\d+\\.\\d+ ms").as("has_time"))
    }),
    "q_cypher_show_reltypes" -> (run("SHOW RELATIONSHIP TYPES") _),
    "q_cypher_show_propkeys" -> (run("SHOW PROPERTY KEYS") _),

    // unique-constraint ENFORCEMENT (reference src/index/manager.rs:99-126
    // check_unique_constraint): CREATE CONSTRAINT registers the (label,
    // property) pair; a constrained MERGE of an existing value dedups
    // (no-op); a constrained CREATE of a duplicate fails loudly
    "q_cypher_unique_constraint" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      val g0 = GraphLoader.tpch(s, d)
      val (g1, _) = QueryEngine.executeWrite(
        "CREATE CONSTRAINT ON (n:Nation) ASSERT n.name IS UNIQUE", g0)
      // MERGE on an existing name: matched, nothing created
      val (g2, _) = QueryEngine.executeWrite("MERGE (n:Nation {name: 'NATION_0'})", g1)
      val dupThrew =
        try { QueryEngine.executeWrite("CREATE (n:Nation {id: 1200000777, name: 'NATION_0'})", g2); false }
        catch { case _: IllegalStateException => true }
      QueryEngine.execute("MATCH (x:Nation) RETURN count(x) AS n_nations", g2)
        .select(col("n_nations"), lit(dupThrew).as("dup_create_throws"))
    }),

    // or.solve WRITE-BACK (reference operator.rs:6617-6767 dispatches a
    // MUTATING algorithm op — the solution lands on the nodes, so a following
    // MATCH reads it): CALL writes sp.alloc, the read-back checks the
    // engine-independent contract — coverage (every Supplier got a value),
    // feasibility (Σ alloc ≥ minTotal), bounds (0 ≤ alloc ≤ 1)
    "q_cypher_or_solve_write" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      val (g2, _) = QueryEngine.executeWrite(
        """CALL algo.or.solve({label: 'Supplier', costProperty: 'balance',
          |                    minTotal: 20, writeProperty: 'alloc'})""".stripMargin,
        GraphLoader.tpch(s, d))
      QueryEngine.execute(
        """MATCH (sp:Supplier) WHERE sp.alloc IS NOT NULL
          |RETURN count(sp) AS n_written, sum(sp.alloc) AS total,
          |       min(sp.alloc) AS lo, max(sp.alloc) AS hi""".stripMargin, g2)
        .select(col("n_written"),
          (col("total") >= lit(20.0 - 1e-6)).as("feasible"),
          (col("lo") >= 0.0 && col("hi") <= 1.0).as("in_bounds"))
    }),

    // config-map CALL convention (reference operator.rs:6622): same WCC as
    // q_wcc but dispatched via CALL with an options map
    "q_cypher_call_wcc" -> (run(
      """CALL algo.wcc({edgeType: 'IN_NATION,IN_REGION'})
        |YIELD id, component
        |RETURN id, component ORDER BY id""".stripMargin) _),

    // k-core through the CALL surface (positional k/rounds + edge-type
    // string, like algo.bfs): one synchronous peel round at k=2 over the
    // customer->nation->region subgraph — degree-1 customers drop, the
    // output is the nation/region residual degrees
    "q_cypher_call_kcore" -> (run(
      """CALL algo.kCore(2, 1, 'IN_NATION,IN_REGION')
        |YIELD id, deg
        |RETURN id, deg ORDER BY id""".stripMargin) _),

    // a second or.solve kernel family through the same CALL surface (the
    // reference dispatches ~30 metaheuristics by name; 13 families here)
    "q_cypher_or_solve_de" -> (run(
      """CALL algo.or.solve('Supplier', 'balance', 'DE', 20)
        |YIELD algorithm, feasible, beats_uniform
        |RETURN algorithm, feasible, beats_uniform""".stripMargin) _),

    // FOREACH write clause (cypher.pest:44): body folded over the list with
    // the loop variable bound by substitution
    "q_cypher_foreach" -> ((s: SparkSession, d: String) => {
      val (g2, _) = QueryEngine.executeWrite(
        "FOREACH (i IN [1, 2, 3] | CREATE (m:Marker {id: 9000000000 + i, name: 'marker'}))",
        GraphLoader.tpch(s, d))
      QueryEngine.execute(
        "MATCH (m:Marker) RETURN id(m) AS mid, m.name AS name ORDER BY mid", g2)
    }),

    // FOREACH over a DYNAMIC per-row list (executor.rs sequential element
    // apply): lowered as an UNWIND-extended read context for SET/REMOVE
    // bodies — empty lists (nationkey % 3 == 0 → range(1, 0) = []) skip the
    // write, Cypher's zero-iteration semantics
    "q_cypher_foreach_dyn" -> ((s: SparkSession, d: String) => {
      val (g2, _) = QueryEngine.executeWrite(
        "MATCH (n:Nation) FOREACH (x IN range(1, id(n) % 3) | SET n.touched = x)",
        GraphLoader.tpch(s, d))
      QueryEngine.execute(
        "MATCH (n:Nation) RETURN coalesce(n.touched, -1) AS touched, count(*) AS n ORDER BY touched",
        g2)
    }),

    // §2.7 CALL { } subquery (uncorrelated) joined to the outer frame
    "q_cypher_call_subquery" -> (run(
      """MATCH (n:Nation)
        |CALL { MATCH (c:Customer) RETURN count(c) AS total }
        |RETURN id(n) AS nid, total
        |ORDER BY nid""".stripMargin) _),

    // §2.7 CALL { WITH ... } correlated subquery: imported variables key the
    // inner aggregate per outer row (decorrelated to a grouped equi-join)
    "q_cypher_call_subquery_corr" -> (run(
      """MATCH (n:Nation)
        |CALL { WITH n MATCH (c:Customer)-[:IN_NATION]->(n) RETURN count(c) AS n_cust }
        |RETURN id(n) AS nid, n_cust
        |ORDER BY nid""".stripMargin) _),

    // correlated CALL {} with per-binding top-k (ORDER BY + LIMIT inside the
    // subquery = top 2 orders per customer, decorrelated to a window rank)
    "q_cypher_call_subquery_topk" -> (run(
      """MATCH (c:Customer)
        |WHERE id(c) < 10
        |CALL { WITH c MATCH (c)-[:PLACED]->(o:Order) RETURN o.balance AS bal ORDER BY bal DESC LIMIT 2 }
        |RETURN id(c) AS cid, bal
        |ORDER BY cid, bal""".stripMargin) _),

    // Cypher write statements (reference cypher.pest create/merge/set/delete)
    // executed as batch transforms; checked by reading the mutated graph
    "q_cypher_write_create" -> ((s: SparkSession, d: String) => {
      val (g2, _) = QueryEngine.executeWrite(
        "CREATE (n:Nation {id: 1200000099, name: 'atlantis'})", GraphLoader.tpch(s, d))
      QueryEngine.execute(
        "MATCH (n:Nation) RETURN id(n) AS nid, n.name AS name ORDER BY nid", g2)
    }),
    // CREATE ... RETURN (cypher.pest create_stmt return_clause?): the
    // created node projects directly from the write statement
    "q_cypher_create_return" -> (run(
      "CREATE (n:Nation {id: 1200000099, name: 'atlantis', balance: 7.5}) " +
        "RETURN id(n) AS nid, n.name AS name, n.balance AS bal") _),
    "q_cypher_write_set" -> ((s: SparkSession, d: String) => {
      val (g2, _) = QueryEngine.executeWrite(
        "MATCH (n:Nation) WHERE id(n) < 1200000003 SET n.name = 'REDACTED'",
        GraphLoader.tpch(s, d))
      QueryEngine.execute(
        "MATCH (n:Nation) RETURN id(n) AS nid, n.name AS name ORDER BY nid", g2)
    }),
    "q_cypher_write_delete" -> ((s: SparkSession, d: String) => {
      val (g2, _) = QueryEngine.executeWrite(
        "MATCH (n:Region) WHERE id(n) >= 1300000003 DETACH DELETE n",
        GraphLoader.tpch(s, d))
      QueryEngine.execute(
        "MATCH (:Nation)-[r:IN_REGION]->(:Region) RETURN count(r) AS n", g2)
    }),
    "q_cypher_write_merge" -> ((s: SparkSession, d: String) => {
      val (g2, _) = QueryEngine.executeWrite(
        "MERGE (n:Nation {name: 'NATION_5'}) ON MATCH SET n.balance = 1.0 ON CREATE SET n.balance = 2.0",
        GraphLoader.tpch(s, d))
      val (g3, _) = QueryEngine.executeWrite(
        "MERGE (n:Nation {name: 'atlantis2', id: 1200000098}) ON MATCH SET n.balance = 1.0 ON CREATE SET n.balance = 2.0",
        g2)
      QueryEngine.execute(
        """MATCH (n:Nation) WHERE n.name = 'NATION_5' OR n.name = 'atlantis2'
          |RETURN n.name AS name, n.balance AS balance ORDER BY name""".stripMargin, g3)
    }),

    // SET n:Label / REMOVE n:Label (cypher.pest:56-57): add a label to five
    // nations, strip it from two, count survivors through a label scan on
    // the mutated graph
    "q_cypher_write_label" -> ((s: SparkSession, d: String) => {
      val (g2, _) = QueryEngine.executeWrite(
        "MATCH (n:Nation) WHERE id(n) < 1200000005 SET n:Major", GraphLoader.tpch(s, d))
      val (g3, _) = QueryEngine.executeWrite(
        "MATCH (n:Major) WHERE id(n) < 1200000002 REMOVE n:Major", g2)
      QueryEngine.execute("MATCH (n:Major) RETURN count(n) AS n_major", g3)
    }),

    // SHOW CONSTRAINTS introspection (reference operator.rs:5612): lists
    // the unique constraints registered by CREATE CONSTRAINT
    "q_cypher_show_constraints" -> ((s: SparkSession, d: String) => {
      val g0 = GraphLoader.tpch(s, d)
      val (g1, _) = QueryEngine.executeWrite(
        "CREATE CONSTRAINT ON (n:Nation) ASSERT n.name IS UNIQUE", g0)
      val (g2, _) = QueryEngine.executeWrite(
        "CREATE CONSTRAINT ON (c:Customer) ASSERT c.name IS UNIQUE", g1)
      QueryEngine.execute("SHOW CONSTRAINTS", g2)
    }),

    // duration({map}) component constructor (reference operator.rs:1372-1390)
    // — day-time maps yield DayTimeIntervalType, year-month maps a calendar
    // interval; both compose with temporal arithmetic
    "q_cypher_duration_map" -> (run(
      """UNWIND [1] AS x
        |RETURN toString(datetime('2024-01-01 00:00:00')
        |         + duration({days: 1, hours: 2, minutes: 30})) AS plus_dt,
        |       toString(date('2024-01-31') + duration({months: 1})) AS plus_mo,
        |       toString(duration({days: 1, hours: 3, minutes: 30})) AS dur_s""".stripMargin) _),

    // CALL db.labels / db.relationshipTypes / db.propertyKeys — the
    // procedure twins of the SHOW statements (reference db.* procedures)
    "q_cypher_call_labels" -> (run(
      "CALL db.labels() YIELD label RETURN label ORDER BY label") _),
    "q_cypher_call_reltypes" -> (run(
      """CALL db.relationshipTypes() YIELD relationshipType
        |RETURN relationshipType ORDER BY relationshipType""".stripMargin) _),
    "q_cypher_call_propkeys" -> (run(
      "CALL db.propertyKeys() YIELD propertyKey RETURN propertyKey ORDER BY propertyKey") _),

    // temporal component property access (reference record.rs:328-357):
    // dt.year / dur.days resolve as component extraction, statically typed
    // through WITH; unknown components are NULL (schema-free semantics)
    "q_cypher_temporal_access" -> (run(
      """UNWIND [1] AS x
        |WITH datetime('2024-03-05 10:20:30') AS dt,
        |     duration({days: 2, hours: 3, minutes: 5}) AS d,
        |     duration({years: 1, months: 2}) AS ym
        |RETURN dt.year AS yr, dt.month AS mo, dt.day AS dy, dt.hour AS hh,
        |       dt.minute AS mi, dt.second AS ss, dt.epochMillis AS em,
        |       d.days AS dd, d.hours AS dh, d.minutes AS dm, d.seconds AS dsec,
        |       ym.months AS ymm""".stripMargin) _),

    // SHOW INDEXES introspection (reference cypher.pest:19) over the
    // registered vector index + the always-on per-label scan
    "q_cypher_show_indexes" -> ((s: SparkSession, d: String) => {
      val emb = graft.model.Tables(s, d, "embeddings")
      QueryEngine.executeWithIndexes("SHOW INDEXES", GraphLoader.tpch(s, d),
        Map.empty, Map("embeddings" -> ((emb, "vec_id", "embedding"))))
        .orderBy(org.apache.spark.sql.functions.col("name"))
    }),

    // CALL db.index.vector.queryNodes with a $param query vector
    "q_cypher_call_knn" -> ((s: SparkSession, d: String) => {
      val emb = graft.model.Tables(s, d, "embeddings")
      val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      QueryEngine.executeWithIndexes(
        """CALL db.index.vector.queryNodes('embeddings', 10, $q)
          |YIELD id, score
          |RETURN id, round(score, 4) AS score""".stripMargin,
        GraphLoader.tpch(s, d), Map("q" -> q),
        Map("embeddings" -> ((emb, "vec_id", "embedding"))))
    }))

  val oracles: Map[String, String] = Map(
    "q_cypher_call_subquery" ->
      "SELECT CAST(n_nationkey + 1200000000 AS BIGINT) AS nid, (SELECT count(*) FROM customer) AS total FROM nation ORDER BY 1",
    "q_cypher_foreach" ->
      "SELECT * FROM (VALUES (9000000001, 'marker'), (9000000002, 'marker'), (9000000003, 'marker')) t(mid, name) ORDER BY mid",
    "q_cypher_foreach_dyn" ->
      """SELECT CASE WHEN n_nationkey % 3 >= 1 THEN CAST(n_nationkey % 3 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS touched,
        |       count(*) AS n
        |FROM nation GROUP BY 1 ORDER BY touched""".stripMargin,
    "q_cypher_or_solve" ->
      "SELECT 'Jaya' AS algorithm, true AS feasible, true AS beats_uniform",
    "q_cypher_or_solve_de" ->
      "SELECT 'DE' AS algorithm, true AS feasible, true AS beats_uniform",
    "q_cypher_or_solve_write" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_written, true AS feasible, true AS in_bounds FROM supplier",
    "q_cypher_unique_constraint" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_nations, true AS dup_create_throws FROM nation",
    "q_cypher_show_labels" ->
      "SELECT * FROM (VALUES ('Customer'), ('Lineitem'), ('Nation'), ('Order'), ('Part'), ('Region'), ('Supplier')) t(label) ORDER BY 1",
    "q_cypher_show_reltypes" ->
      "SELECT * FROM (VALUES ('CONTAINS'), ('HAS_PART'), ('IN_NATION'), ('IN_REGION'), ('PLACED'), ('SUPPLIED_BY')) t(relationshipType) ORDER BY 1",
    "q_cypher_show_propkeys" ->
      "SELECT * FROM (VALUES ('balance'), ('name'), ('weight')) t(propertyKey) ORDER BY 1",
    "q_cypher_or_solve_nsga2" ->
      "SELECT 'NSGA2' AS algorithm, true AS has_front, true AS beats_uniform",
    "q_cypher_or_solve_motlbo" ->
      "SELECT 'MOTLBO' AS algorithm, true AS has_front, true AS beats_uniform",
    "q_cypher_or_solve_moraode" ->
      "SELECT 'MORaoDE' AS algorithm, true AS has_front, true AS beats_uniform",
    "q_cypher_or_solve_rao2" ->
      "SELECT 'Rao2' AS algorithm, true AS feasible, true AS beats_uniform",
    "q_cypher_or_solve_saphr" ->
      "SELECT 'SAPHR' AS algorithm, true AS feasible, true AS beats_uniform",
    "q_cypher_or_solve_ehrjaya" ->
      "SELECT 'EHRJaya' AS algorithm, true AS feasible, true AS beats_uniform",
    "q_cypher_or_solve_mobmwr" ->
      "SELECT 'MO-BMWR' AS algorithm, true AS has_front, true AS beats_uniform",
    "q_cypher_schema_viz" ->
      """SELECT * FROM (VALUES
        | ('Customer', 'IN_NATION', 'Nation'), ('Customer', 'PLACED', 'Order'),
        | ('Lineitem', 'HAS_PART', 'Part'), ('Lineitem', 'SUPPLIED_BY', 'Supplier'),
        | ('Nation', 'IN_REGION', 'Region'), ('Order', 'CONTAINS', 'Lineitem'),
        | ('Supplier', 'IN_NATION', 'Nation'))
        | t(source_label, relationship_type, target_label) ORDER BY 1, 2, 3""".stripMargin,
    "q_cypher_profile" ->
      "SELECT true AS has_profile, CAST(1 AS BIGINT) AS profiled_rows, true AS has_time",
    "q_cypher_or_solve_sampjaya" ->
      "SELECT 'SampJaya' AS algorithm, true AS feasible, true AS beats_uniform",
    "q_cypher_write_merge_rel" ->
      "SELECT CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_custkey < 3",
    "q_cypher_write_create" ->
      "SELECT nid, name FROM (SELECT CAST(n_nationkey + 1200000000 AS BIGINT) AS nid, n_name AS name FROM nation UNION ALL SELECT 1200000099, 'atlantis') ORDER BY nid",
    "q_cypher_write_set" ->
      "SELECT CAST(n_nationkey + 1200000000 AS BIGINT) AS nid, CASE WHEN n_nationkey < 3 THEN 'REDACTED' ELSE n_name END AS name FROM nation ORDER BY nid",
    "q_cypher_write_delete" ->
      "SELECT count(*) AS n FROM nation WHERE n_regionkey < 3",
    "q_cypher_write_merge" ->
      "SELECT * FROM (VALUES ('NATION_5', 1.0), ('atlantis2', 2.0)) t(name, balance) ORDER BY name",
    "q_cypher_show_indexes" ->
      "SELECT * FROM (VALUES ('<label-scan>', 'LOOKUP', 'ONLINE'), ('embeddings', 'VECTOR', 'ONLINE')) t(name, type, state) ORDER BY name",
    "q_cypher_show_constraints" ->
      "SELECT * FROM (VALUES ('unique_Customer_name', 'UNIQUENESS', 'Customer', 'name'), ('unique_Nation_name', 'UNIQUENESS', 'Nation', 'name')) t(name, type, label, property) ORDER BY name",
    "q_cypher_call_labels" ->
      "SELECT * FROM (VALUES ('Customer'), ('Lineitem'), ('Nation'), ('Order'), ('Part'), ('Region'), ('Supplier')) t(label) ORDER BY 1",
    "q_cypher_call_reltypes" ->
      "SELECT * FROM (VALUES ('CONTAINS'), ('HAS_PART'), ('IN_NATION'), ('IN_REGION'), ('PLACED'), ('SUPPLIED_BY')) t(relationshipType) ORDER BY 1",
    "q_cypher_call_propkeys" ->
      "SELECT * FROM (VALUES ('balance'), ('name'), ('weight')) t(propertyKey) ORDER BY 1",
    "q_cypher_temporal_access" ->
      "SELECT CAST(2024 AS BIGINT) AS yr, CAST(3 AS BIGINT) AS mo, CAST(5 AS BIGINT) AS dy, CAST(10 AS BIGINT) AS hh, CAST(20 AS BIGINT) AS mi, CAST(30 AS BIGINT) AS ss, CAST(epoch_ms(TIMESTAMP '2024-03-05 10:20:30') AS BIGINT) AS em, CAST(2 AS BIGINT) AS dd, CAST(3 AS BIGINT) AS dh, CAST(5 AS BIGINT) AS dm, CAST(11100 AS BIGINT) AS dsec, CAST(14 AS BIGINT) AS ymm",
    "q_cypher_duration_map" ->
      "SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1 day 2 hours 30 minutes' AS VARCHAR) AS plus_dt, CAST(CAST(DATE '2024-01-31' + INTERVAL '1 month' AS DATE) AS VARCHAR) AS plus_mo, 'INTERVAL ''1 03:30:00'' DAY TO SECOND' AS dur_s",
    "q_cypher_valuetype" ->
      "SELECT 'INTEGER' AS t_int, 'FLOAT' AS t_flt, 'STRING' AS t_str, 'BOOLEAN' AS t_bool, 'LIST' AS t_list, '12:34:56.000' AS t_time, 'INTERVAL ''1 03:30:00'' DAY TO SECOND' AS dur",
    // same traversal as q_bfs — the CALL surface must agree with the Scala API
    "q_cypher_call_bfs" -> GraphQueries.oracles("q_bfs"),
    "q_cypher_call_stats" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a, CAST(o_orderkey + 10000000 AS BIGINT) AS b FROM orders),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |deg AS (SELECT a AS id, count(*) AS d FROM sym GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS nodes,
        |      CAST(min(d) AS DOUBLE) AS deg_min, round(avg(d), 6) AS deg_mean,
        |      CAST(max(d) AS DOUBLE) AS deg_max,
        |      CAST((SELECT d FROM deg ORDER BY d LIMIT 1 OFFSET
        |        (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) - 1 FROM deg)) AS DOUBLE) AS deg_p90
        |      FROM deg),
        |ec AS (SELECT CAST(count(*) AS DOUBLE) AS edges FROM e),
        |rows1 AS (
        |  SELECT 'nodes' AS stat, nodes AS value FROM s
        |  UNION ALL SELECT 'edges', edges FROM ec
        |  UNION ALL SELECT 'density', round(edges * 2 / (nodes * (nodes - 1)), 6) FROM s, ec
        |  UNION ALL SELECT 'deg_min', deg_min FROM s
        |  UNION ALL SELECT 'deg_mean', deg_mean FROM s
        |  UNION ALL SELECT 'deg_max', deg_max FROM s
        |  UNION ALL SELECT 'deg_p90', deg_p90 FROM s
        |  UNION ALL SELECT 'deg_log2_' || CAST(length(bin(d)) - 1 AS VARCHAR),
        |    CAST(count(*) AS DOUBLE) FROM deg GROUP BY 1)
        |SELECT stat, value FROM rows1 ORDER BY stat""".stripMargin,
    "q_cypher_call_modularity" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a, CAST(o_orderkey + 10000000 AS BIGINT) AS b FROM orders),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |asg AS (SELECT DISTINCT a AS id, a % 8 AS community FROM sym),
        |m2 AS (SELECT CAST(count(*) * 2 AS DOUBLE) AS m2 FROM e),
        |deg AS (SELECT a AS id, count(*) AS d FROM sym GROUP BY 1),
        |dc AS (SELECT community, CAST(sum(d) AS DOUBLE) AS dc
        |       FROM deg JOIN asg USING (id) GROUP BY 1),
        |mc AS (SELECT ca.community, CAST(count(*) AS DOUBLE) AS mc
        |       FROM e JOIN asg ca ON ca.id = e.a JOIN asg cb ON cb.id = e.b
        |       WHERE ca.community = cb.community GROUP BY 1)
        |SELECT round(sum(coalesce(mc, 0) * 2 / m2 - (dc / m2) * (dc / m2)), 6) AS modularity
        |FROM dc LEFT JOIN mc USING (community), m2""".stripMargin,
    "q_cypher_call_louvain" -> GraphQueries.louvainOracleOver(
      "WITH pe0 AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a, CAST(o_orderkey + 10000000 AS BIGINT) AS b FROM orders)" +
        ", e AS (SELECT a AS src, b AS dst FROM pe0 UNION ALL SELECT b, a FROM pe0)" +
        ", ecnt AS (SELECT count(*) AS n FROM pe0)", 2),
    "q_cypher_call_louvain_levels" -> GraphQueries.louvainLevelsOracleOver(
      "WITH pe0 AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a, CAST(o_orderkey + 10000000 AS BIGINT) AS b FROM orders)" +
        ", e AS (SELECT a AS src, b AS dst FROM pe0 UNION ALL SELECT b, a FROM pe0)" +
        ", ecnt AS (SELECT count(*) AS n FROM pe0)", "pe0", 2),
    "q_cypher_call_node2vec" -> GraphQueries.node2vecOracleOver(
      "WITH pe AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a, CAST(o_orderkey + 10000000 AS BIGINT) AS b FROM orders)", 3),
    "q_cypher_call_bidirbfs" ->
      // layered graph: customer—order—lineitem—{part, supplier}; an order
      // has ONE customer and a lineitem ONE order, so the shortest
      // customer↔customer path is exactly 6 via any shared part/supplier
      """WITH l1 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_custkey = 1),
        |l2 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_custkey = 2)
        |SELECT CAST(1 AS BIGINT) AS src, CAST(2 AS BIGINT) AS dst, CAST(6 AS BIGINT) AS dist
        |WHERE EXISTS (SELECT 1 FROM l1 JOIN l2 ON l1.p = l2.p)
        |   OR EXISTS (SELECT 1 FROM l1 JOIN l2 ON l1.s = l2.s)""".stripMargin,
    "q_cypher_call_harmonic" -> GraphQueries.oracles("q_harmonic_centrality"),
    "q_cypher_call_closeness" -> GraphQueries.oracles("q_closeness_centrality"),
    "q_cypher_call_betweenness" -> GraphQueries.oracles("q_betweenness"),
    // same kernel as q_wcc — the config-map CALL must agree with the Scala API
    "q_cypher_call_wcc" -> GraphQueries.oracles("q_wcc"),
    "q_cypher_call_kcore" ->
      """WITH e0 AS (
        | SELECT CAST(c_custkey AS BIGINT) AS a, CAST(1200000000 + c_nationkey AS BIGINT) AS b FROM customer
        | UNION SELECT CAST(1200000000 + n_nationkey AS BIGINT), CAST(1300000000 + n_regionkey AS BIGINT) FROM nation),
        |sym AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |d1 AS (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
        |k1 AS (SELECT a FROM d1 WHERE deg >= 2),
        |e1 AS (SELECT s.a, s.b FROM sym s JOIN k1 x ON s.a = x.a JOIN k1 y ON s.b = y.a)
        |SELECT a AS id, count(*) AS deg FROM e1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cypher_call_knn" ->
      "SELECT e.vec_id AS id, round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) AS score FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id LIMIT 10",
    "q_cypher_match_agg" ->
      "SELECT c_name AS name, count(*) AS n FROM customer JOIN orders ON o_custkey = c_custkey WHERE o_totalprice > 200000 GROUP BY 1 ORDER BY n DESC, name LIMIT 10",
    "q_cypher_2hop" ->
      "SELECT CAST(o_custkey AS BIGINT) AS cid, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1",
    "q_cypher_2hop_bucketed" ->
      "SELECT CAST(o_custkey AS BIGINT) AS cid, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1",
    "q_cypher_optional" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid, count(o_orderkey) AS n FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O' GROUP BY 1 ORDER BY 1",
    "q_cypher_varlength" ->
      """WITH e AS (
        | SELECT CAST(o_custkey AS BIGINT) AS src, CAST(o_orderkey + 10000000 AS BIGINT) AS dst FROM orders
        | UNION ALL SELECT CAST(l_orderkey + 10000000 AS BIGINT), CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT) FROM lineitem
        | UNION ALL SELECT CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT), CAST(1000000000 + l_partkey AS BIGINT) FROM lineitem
        | UNION ALL SELECT CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT), CAST(1100000000 + l_suppkey AS BIGINT) FROM lineitem
        | UNION ALL SELECT CAST(c_custkey AS BIGINT), CAST(1200000000 + c_nationkey AS BIGINT) FROM customer
        | UNION ALL SELECT CAST(1100000000 + s_suppkey AS BIGINT), CAST(1200000000 + s_nationkey AS BIGINT) FROM supplier
        | UNION ALL SELECT CAST(1200000000 + n_nationkey AS BIGINT), CAST(1300000000 + n_regionkey AS BIGINT) FROM nation
        |), s AS (SELECT CAST(c_custkey AS BIGINT) AS start FROM customer WHERE c_custkey < 20),
        |h1 AS (SELECT DISTINCT s.start, e.dst AS node FROM s JOIN e ON e.src = s.start),
        |h2 AS (SELECT DISTINCT h1.start, e.dst AS node FROM h1 JOIN e ON e.src = h1.node)
        |SELECT start, node FROM (SELECT start, node FROM h1 UNION SELECT start, node FROM h2) ORDER BY start, node""".stripMargin,
    "q_cypher_varlength_props" ->
      """WITH e AS (
        | SELECT CAST(l_orderkey + 10000000 AS BIGINT) AS src, CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT) AS dst FROM lineitem WHERE l_quantity = 5.0
        | UNION ALL SELECT CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT), CAST(1000000000 + l_partkey AS BIGINT) FROM lineitem WHERE l_extendedprice = 5.0
        |), s AS (SELECT CAST(o_orderkey + 10000000 AS BIGINT) AS start FROM orders WHERE o_orderkey < 50),
        |h1 AS (SELECT DISTINCT s.start, e.dst AS node FROM s JOIN e ON e.src = s.start),
        |h2 AS (SELECT DISTINCT h1.start, e.dst AS node FROM h1 JOIN e ON e.src = h1.node)
        |SELECT start, node FROM (SELECT start, node FROM h1 UNION SELECT start, node FROM h2) ORDER BY start, node""".stripMargin,
    "q_cypher_write_label" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_major FROM nation WHERE n_nationkey >= 2 AND n_nationkey < 5",
    "q_cypher_create_return" ->
      "SELECT CAST(1200000099 AS BIGINT) AS nid, 'atlantis' AS name, 7.5 AS bal",
    "q_cypher_call_subquery_corr" ->
      "SELECT CAST(1200000000 + n_nationkey AS BIGINT) AS nid, (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust FROM nation ORDER BY 1",
    "q_cypher_call_subquery_topk" ->
      """SELECT cid, bal FROM (
        | SELECT CAST(o_custkey AS BIGINT) AS cid, o_totalprice AS bal,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
        | FROM orders WHERE o_custkey < 10) WHERE rn <= 2 ORDER BY cid, bal""".stripMargin,
    "q_cypher_pattern_comp" ->
      """SELECT CAST(c_custkey AS BIGINT) AS cid,
        | coalesce((SELECT string_agg(format('{:.4f}', o_totalprice), ',' ORDER BY o_totalprice) FROM orders WHERE o_custkey = c_custkey), '') AS order_totals
        |FROM customer WHERE c_custkey < 10 ORDER BY cid""".stripMargin,
    "q_cypher_allshortest" ->
      """SELECT cid, pid, count(*) AS n_paths FROM (
        | SELECT DISTINCT CAST(o_custkey AS BIGINT) AS cid, CAST(1000000000 + l_partkey AS BIGINT) AS pid,
        |  o_orderkey, l_orderkey*8 + l_linenumber AS ln
        | FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE o_custkey < 5
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_cypher_path_anon" ->
      """SELECT CAST(o_custkey AS BIGINT) AS cid, CAST(o_orderkey + 10000000 AS BIGINT) AS mid,
        | CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT) AS lid, 2 AS len
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_custkey < 3 ORDER BY cid, mid, lid""".stripMargin,
    "q_cypher_path_rels" ->
      "SELECT CAST(o_custkey AS BIGINT) AS cid, CAST(o_orderkey + 10000000 AS BIGINT) AS eid FROM orders WHERE o_custkey < 3 ORDER BY 1, 2",
    "q_cypher_where_str" ->
      "SELECT CAST(p_partkey + 1000000000 AS BIGINT) AS pid, p_name AS name FROM part WHERE starts_with(p_name, 'a') OR contains(p_name, 'ol') ORDER BY pid",
    "q_cypher_distinct" ->
      "SELECT DISTINCT CAST(1200000000 + c_nationkey AS BIGINT) AS nid FROM customer ORDER BY 1",
    "q_cypher_case" ->
      "SELECT CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "q_cypher_multipattern" ->
      "SELECT CAST(1200000000 + c_nationkey AS BIGINT) AS nid, count(*) AS n_orders FROM customer JOIN orders ON o_custkey = c_custkey WHERE c_custkey < 50 GROUP BY 1 ORDER BY 1",
    "q_cypher_fn_parity" ->
      "SELECT 'node:' || CAST(CAST(1200000000 + n_nationkey AS BIGINT) AS VARCHAR) AS eid, true AS nan_t, CAST(CAST(1200000000 + n_nationkey AS BIGINT) AS VARCHAR) AS sid FROM nation ORDER BY 1",
    // the lineitem self-joins mirror the graph build: Lineitem NODES dedup
    // on lineId but each lineitem ROW contributes one CONTAINS and one
    // HAS_PART edge, so traversing through a node multiplies the per-row
    // edges (l1b = HAS_PART edges of node l1; l2c = CONTAINS edges into
    // node l2 from the bound order)
    "q_cypher_wco_cycle" ->
      ("SELECT count(*) AS n_pairs FROM orders o " +
        "JOIN lineitem l1 ON l1.l_orderkey = o.o_orderkey " +
        "JOIN lineitem l1b ON l1b.l_orderkey = l1.l_orderkey AND l1b.l_linenumber = l1.l_linenumber " +
        "JOIN lineitem l2b ON l2b.l_partkey = l1b.l_partkey " +
        "JOIN lineitem l2c ON l2c.l_orderkey = l2b.l_orderkey AND l2c.l_linenumber = l2b.l_linenumber AND l2c.l_orderkey = o.o_orderkey " +
        "WHERE o.o_orderkey < 2000"),
    "q_cypher_unwind" ->
      "SELECT CAST(1200000000 + n_nationkey AS BIGINT) AS nid, CAST(i AS BIGINT) AS i FROM nation, (SELECT unnest([1, 2, 3]) AS i) t ORDER BY 1, 2",
    "q_cypher_skip_limit" ->
      "SELECT CAST(o_orderkey + 10000000 AS BIGINT) AS oid, o_totalprice AS price FROM orders ORDER BY price DESC, oid LIMIT 10 OFFSET 5",
    "q_cypher_with_agg" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid, count(*) AS n, round(sum(o_totalprice), 2) AS rev FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY 1 HAVING count(*) >= 10 ORDER BY 1",
    "q_cypher_with_expand" ->
      "SELECT n_name AS nation, count(*) AS n_big, round(sum(rev), 2) AS total FROM (SELECT c_custkey, c_nationkey, sum(o_totalprice) AS rev FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1, 2 HAVING sum(o_totalprice) > 2000000) t JOIN nation ON n_nationkey = c_nationkey GROUP BY 1 ORDER BY 1",
    "q_cypher_with_chain" ->
      "SELECT bucket, count(*) AS customers, round(avg(n), 4) AS avg_orders FROM (SELECT CASE WHEN n >= 15 THEN 'many' WHEN n >= 5 THEN 'some' ELSE 'few' END AS bucket, n FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)) GROUP BY 1 ORDER BY 1",
    "q_cypher_with_topk" ->
      "SELECT oid, price FROM (SELECT CAST(o_orderkey + 10000000 AS BIGINT) AS oid, round(o_totalprice, 2) AS price FROM orders ORDER BY o_totalprice DESC, oid LIMIT 10) ORDER BY oid",
    "q_cypher_exists" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') ORDER BY 1",
    "q_cypher_not_exists" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') ORDER BY 1",
    "q_cypher_union" ->
      "SELECT nid FROM (SELECT CAST(1200000000 + c_nationkey AS BIGINT) AS nid FROM customer UNION SELECT CAST(1200000000 + s_nationkey AS BIGINT) AS nid FROM supplier)",
    "q_cypher_param" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid, count(*) AS n FROM customer JOIN orders ON o_custkey = c_custkey WHERE o_totalprice > 150000.0 AND c_custkey < 200 GROUP BY 1 ORDER BY 1",
    "q_cypher_shortestpath" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid, CAST(1200000000 + c_nationkey AS BIGINT) AS nid, CAST(1 AS INTEGER) AS len FROM customer WHERE c_custkey < 20 ORDER BY 1, 2",
    "q_cypher_listops" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid, string_split(c_name, '#')[2] AS num, CAST(6 AS BIGINT) AS s, true AS b FROM customer WHERE c_custkey < 100 ORDER BY 1",
    "q_cypher_split_dynamic" ->
      "SELECT CAST(c_custkey AS BIGINT) AS k, array_to_string(string_split(c_name, CASE WHEN c_custkey % 2 = 0 THEN '.' ELSE CAST(c_custkey % 10 AS VARCHAR) END), '|') AS parts FROM customer WHERE c_custkey < 200 ORDER BY k")
}
