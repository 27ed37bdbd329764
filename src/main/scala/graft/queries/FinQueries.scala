package graft.queries

import graft.cypher.QueryEngine
import graft.model.FinLoader
import org.apache.spark.sql.{DataFrame, SparkSession}

/** LDBC FinBench-style temporal-graph workload executed through the Cypher
  * engine over the FinBench-shaped projection (`graft.model.FinLoader`).
  * Query texts mirror the reference's complex-read set
  * (`benches/finbench_benchmark.rs:55-200`, `docs/ldbc/FINBENCH.md`) —
  * transfer-amount aggregation, temporal windows on edge properties,
  * transfer-path shortest path, 3-hop cycle detection, loan tracing,
  * guarantee chains, shared-medium sign-in, owner stats — with fixture
  * constants and deterministic ORDER BY tiebreaks (the usual adaptation).
  */
object FinQueries {

  private def run(cy: String)(s: SparkSession, d: String): DataFrame =
    QueryEngine.execute(cy, FinLoader.fin(s, d))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CR-1: transfer-in totals for one account (edge-property aggregation).
    // Money sums go through exact integer ten-thousandths (amounts carry at
    // most 4 dp): a plain double sum is partition-order-dependent and can
    // flip round(x, 2) at a half boundary between engines/layouts.
    "q_finbench_cr1" -> (run(
      """MATCH (src:Account)-[t:TRANSFER]->(a:Account {id: 1})
        |RETURN a.id AS accountId, count(t) AS transferInCount,
        |       round(sum(round(t.amount * 10000)) / 10000.0, 2) AS totalIn""".stripMargin) _),

    // CR-2: transfers into blocked accounts within a time window (the
    // temporal-filter shape; timestamps are edge properties)
    "q_finbench_cr2" -> (run(
      """MATCH (src:Account)-[t:TRANSFER]->(dst:Account {isBlocked: true})
        |WHERE t.timestamp >= 1502000000000 AND t.timestamp < 1506000000000
        |RETURN src.id AS srcId, dst.id AS dstId, t.amount AS amount,
        |       t.timestamp AS ts
        |ORDER BY amount DESC, ts, srcId, dstId
        |LIMIT 20""".stripMargin) _),

    // CR-3: shortest transfer path between two accounts
    "q_finbench_cr3" -> (run(
      """MATCH p = shortestPath((a1:Account {id: 1})-[:TRANSFER*]-(a2:Account {id: 100}))
        |RETURN length(p) AS pathLength""".stripMargin) _),

    // CR-4: 3-hop transfer cycle detection (the WCO cyclic shape)
    "q_finbench_cr4" -> (run(
      """MATCH (a:Account {id: 1})-[t1:TRANSFER]->(b:Account)-[t2:TRANSFER]->(c:Account)-[t3:TRANSFER]->(a)
        |WHERE b.id <> 1 AND c.id <> 1 AND b.id <> c.id
        |RETURN a.id AS aId, b.id AS bId, c.id AS cId, t1.amount AS amt1,
        |       t2.amount AS amt2, t3.amount AS amt3
        |ORDER BY bId, cId, amt1, amt2, amt3
        |LIMIT 10""".stripMargin) _),

    // CR-6: loan deposit tracing — where did the loan money go
    "q_finbench_cr6" -> (run(
      """MATCH (l:Loan {id: 40000010})-[d:DEPOSIT]->(a:Account)-[t:TRANSFER]->(dst:Account)
        |RETURN a.id AS accountId, d.amount AS depositAmount,
        |       dst.id AS transferTarget, t.amount AS transferAmount
        |ORDER BY transferAmount DESC, transferTarget, depositAmount
        |LIMIT 20""".stripMargin) _),

    // CR-9: guarantee chain up to 3 hops
    "q_finbench_cr9" -> (run(
      """MATCH (c:Company {id: 30000001})-[:GUARANTEE*1..3]->(g:Company)
        |RETURN DISTINCT g.id AS companyId, g.name AS companyName
        |ORDER BY companyId
        |LIMIT 20""".stripMargin) _),

    // CR-11: accounts sharing a sign-in medium with account 1
    "q_finbench_cr11" -> (run(
      """MATCH (a:Account {id: 1})-[:SIGN_IN]->(m:Medium)<-[:SIGN_IN]-(other:Account)
        |WHERE other.id <> 1
        |RETURN DISTINCT other.id AS otherId, other.accountType AS accountType,
        |       m.mediumType AS mediumType
        |ORDER BY otherId
        |LIMIT 20""".stripMargin) _),

    // CR-12: transfer stats for one person's accounts
    "q_finbench_cr12" -> (run(
      """MATCH (p:Person {id: 20000001})-[:OWN]->(a:Account)-[t:TRANSFER]->(dst:Account)
        |RETURN a.id AS accountId, count(t) AS transferCount,
        |       round(sum(round(t.amount * 10000)) / 10000.0, 2) AS totalAmount
        |ORDER BY totalAmount DESC, accountId""".stripMargin) _)
  )

  /** FinBench derivation in SQL — line-for-line `FinLoader.build`. */
  private val FinPre =
    """acct AS (SELECT c_custkey AS id, c_custkey % 37 = 0 AS isBlocked,
      |   c_mktsegment AS accountType, c_nationkey FROM customer),
      |xfer AS (SELECT o_custkey AS s,
      |   (o_custkey + 1 + o_orderkey % 7) % (SELECT count(*) FROM customer) AS d,
      |   o_totalprice AS amount, 1500000000000 + o_orderkey * 1000000 AS ts FROM orders
      | UNION ALL SELECT o_custkey,
      |   (o_custkey + (SELECT count(*) FROM customer) - 3) % (SELECT count(*) FROM customer),
      |   o_totalprice * 0.25, 1500000000000 + o_orderkey * 1000000 FROM orders),
      |own AS (SELECT 20000000 + (c_custkey % (SELECT count(*) FROM supplier)) AS pid,
      |   c_custkey AS aid FROM customer),
      |company AS (SELECT 30000000 + p_partkey AS id, p_name AS name FROM part),
      |deposit AS (SELECT 40000000 + o_orderkey AS lid, o_custkey AS aid,
      |   o_totalprice * 0.5 AS amount FROM orders WHERE o_orderkey % 10 = 0),
      |guar AS (SELECT a.p_partkey AS s, b.p_partkey AS d FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1 WHERE a.p_partkey % 3 <> 0
      | UNION ALL SELECT a.p_partkey, b.p_partkey FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 7 WHERE a.p_partkey % 5 < 2),
      |medium AS (SELECT 50000000 + n_nationkey AS id, n_name AS mediumType, n_nationkey FROM nation),
      |tu AS (SELECT s, d FROM xfer UNION ALL SELECT d, s FROM xfer)""".stripMargin

  private def o(sql: String): String = s"WITH $FinPre $sql"

  val oracles: Map[String, String] = Map(
    "q_finbench_cr1" -> o(
      """SELECT CAST(1 AS BIGINT) AS accountId, count(*) AS transferInCount,
        | round(sum(round(amount * 10000)) / 10000.0, 2) AS totalIn FROM xfer WHERE d = 1""".stripMargin),
    "q_finbench_cr2" -> o(
      """SELECT x.s AS srcId, x.d AS dstId, x.amount AS amount, x.ts AS ts
        |FROM xfer x JOIN acct ON acct.id = x.d AND acct.isBlocked
        |WHERE x.ts >= 1502000000000 AND x.ts < 1506000000000
        |ORDER BY amount DESC, ts, srcId, dstId LIMIT 20""".stripMargin),
    "q_finbench_cr3" ->
      s"""WITH RECURSIVE $FinPre,
         |walk(node, depth) AS (SELECT 1, 0 UNION
         | SELECT tu.d, depth + 1 FROM walk JOIN tu ON tu.s = walk.node
         | WHERE depth < 30 AND walk.node <> 100)
         |SELECT CAST(min(depth) AS BIGINT) AS pathLength FROM walk WHERE node = 100""".stripMargin,
    "q_finbench_cr4" -> o(
      """SELECT CAST(1 AS BIGINT) AS aId, t1.d AS bId, t2.d AS cId,
        | t1.amount AS amt1, t2.amount AS amt2, t3.amount AS amt3
        |FROM xfer t1 JOIN xfer t2 ON t2.s = t1.d
        | JOIN xfer t3 ON t3.s = t2.d AND t3.d = 1
        |WHERE t1.s = 1 AND t1.d <> 1 AND t2.d <> 1 AND t2.d <> t1.d
        |ORDER BY bId, cId, amt1, amt2, amt3 LIMIT 10""".stripMargin),
    "q_finbench_cr6" -> o(
      """SELECT d.aid AS accountId, d.amount AS depositAmount,
        | x.d AS transferTarget, x.amount AS transferAmount
        |FROM deposit d JOIN xfer x ON x.s = d.aid
        |WHERE d.lid = 40000010
        |ORDER BY transferAmount DESC, transferTarget, depositAmount LIMIT 20""".stripMargin),
    "q_finbench_cr9" -> o(
      """SELECT DISTINCT 30000000 + r.d AS companyId, c.name AS companyName
        |FROM (SELECT d FROM guar WHERE s = 1
        |  UNION SELECT g2.d FROM guar g2 JOIN (SELECT d FROM guar WHERE s = 1) r1 ON g2.s = r1.d
        |  UNION SELECT g3.d FROM guar g3 JOIN (SELECT g2.d FROM guar g2
        |    JOIN (SELECT d FROM guar WHERE s = 1) r1 ON g2.s = r1.d) r2 ON g3.s = r2.d) r
        | JOIN company c ON c.id = 30000000 + r.d
        |ORDER BY companyId LIMIT 20""".stripMargin),
    "q_finbench_cr11" -> o(
      """SELECT DISTINCT a2.id AS otherId, a2.accountType AS accountType,
        | m.mediumType AS mediumType
        |FROM acct a1 JOIN acct a2 ON a2.c_nationkey = a1.c_nationkey AND a2.id <> 1
        | JOIN medium m ON m.n_nationkey = a1.c_nationkey
        |WHERE a1.id = 1
        |ORDER BY otherId LIMIT 20""".stripMargin),
    "q_finbench_cr12" -> o(
      """SELECT o.aid AS accountId, count(*) AS transferCount,
        | round(sum(round(x.amount * 10000)) / 10000.0, 2) AS totalAmount
        |FROM own o JOIN xfer x ON x.s = o.aid
        |WHERE o.pid = 20000001
        |GROUP BY 1 ORDER BY totalAmount DESC, accountId""".stripMargin)
  )
}
