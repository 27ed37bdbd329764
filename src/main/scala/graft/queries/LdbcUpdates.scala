package graft.queries

import graft.cypher.QueryEngine
import graft.model.{PropertyGraph, SnbLoader}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LDBC SNB Interactive UPDATE workload — INS1-INS8 + DEL1-DEL8 executed
  * end-to-end through the Cypher write path over the SNB projection, in the
  * reference's execution order (reads -> INS1-8 -> DEL1-8:
  * `benches/ldbc_benchmark.rs:326-472`, `docs/ldbc/SNB_INTERACTIVE.md:78-117`).
  *
  * Adaptations, in the read suite's spirit (`LdbcQueries`):
  *   - fixture anchors: person 101 (reference 933), post 10000056, comment
  *     100000450 (exists at sf0.01; at other SFs the oracle's conditional
  *     delta keeps the compare exact);
  *   - DEL2/DEL3/DEL8 target the INSERTED person's edges (the reference
  *     deletes person 933's pre-existing likes), making the sequence exactly
  *     net-zero. In the reference's order DEL1's DETACH cascade has already
  *     removed those edges, so they execute as EMPTY-MATCH deletes — itself
  *     a pinned semantic (Cypher DELETE over zero bindings succeeds);
  *   - the read-back is label/edge-type cardinalities after each phase; the
  *     DuckDB oracle recomputes them arithmetically (base + literal insert
  *     deltas for the INS phase, base again after the deletes).
  *
  * Scale shape: every statement is an anti-join / unionByName batch
  * transform (GraphMutations); the only driver-side value is the one-time
  * edge-id watermark, which the write path establishes once and then
  * carries through `PropertyGraph.edgeIdHw` for the rest of the chain.
  */
object LdbcUpdates {

  private val Ins = Seq(
    // INS1 Add Person (literals typed to the projection's columns)
    "CREATE (p:Person {id: 999999, firstName: 'TestUser', lastName: 'Benchmark', " +
      "gender: 'male', birthday: 100, creationDate: '2024', " +
      "locationIP: '1.2.3.4', browserUsed: 'Firefox'})",
    // INS2 Add Like to Post
    "MATCH (p:Person {id: 999999}), (m:Post {id: 10000056}) " +
      "CREATE (p)-[:LIKES {creationDate: 1709251200000}]->(m)",
    // INS3 Add Like to Comment
    "MATCH (p:Person {id: 999999}), (m:Comment {id: 100000450}) " +
      "CREATE (p)-[:LIKES {creationDate: 1709251200000}]->(m)",
    // INS4 Add Forum
    "CREATE (f:Forum {id: 999998, title: 'Benchmark Forum'})",
    // INS5 Add Forum Member
    "MATCH (f:Forum {id: 999998}), (p:Person {id: 101}) " +
      "CREATE (f)-[:HAS_MEMBER {joinDate: 1709251200000}]->(p)",
    // INS6 Add Post (language/length/content are schema-free appends)
    "CREATE (m:Post {id: 999997, imageFile: '', creationDate: '2024-03-01', " +
      "language: 'en', content: 'Benchmark post content', length: 24})",
    // INS7 Add Comment
    "CREATE (c:Comment {id: 999996, creationDate: '2024-03-01', " +
      "content: 'Benchmark comment', length: 18})",
    // INS8 Add Friendship
    "MATCH (p1:Person {id: 101}), (p2:Person {id: 999999}) " +
      "CREATE (p1)-[:KNOWS {creationDate: 1709251200000}]->(p2)")

  private val Del = Seq(
    // DEL1 Remove Person — DETACH cascades the INS2/INS3 likes + INS8 knows
    "MATCH (p:Person {id: 999999}) DETACH DELETE p",
    // DEL2/DEL3 Remove likes — empty matches after DEL1's cascade
    "MATCH (p:Person {id: 999999})-[l:LIKES]->(m:Post {id: 10000056}) DELETE l",
    "MATCH (p:Person {id: 999999})-[l:LIKES]->(c:Comment {id: 100000450}) DELETE l",
    // DEL4 Remove Forum — cascades the INS5 membership
    "MATCH (f:Forum {id: 999998}) DETACH DELETE f",
    // DEL5 Remove Forum Member — empty match after DEL4
    "MATCH (f:Forum {id: 999998})-[m:HAS_MEMBER]->(p:Person {id: 101}) DELETE m",
    // DEL6/DEL7 Remove Post / Comment
    "MATCH (m:Post {id: 999997}) DETACH DELETE m",
    "MATCH (c:Comment {id: 999996}) DETACH DELETE c",
    // DEL8 Remove Friendship — empty match after DEL1
    "MATCH (p1:Person {id: 101})-[k:KNOWS]->(p2:Person {id: 999999}) DELETE k")

  /** Label / edge-type cardinalities of one phase, melted to
    * (phase, kind, cnt) rows — two single-pass conditional aggregates. */
  private def counts(g: PropertyGraph, phase: String): DataFrame = {
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    val n = g.nodes.agg(
      cnt(array_contains(col("labels"), "Person")).as("person"),
      cnt(array_contains(col("labels"), "Forum")).as("forum"),
      cnt(array_contains(col("labels"), "Post")).as("post"),
      cnt(array_contains(col("labels"), "Comment")).as("comment"))
    val e = g.edges.agg(
      cnt(col("relationship") === "KNOWS").as("knows"),
      cnt(col("relationship") === "LIKES").as("likes"),
      cnt(col("relationship") === "HAS_MEMBER").as("has_member"))
    n.crossJoin(e) // 1x1 aggregate rows
      .select(lit(phase).as("phase"),
        expr("stack(7, 'person', person, 'forum', forum, 'post', post, " +
          "'comment', comment, 'knows', knows, 'likes', likes, " +
          "'has_member', has_member)").as(Seq("kind", "cnt")))
      .select(col("phase"), col("kind"), col("cnt"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ldbc_upd" -> ((s, d) => {
      val g0 = SnbLoader.snb(s, d)
      val gIns = Ins.foldLeft(g0)((g, cy) => QueryEngine.executeWrite(cy, g)._1)
      val gDel = Del.foldLeft(gIns)((g, cy) => QueryEngine.executeWrite(cy, g)._1)
      counts(gIns, "ins").unionAll(counts(gDel, "del"))
        .orderBy(col("phase"), col("kind"))
    }))

  val oracles: Map[String, String] = Map(
    "q_ldbc_upd" ->
      s"""WITH ${LdbcQueries.Pre},
         |base(kind, cnt) AS (
         | SELECT 'person', (SELECT count(*) FROM person) UNION ALL
         | SELECT 'forum', (SELECT count(*) FROM forum) UNION ALL
         | SELECT 'post', (SELECT count(*) FROM post) UNION ALL
         | SELECT 'comment', (SELECT count(*) FROM cmt) UNION ALL
         | SELECT 'knows', (SELECT count(*) FROM k0) UNION ALL
         | SELECT 'likes', (SELECT count(*) FROM likes) UNION ALL
         | SELECT 'has_member', (SELECT count(*) FROM member)),
         |delta(kind, d) AS (
         | SELECT 'person', 1 UNION ALL SELECT 'forum', 1 UNION ALL
         | SELECT 'post', 1 UNION ALL SELECT 'comment', 1 UNION ALL
         | SELECT 'knows', 1 UNION ALL
         | SELECT 'likes', (SELECT count(*) FROM post WHERE id = 10000056)
         |    + (SELECT count(*) FROM cmt WHERE id = 100000450) UNION ALL
         | SELECT 'has_member', 1)
         |SELECT phase, kind, cnt FROM (
         | SELECT 'ins' AS phase, b.kind AS kind, CAST(b.cnt + d.d AS BIGINT) AS cnt
         | FROM base b JOIN delta d ON d.kind = b.kind
         | UNION ALL
         | SELECT 'del', kind, CAST(cnt AS BIGINT) FROM base)
         |ORDER BY phase, kind""".stripMargin)
}
