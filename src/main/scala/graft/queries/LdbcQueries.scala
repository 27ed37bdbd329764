package graft.queries

import graft.cypher.QueryEngine
import graft.model.SnbLoader
import org.apache.spark.sql.{DataFrame, SparkSession}

/** LDBC SNB Interactive read suite (IS1-IS7, IC1-IC14) executed end-to-end
  * through the Cypher engine over the SNB-shaped graph projection
  * (`graft.model.SnbLoader` — the deterministic TPC-H derivation the DuckDB
  * oracles below recompute in SQL).
  *
  * Query texts mirror the reference's benchmark strings
  * (`benches/ldbc_benchmark.rs:54-325`, results in `docs/ldbc/
  * SNB_INTERACTIVE.md:18-76`) with three mechanical adaptations:
  *   - the person/tag parameters are STATS-DERIVED at 90th-percentile
  *     degree (`SnbLoader.anchors` — tracking the reference's parameter
  *     curation in `benches/ldbc_common/mod.rs:460-628`), passed as
  *     `$anchorPerson`/`$anchorTag`; the DuckDB oracles recompute the same
  *     anchors in SQL (`Pre` adeg/anchor/tdeg/atag CTEs). The message
  *     anchor (post 10000056) and path target (77) stay fixture constants;
  *     names/dates come from the derived graph;
  *   - every ORDER BY gets a deterministic id tiebreaker and every returned
  *     expression an explicit alias (the driver compare hashes by column
  *     name and row order);
  *   - IS7's `EXISTS {...}` in RETURN becomes a pattern-comprehension size
  *     test (our EXISTS subquery form lives in WHERE), and IC14 returns
  *     (pathLength, pathCount) instead of raw node arrays — the
  *     q_cypher_allshortest scalarization precedent.
  */
object LdbcQueries {

  private def runOn(cy: String, zipf: Boolean)(s: SparkSession, d: String): DataFrame = {
    // stats-derived anchors (SnbLoader.anchors — percentile-of-degree, the
    // reference's parameter-curation character) passed as query parameters;
    // the zipf twin derives the SAME statistics over its power-law graph
    val (pid, tag, target) =
      if (zipf) SnbLoader.anchorsZipf(s, d) else SnbLoader.anchors(s, d)
    // IC3/IC11 neighborhood-derived filters (SnbLoader.icParams): computed
    // lazily so the queries that don't use them never pay the jobs
    lazy val ic = if (zipf) SnbLoader.icParamsZipf(s, d) else SnbLoader.icParams(s, d)
    val base = Map[String, Any](
      "anchorPerson" -> pid, "anchorTag" -> tag, "pathTarget" -> target)
    val params =
      if (!cy.contains("$ic")) base
      else base ++ Map[String, Any](
        "ic3Nation1" -> ic.nation1, "ic3Nation2" -> ic.nation2,
        "ic3From" -> ic.from, "ic3To" -> ic.to,
        "ic11Org" -> ic.org, "ic11YearLt" -> ic.yearLt)
    QueryEngine.execute(cy,
      if (zipf) SnbLoader.snbZipf(s, d) else SnbLoader.snb(s, d), params)
  }
  private def run(cy: String)(s: SparkSession, d: String): DataFrame =
    runOn(cy, zipf = false)(s, d)
  private def runZ(cy: String)(s: SparkSession, d: String): DataFrame =
    runOn(cy, zipf = true)(s, d)

  // Friend-of-friend-heavy IC texts, shared verbatim by the standard rows
  // and their `_zipf` twins (same Cypher, power-law KNOWS fixture —
  // `SnbLoader.snbZipf` — with twin-derived anchors/parameters).
  private val Ic3Text =
    """MATCH (p:Person {id: $anchorPerson})-[:KNOWS*1..2]-(friend:Person)
      |WHERE friend.id <> $anchorPerson
      |WITH DISTINCT friend
      |MATCH (friend)<-[:HAS_CREATOR]-(m:Post)-[:IS_LOCATED_IN]->(place:Place)
      |WHERE m.creationDate >= $ic3From AND m.creationDate < $ic3To
      |  AND (place.name = $ic3Nation1 OR place.name = $ic3Nation2)
      |RETURN friend.id AS friendId, friend.firstName AS firstName,
      |       friend.lastName AS lastName, count(m) AS msgCount
      |ORDER BY msgCount DESC, friendId
      |LIMIT 20""".stripMargin
  private val Ic5Text =
    """MATCH (p:Person {id: $anchorPerson})-[:KNOWS*1..2]-(friend:Person)
      |WHERE friend.id <> $anchorPerson
      |WITH DISTINCT friend
      |MATCH (friend)<-[:HAS_MEMBER]-(forum:Forum)
      |RETURN forum.id AS forumId, forum.title AS forumTitle,
      |       count(friend) AS memberCount
      |ORDER BY memberCount DESC, forumId
      |LIMIT 20""".stripMargin
  private val Ic6Text =
    """MATCH (p:Person {id: $anchorPerson})-[:KNOWS*1..2]-(friend:Person)<-[:HAS_CREATOR]-(post:Post)-[:HAS_TAG]->(tag:Tag {name: $anchorTag})
      |WHERE friend.id <> $anchorPerson
      |WITH DISTINCT post
      |MATCH (post)-[:HAS_TAG]->(otherTag:Tag)
      |WHERE otherTag.name <> $anchorTag
      |RETURN otherTag.name AS tagName, count(post) AS postCount
      |ORDER BY postCount DESC, tagName
      |LIMIT 10""".stripMargin
  private val Ic10Text =
    """MATCH (p:Person {id: $anchorPerson})-[:KNOWS*2]-(stranger:Person)
      |WHERE stranger.id <> $anchorPerson AND NOT EXISTS { MATCH (p)-[:KNOWS]-(stranger) }
      |WITH DISTINCT stranger
      |MATCH (stranger)-[:HAS_INTEREST]->(tag:Tag)
      |RETURN stranger.id AS strangerId, stranger.firstName AS firstName,
      |       stranger.lastName AS lastName, count(tag) AS commonInterests
      |ORDER BY commonInterests DESC, strangerId
      |LIMIT 10""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- short reads -----------------------------------------------------
    "q_ldbc_is1" -> (run(
      """MATCH (p:Person {id: $anchorPerson})
        |RETURN p.firstName AS firstName, p.lastName AS lastName,
        |       p.birthday AS birthday, p.locationIP AS locationIP,
        |       p.browserUsed AS browserUsed, p.gender AS gender,
        |       p.creationDate AS creationDate""".stripMargin) _),

    "q_ldbc_is2" -> (run(
      """MATCH (p:Person {id: $anchorPerson})<-[:HAS_CREATOR]-(m:Post)
        |RETURN m.id AS postId, m.content AS content, m.creationDate AS creationDate
        |ORDER BY creationDate DESC, postId DESC
        |LIMIT 10""".stripMargin) _),

    "q_ldbc_is3" -> (run(
      """MATCH (p:Person {id: $anchorPerson})-[:KNOWS]-(friend:Person)
        |RETURN friend.id AS friendId, friend.firstName AS firstName,
        |       friend.lastName AS lastName
        |ORDER BY firstName, lastName, friendId""".stripMargin) _),

    "q_ldbc_is4" -> (run(
      """MATCH (m:Post {id: 10000056})
        |RETURN m.creationDate AS creationDate,
        |       coalesce(m.content, m.imageFile) AS summary""".stripMargin) _),

    "q_ldbc_is5" -> (run(
      """MATCH (m:Post {id: 10000056})-[:HAS_CREATOR]->(p:Person)
        |RETURN p.id AS personId, p.firstName AS firstName,
        |       p.lastName AS lastName""".stripMargin) _),

    "q_ldbc_is6" -> (run(
      """MATCH (m:Post {id: 10000056})<-[:CONTAINER_OF]-(f:Forum)-[:HAS_MODERATOR]->(mo:Person)
        |RETURN f.id AS forumId, f.title AS forumTitle, mo.id AS moderatorId,
        |       mo.firstName AS firstName, mo.lastName AS lastName""".stripMargin) _),

    "q_ldbc_is7" -> (run(
      """MATCH (m:Post {id: 10000056})<-[:REPLY_OF]-(c:Comment)-[:HAS_CREATOR]->(author:Person)
        |MATCH (m)-[:HAS_CREATOR]->(op:Person)
        |RETURN c.id AS commentId, c.content AS content,
        |       c.creationDate AS creationDate, author.id AS authorId,
        |       author.firstName AS firstName, author.lastName AS lastName,
        |       size([(op)-[:KNOWS]-(author) | 1]) > 0 AS isKnows
        |ORDER BY creationDate DESC, commentId
        |LIMIT 20""".stripMargin) _),

    // ---- complex reads ---------------------------------------------------
    "q_ldbc_ic1" -> (run(
      """MATCH (p:Person {id: $anchorPerson})-[:KNOWS*1..3]-(friend:Person {firstName: 'HOUSEHOLD'})
        |WHERE friend.id <> $anchorPerson
        |RETURN DISTINCT friend.id AS friendId, friend.lastName AS lastName,
        |       friend.birthday AS birthday, friend.creationDate AS creationDate,
        |       friend.gender AS gender, friend.browserUsed AS browserUsed,
        |       friend.locationIP AS locationIP
        |ORDER BY lastName, friendId
        |LIMIT 20""".stripMargin) _),

    "q_ldbc_ic2" -> (run(
      """MATCH (p:Person {id: $anchorPerson})-[:KNOWS]-(friend:Person)<-[:HAS_CREATOR]-(m:Post)
        |WHERE m.creationDate < '1997-01-01'
        |RETURN friend.id AS friendId, friend.firstName AS firstName,
        |       friend.lastName AS lastName, m.id AS postId,
        |       m.content AS content, m.creationDate AS creationDate
        |ORDER BY creationDate DESC, postId
        |LIMIT 20""".stripMargin) _),

    "q_ldbc_ic3" -> (run(Ic3Text) _),
    "q_ldbc_ic3_zipf" -> (runZ(Ic3Text) _),

    "q_ldbc_ic4" -> (run(
      """MATCH (p:Person {id: $anchorPerson})-[:KNOWS]-(friend:Person)<-[:HAS_CREATOR]-(post:Post)-[:HAS_TAG]->(tag:Tag)
        |WHERE post.creationDate >= '1996-01-01' AND post.creationDate < '1998-01-01'
        |RETURN tag.name AS tagName, count(post) AS postCount
        |ORDER BY postCount DESC, tagName
        |LIMIT 10""".stripMargin) _),

    "q_ldbc_ic5" -> (run(Ic5Text) _),
    "q_ldbc_ic5_zipf" -> (runZ(Ic5Text) _),

    "q_ldbc_ic6" -> (run(Ic6Text) _),
    "q_ldbc_ic6_zipf" -> (runZ(Ic6Text) _),

    "q_ldbc_ic7" -> (run(
      """MATCH (p:Person {id: $anchorPerson})<-[:HAS_CREATOR]-(m:Post)<-[:LIKES]-(liker:Person)
        |RETURN liker.id AS likerId, liker.firstName AS firstName,
        |       liker.lastName AS lastName, m.id AS postId,
        |       m.creationDate AS creationDate
        |ORDER BY creationDate DESC, postId, likerId
        |LIMIT 20""".stripMargin) _),

    "q_ldbc_ic8" -> (run(
      """MATCH (p:Person {id: $anchorPerson})<-[:HAS_CREATOR]-(m:Post)<-[:REPLY_OF]-(c:Comment)-[:HAS_CREATOR]->(author:Person)
        |RETURN author.id AS authorId, author.firstName AS firstName,
        |       author.lastName AS lastName, c.creationDate AS creationDate,
        |       c.id AS commentId, c.content AS content
        |ORDER BY creationDate DESC, commentId
        |LIMIT 20""".stripMargin) _),

    "q_ldbc_ic9" -> (run(
      """MATCH (p:Person {id: $anchorPerson})-[:KNOWS*1..2]-(friend:Person)<-[:HAS_CREATOR]-(m:Post)
        |WHERE friend.id <> $anchorPerson AND m.creationDate < '1997-01-01'
        |RETURN DISTINCT friend.id AS friendId, friend.firstName AS firstName,
        |       friend.lastName AS lastName, m.id AS postId,
        |       coalesce(m.content, m.imageFile) AS summary,
        |       m.creationDate AS creationDate
        |ORDER BY creationDate DESC, postId, friendId
        |LIMIT 20""".stripMargin) _),

    "q_ldbc_ic10" -> (run(Ic10Text) _),
    "q_ldbc_ic10_zipf" -> (runZ(Ic10Text) _),

    "q_ldbc_ic11" -> (run(
      """MATCH (p:Person {id: $anchorPerson})-[:KNOWS*1..2]-(friend:Person)-[wa:WORK_AT]->(org:Organisation)
        |WHERE friend.id <> $anchorPerson AND org.name = $ic11Org AND wa.workFrom < $ic11YearLt
        |RETURN DISTINCT friend.id AS friendId, friend.firstName AS firstName,
        |       friend.lastName AS lastName, wa.workFrom AS workFrom,
        |       org.name AS orgName
        |ORDER BY workFrom, friendId
        |LIMIT 10""".stripMargin) _),

    "q_ldbc_ic12" -> (run(
      """MATCH (p:Person {id: $anchorPerson})-[:KNOWS]-(friend:Person)<-[:HAS_CREATOR]-(c:Comment)-[:REPLY_OF]->(post:Post)-[:HAS_TAG]->(tag:Tag)-[:HAS_TYPE]->(tc:TagClass)
        |WHERE tc.name = 'LARGE'
        |RETURN friend.id AS friendId, friend.firstName AS firstName,
        |       friend.lastName AS lastName, count(DISTINCT c) AS replyCount
        |ORDER BY replyCount DESC, friendId
        |LIMIT 10""".stripMargin) _),

    "q_ldbc_ic13" -> (run(
      """MATCH p = shortestPath((p1:Person {id: $anchorPerson})-[:KNOWS*]-(p2:Person {id: $pathTarget}))
        |RETURN length(p) AS pathLength""".stripMargin) _),

    "q_ldbc_ic14" -> (run(
      """MATCH p = allShortestPaths((p1:Person {id: $anchorPerson})-[:KNOWS*]-(p2:Person {id: $pathTarget}))
        |RETURN length(p) AS pathLength, count(*) AS pathCount""".stripMargin) _)
  )

  // ---- DuckDB oracles ------------------------------------------------------

  /** Near-key KNOWS derivation (the k0 CTE body) — shared verbatim by the
    * standard prelude and the zipf twin's (which unions the hub families
    * on top; keep in sync with `SnbLoader.build`). */
  private val K0Near =
    """SELECT a.c_custkey AS s, b.c_custkey AS d FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % 3 <> 0
      | UNION ALL SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 4 WHERE a.c_custkey % 7 < 3
      | UNION ALL SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 13 WHERE a.c_custkey % 11 < 2""".stripMargin

  /** The zipf twin's KNOWS: near-key rules PLUS the deterministic
    * power-law hub families (a, a mod 2^j), even j in [2, 16] — mirrors
    * `SnbLoader.build`'s zipf branch exactly (DISTINCT over the families;
    * near-key and hub pair sets are disjoint by direction). */
  private val K0Zipf = K0Near +
    """
      | UNION ALL SELECT s, d FROM (SELECT DISTINCT a.c_custkey AS s, a.c_custkey % m.m AS d
      |   FROM customer a CROSS JOIN (VALUES (4),(16),(64),(256),(1024),(4096),(16384),(65536)) m(m)
      |   WHERE a.c_custkey >= m.m AND a.c_custkey % m.m IN (SELECT c_custkey FROM customer))""".stripMargin

  /** The SNB derivation, in SQL — line-for-line the rules in
    * `SnbLoader.build`, parameterized by the KNOWS rule. Unused CTEs are
    * pruned by DuckDB's optimizer, so every oracle shares this prefix. */
  private def preWith(k0: String): String =
    s"""person AS (SELECT c_custkey AS id, c_mktsegment AS firstName, c_name AS lastName,
      |   CASE WHEN c_custkey % 2 = 0 THEN 'male' ELSE 'female' END AS gender,
      |   c_custkey % 365 AS birthday, CAST(c_custkey % 1000 AS VARCHAR) AS creationDate,
      |   CAST(c_custkey % 256 AS VARCHAR) || '.' || CAST(c_nationkey AS VARCHAR) AS locationIP,
      |   CASE WHEN c_custkey % 3 = 0 THEN 'Firefox' WHEN c_custkey % 3 = 1 THEN 'Chrome' ELSE 'Safari' END AS browserUsed
      | FROM customer),
      |k0 AS ($k0),
      |ku AS (SELECT s, d FROM k0 UNION ALL SELECT d, s FROM k0),""".stripMargin + "\n" +
    """post AS (SELECT 10000000 + o_orderkey AS id, o_custkey AS creator,
      |   CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS content,
      |   CASE WHEN o_orderkey % 5 = 0 THEN o_orderpriority || '.jpg' ELSE NULL END AS imageFile,
      |   strftime(o_orderdate, '%Y-%m-%d') AS creationDate,
      |   1100000000 + (o_orderkey % (SELECT count(*) FROM supplier)) AS forum,
      |   1300000000 + c_nationkey AS country
      | FROM orders JOIN customer ON c_custkey = o_custkey),
      |cmt0 AS (SELECT 100000000 + l_orderkey*8 + l_linenumber AS id, l_orderkey AS ok,
      |   min(l_partkey) AS pk, min(l_suppkey) AS sk,
      |   strftime(min(l_shipdate), '%Y-%m-%d') AS creationDate,
      |   min(l_returnflag) || '/' || min(l_linestatus) AS content
      | FROM lineitem GROUP BY 1, 2),
      |cmt AS (SELECT id, ok, creationDate, content,
      |   (pk*31 + sk) % (SELECT count(*) FROM customer) AS creator FROM cmt0),
      |likes AS (SELECT (creator + 1) % (SELECT count(*) FROM customer) AS pid, id AS mid FROM post
      | UNION ALL SELECT (creator + 17) % (SELECT count(*) FROM customer), id FROM post),
      |member AS (SELECT DISTINCT forum AS fid, creator AS pid FROM post),
      |forum AS (SELECT 1100000000 + s_suppkey AS id, s_name AS title,
      |   (SELECT min(c_custkey) FROM customer WHERE c_nationkey = s_nationkey) AS moderator FROM supplier),
      |ptag AS (SELECT DISTINCT 10000000 + l_orderkey AS mid, 1000000000 + l_partkey AS tid FROM lineitem),
      |interest AS (SELECT DISTINCT o_custkey AS pid, 1000000000 + l_partkey AS tid FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |tag AS (SELECT 1000000000 + p_partkey AS id, p_name AS name, p_type FROM part),
      |hastype AS (SELECT t.id AS tid, tc.name AS tcname FROM tag t JOIN
      |   (SELECT 1200000000 + min(p_partkey) AS id, p_type AS name FROM part GROUP BY p_type) tc ON tc.name = t.p_type),
      |workat AS (SELECT c_custkey AS pid, 1500000000 + (c_custkey % (SELECT count(*) FROM supplier)) AS oid,
      |   1990 + c_custkey % 25 AS workFrom FROM customer),
      |org AS (SELECT 1500000000 + s_suppkey AS id, s_name AS name FROM supplier),
      |country AS (SELECT 1300000000 + n_nationkey AS id, n_name AS name FROM nation),
      |adeg AS (SELECT s, count(*) AS deg FROM ku WHERE s IN (SELECT DISTINCT creator FROM post) GROUP BY s),
      |anchor AS (SELECT min(s) AS pid FROM adeg WHERE deg =
      |   (SELECT deg FROM adeg ORDER BY deg LIMIT 1 OFFSET (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) - 1 FROM adeg))),
      |tdeg AS (SELECT tid, count(*) AS deg FROM ptag GROUP BY tid),
      |atag AS (SELECT name FROM tag WHERE id = (SELECT min(tid) FROM tdeg WHERE deg =
      |   (SELECT deg FROM tdeg ORDER BY deg LIMIT 1 OFFSET (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) - 1 FROM tdeg)))),
      |r1 AS (SELECT DISTINCT d AS id FROM ku WHERE s = (SELECT pid FROM anchor)),
      |r2 AS (SELECT DISTINCT ku.d AS id FROM ku JOIN r1 ON ku.s = r1.id),
      |r3 AS (SELECT DISTINCT ku.d AS id FROM ku JOIN r2 ON ku.s = r2.id),
      |reach2 AS (SELECT id FROM r1 UNION SELECT id FROM r2),
      |reach3 AS (SELECT id FROM reach2 UNION SELECT id FROM r3),
      |fr2 AS (SELECT id FROM reach2 WHERE id <> (SELECT pid FROM anchor)),
      |fpost AS (SELECT m.id, m.country, m.creationDate FROM post m JOIN fr2 ON m.creator = fr2.id),
      |ic3nat AS (SELECT c.name FROM fpost f JOIN country c ON c.id = f.country GROUP BY c.name ORDER BY count(*) DESC, c.name LIMIT 2),
      |ic3yr AS (SELECT CAST(substr(f.creationDate, 1, 4) AS INTEGER) AS y FROM fpost f JOIN country c ON c.id = f.country
      |   WHERE c.name IN (SELECT name FROM ic3nat) GROUP BY 1 ORDER BY count(*) DESC, y LIMIT 1),
      |fwork AS (SELECT w.oid, w.workFrom FROM workat w JOIN fr2 ON w.pid = fr2.id),
      |ic11org AS (SELECT oid FROM fwork GROUP BY oid ORDER BY count(*) DESC, oid LIMIT 1),
      |ic11wf AS (SELECT workFrom + 1 AS yearLt FROM fwork WHERE oid = (SELECT oid FROM ic11org) ORDER BY workFrom
      |   LIMIT 1 OFFSET (SELECT CAST(ceil(0.5 * count(*)) AS BIGINT) - 1 FROM fwork WHERE oid = (SELECT oid FROM ic11org)))""".stripMargin

  private[queries] val Pre = preWith(K0Near)
  private[queries] val PreZipf = preWith(K0Zipf)

  private[queries] def o(sql: String): String = s"WITH $Pre $sql"
  private[queries] def oZ(sql: String): String = s"WITH $PreZipf $sql"

  /** Oracles needing the recursive BFS walk (IC13/IC14): DuckDB requires the
    * RECURSIVE keyword on the whole WITH chain. Min-length walks are exactly
    * the shortest paths (any revisit lengthens a walk), and UNION ALL keeps
    * one row per distinct edge sequence. */
  private[queries] def oRec(sql: String): String =
    s"""WITH RECURSIVE $Pre,
       |ptarget AS (SELECT coalesce(max(id), (SELECT pid FROM anchor)) AS tid FROM r3
       |   WHERE id NOT IN (SELECT id FROM reach2) AND id <> (SELECT pid FROM anchor)),
       |walk(node, depth) AS (SELECT (SELECT pid FROM anchor), 0 UNION ALL
       | SELECT ku.d, depth + 1 FROM walk JOIN ku ON ku.s = walk.node
       | WHERE depth < 6 AND walk.node <> (SELECT tid FROM ptarget))
       |$sql""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ldbc_is1" -> o(
      "SELECT firstName, lastName, birthday, locationIP, browserUsed, gender, creationDate FROM person WHERE id = (SELECT pid FROM anchor)"),
    "q_ldbc_is2" -> o(
      "SELECT id AS postId, content, creationDate FROM post WHERE creator = (SELECT pid FROM anchor) ORDER BY creationDate DESC, postId DESC LIMIT 10"),
    "q_ldbc_is3" -> o(
      """SELECT r1.id AS friendId, p.firstName AS firstName, p.lastName AS lastName
        |FROM r1 JOIN person p ON p.id = r1.id ORDER BY firstName, lastName, friendId""".stripMargin),
    "q_ldbc_is4" -> o(
      "SELECT creationDate, coalesce(content, imageFile) AS summary FROM post WHERE id = 10000056"),
    "q_ldbc_is5" -> o(
      """SELECT m.creator AS personId, p.firstName AS firstName, p.lastName AS lastName
        |FROM post m JOIN person p ON p.id = m.creator WHERE m.id = 10000056""".stripMargin),
    "q_ldbc_is6" -> o(
      """SELECT f.id AS forumId, f.title AS forumTitle, f.moderator AS moderatorId,
        | p.firstName AS firstName, p.lastName AS lastName
        |FROM post m JOIN forum f ON f.id = m.forum JOIN person p ON p.id = f.moderator
        |WHERE m.id = 10000056""".stripMargin),
    "q_ldbc_is7" -> o(
      """SELECT c.id AS commentId, c.content AS content, c.creationDate AS creationDate,
        | c.creator AS authorId, p.firstName AS firstName, p.lastName AS lastName,
        | EXISTS (SELECT 1 FROM ku WHERE ku.s = m.creator AND ku.d = c.creator) AS isKnows
        |FROM cmt c JOIN post m ON m.id = c.ok + 10000000 JOIN person p ON p.id = c.creator
        |WHERE m.id = 10000056 ORDER BY creationDate DESC, commentId LIMIT 20""".stripMargin),

    "q_ldbc_ic1" -> o(
      """SELECT DISTINCT r.id AS friendId, p.lastName AS lastName, p.birthday AS birthday,
        | p.creationDate AS creationDate, p.gender AS gender, p.browserUsed AS browserUsed,
        | p.locationIP AS locationIP
        |FROM reach3 r JOIN person p ON p.id = r.id
        |WHERE r.id <> (SELECT pid FROM anchor) AND p.firstName = 'HOUSEHOLD'
        |ORDER BY lastName, friendId LIMIT 20""".stripMargin),
    "q_ldbc_ic2" -> o(
      """SELECT r1.id AS friendId, p.firstName AS firstName, p.lastName AS lastName,
        | m.id AS postId, m.content AS content, m.creationDate AS creationDate
        |FROM r1 JOIN person p ON p.id = r1.id JOIN post m ON m.creator = r1.id
        |WHERE m.creationDate < '1997-01-01'
        |ORDER BY creationDate DESC, postId LIMIT 20""".stripMargin),
    "q_ldbc_ic3" -> o(
      """SELECT r.id AS friendId, p.firstName AS firstName, p.lastName AS lastName,
        | count(*) AS msgCount
        |FROM reach2 r JOIN person p ON p.id = r.id JOIN post m ON m.creator = r.id
        | JOIN country c ON c.id = m.country
        |WHERE r.id <> (SELECT pid FROM anchor)
        | AND m.creationDate >= CAST((SELECT y FROM ic3yr) AS VARCHAR) || '-01-01'
        | AND m.creationDate < CAST((SELECT y FROM ic3yr) + 1 AS VARCHAR) || '-01-01'
        | AND c.name IN (SELECT name FROM ic3nat)
        |GROUP BY 1, 2, 3 ORDER BY msgCount DESC, friendId LIMIT 20""".stripMargin),
    "q_ldbc_ic3_zipf" -> oZ(
      """SELECT r.id AS friendId, p.firstName AS firstName, p.lastName AS lastName,
        | count(*) AS msgCount
        |FROM reach2 r JOIN person p ON p.id = r.id JOIN post m ON m.creator = r.id
        | JOIN country c ON c.id = m.country
        |WHERE r.id <> (SELECT pid FROM anchor)
        | AND m.creationDate >= CAST((SELECT y FROM ic3yr) AS VARCHAR) || '-01-01'
        | AND m.creationDate < CAST((SELECT y FROM ic3yr) + 1 AS VARCHAR) || '-01-01'
        | AND c.name IN (SELECT name FROM ic3nat)
        |GROUP BY 1, 2, 3 ORDER BY msgCount DESC, friendId LIMIT 20""".stripMargin),
    "q_ldbc_ic4" -> o(
      """SELECT t.name AS tagName, count(*) AS postCount
        |FROM r1 JOIN post m ON m.creator = r1.id JOIN ptag pt ON pt.mid = m.id
        | JOIN tag t ON t.id = pt.tid
        |WHERE m.creationDate >= '1996-01-01' AND m.creationDate < '1998-01-01'
        |GROUP BY 1 ORDER BY postCount DESC, tagName LIMIT 10""".stripMargin),
    "q_ldbc_ic5" -> o(
      """SELECT f.id AS forumId, f.title AS forumTitle, count(*) AS memberCount
        |FROM reach2 r JOIN member mb ON mb.pid = r.id JOIN forum f ON f.id = mb.fid
        |WHERE r.id <> (SELECT pid FROM anchor)
        |GROUP BY 1, 2 ORDER BY memberCount DESC, forumId LIMIT 20""".stripMargin),
    "q_ldbc_ic5_zipf" -> oZ(
      """SELECT f.id AS forumId, f.title AS forumTitle, count(*) AS memberCount
        |FROM reach2 r JOIN member mb ON mb.pid = r.id JOIN forum f ON f.id = mb.fid
        |WHERE r.id <> (SELECT pid FROM anchor)
        |GROUP BY 1, 2 ORDER BY memberCount DESC, forumId LIMIT 20""".stripMargin),
    "q_ldbc_ic6" -> o(
      """SELECT t2.name AS tagName, count(*) AS postCount
        |FROM (SELECT DISTINCT m.id FROM reach2 r JOIN post m ON m.creator = r.id
        |   JOIN ptag pt ON pt.mid = m.id JOIN tag t ON t.id = pt.tid
        |   WHERE r.id <> (SELECT pid FROM anchor) AND t.name = (SELECT name FROM atag)) g
        | JOIN ptag pt2 ON pt2.mid = g.id JOIN tag t2 ON t2.id = pt2.tid
        |WHERE t2.name <> (SELECT name FROM atag)
        |GROUP BY 1 ORDER BY postCount DESC, tagName LIMIT 10""".stripMargin),
    "q_ldbc_ic6_zipf" -> oZ(
      """SELECT t2.name AS tagName, count(*) AS postCount
        |FROM (SELECT DISTINCT m.id FROM reach2 r JOIN post m ON m.creator = r.id
        |   JOIN ptag pt ON pt.mid = m.id JOIN tag t ON t.id = pt.tid
        |   WHERE r.id <> (SELECT pid FROM anchor) AND t.name = (SELECT name FROM atag)) g
        | JOIN ptag pt2 ON pt2.mid = g.id JOIN tag t2 ON t2.id = pt2.tid
        |WHERE t2.name <> (SELECT name FROM atag)
        |GROUP BY 1 ORDER BY postCount DESC, tagName LIMIT 10""".stripMargin),
    "q_ldbc_ic7" -> o(
      """SELECT l.pid AS likerId, p.firstName AS firstName, p.lastName AS lastName,
        | m.id AS postId, m.creationDate AS creationDate
        |FROM post m JOIN likes l ON l.mid = m.id JOIN person p ON p.id = l.pid
        |WHERE m.creator = (SELECT pid FROM anchor)
        |ORDER BY creationDate DESC, postId, likerId LIMIT 20""".stripMargin),
    "q_ldbc_ic8" -> o(
      """SELECT c.creator AS authorId, p.firstName AS firstName, p.lastName AS lastName,
        | c.creationDate AS creationDate, c.id AS commentId, c.content AS content
        |FROM post m JOIN cmt c ON c.ok + 10000000 = m.id JOIN person p ON p.id = c.creator
        |WHERE m.creator = (SELECT pid FROM anchor)
        |ORDER BY creationDate DESC, commentId LIMIT 20""".stripMargin),
    "q_ldbc_ic9" -> o(
      """SELECT DISTINCT r.id AS friendId, p.firstName AS firstName, p.lastName AS lastName,
        | m.id AS postId, coalesce(m.content, m.imageFile) AS summary,
        | m.creationDate AS creationDate
        |FROM reach2 r JOIN person p ON p.id = r.id JOIN post m ON m.creator = r.id
        |WHERE r.id <> (SELECT pid FROM anchor) AND m.creationDate < '1997-01-01'
        |ORDER BY creationDate DESC, postId, friendId LIMIT 20""".stripMargin),
    "q_ldbc_ic10" -> o(
      """SELECT s.id AS strangerId, p.firstName AS firstName, p.lastName AS lastName,
        | count(*) AS commonInterests
        |FROM (SELECT DISTINCT k2.d AS id FROM ku k1 JOIN ku k2 ON k2.s = k1.d
        |   WHERE k1.s = (SELECT pid FROM anchor) AND k2.d <> (SELECT pid FROM anchor)
        |    AND NOT EXISTS (SELECT 1 FROM ku WHERE ku.s = (SELECT pid FROM anchor) AND ku.d = k2.d)) s
        | JOIN person p ON p.id = s.id JOIN interest i ON i.pid = s.id
        |GROUP BY 1, 2, 3 ORDER BY commonInterests DESC, strangerId LIMIT 10""".stripMargin),
    "q_ldbc_ic10_zipf" -> oZ(
      """SELECT s.id AS strangerId, p.firstName AS firstName, p.lastName AS lastName,
        | count(*) AS commonInterests
        |FROM (SELECT DISTINCT k2.d AS id FROM ku k1 JOIN ku k2 ON k2.s = k1.d
        |   WHERE k1.s = (SELECT pid FROM anchor) AND k2.d <> (SELECT pid FROM anchor)
        |    AND NOT EXISTS (SELECT 1 FROM ku WHERE ku.s = (SELECT pid FROM anchor) AND ku.d = k2.d)) s
        | JOIN person p ON p.id = s.id JOIN interest i ON i.pid = s.id
        |GROUP BY 1, 2, 3 ORDER BY commonInterests DESC, strangerId LIMIT 10""".stripMargin),
    "q_ldbc_ic11" -> o(
      """SELECT DISTINCT r.id AS friendId, p.firstName AS firstName, p.lastName AS lastName,
        | w.workFrom AS workFrom, o.name AS orgName
        |FROM reach2 r JOIN person p ON p.id = r.id JOIN workat w ON w.pid = r.id
        | JOIN org o ON o.id = w.oid
        |WHERE r.id <> (SELECT pid FROM anchor)
        | AND o.name = (SELECT name FROM org WHERE id = (SELECT oid FROM ic11org))
        | AND w.workFrom < (SELECT yearLt FROM ic11wf)
        |ORDER BY workFrom, friendId LIMIT 10""".stripMargin),
    "q_ldbc_ic12" -> o(
      """SELECT r1.id AS friendId, p.firstName AS firstName, p.lastName AS lastName,
        | count(DISTINCT c.id) AS replyCount
        |FROM r1 JOIN person p ON p.id = r1.id JOIN cmt c ON c.creator = r1.id
        | JOIN ptag pt ON pt.mid = c.ok + 10000000
        | JOIN hastype ht ON ht.tid = pt.tid
        |WHERE ht.tcname = 'LARGE'
        |GROUP BY 1, 2, 3 ORDER BY replyCount DESC, friendId LIMIT 10""".stripMargin),
    "q_ldbc_ic13" -> oRec(
      "SELECT CAST(min(depth) AS BIGINT) AS pathLength FROM walk WHERE node = (SELECT tid FROM ptarget)"),
    "q_ldbc_ic14" -> oRec(
      """SELECT CAST(depth AS BIGINT) AS pathLength, count(*) AS pathCount
        |FROM walk WHERE node = (SELECT tid FROM ptarget) GROUP BY depth
        |HAVING depth = (SELECT min(depth) FROM walk WHERE node = (SELECT tid FROM ptarget))""".stripMargin)
  )
}
