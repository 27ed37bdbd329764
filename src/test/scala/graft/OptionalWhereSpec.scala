package graft

import graft.cypher.QueryEngine
import graft.model.PropertyGraph

/** OPTIONAL MATCH ... WHERE filters the PATTERN (pre-join): rows without a
  * qualifying match keep the outer row with NULLs, never get dropped. */
class OptionalWhereSpec extends SparkSpec {
  import spark.implicits._
  private lazy val g = PropertyGraph(
    Seq((1L, Seq("P"), "A", 30L), (2L, Seq("P"), "B", 25L), (3L, Seq("P"), "C", 35L))
      .toDF("id", "labels", "name", "age"),
    Seq((10L, 1L, 2L, "E"), (11L, 1L, 3L, "E")).toDF("id", "src", "dst", "relationship"))

  test("OPTIONAL MATCH WHERE keeps non-matching outer rows with nulls") {
    val r = QueryEngine.execute(
      "MATCH (a:P) OPTIONAL MATCH (a)-[:E]->(b) WHERE b.age > 30 " +
        "RETURN a.name AS an, b.name AS bn ORDER BY an", g)
      .as[(String, Option[String])].collect().toSeq
    // A has edges to B(25) and C(35); only C passes WHERE. B and C have no
    // out-edges -> null bn, rows kept.
    assert(r == Seq(("A", Some("C")), ("B", None), ("C", None)))
  }
}
