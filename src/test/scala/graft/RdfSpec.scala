package graft

import graft.model.PropertyGraph
import graft.rdf.Rdf
import org.apache.spark.sql.functions._

/** PG ↔ RDF mapping (reference src/rdf/mapping.rs direct-mapping contract,
  * N-Triples lexical form per serialization/ntriples.rs). */
class RdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = {
    val nodes = Seq(
      (1L, Seq("Person", "Engineer"), "Ali\"ce\nO\\Brien\there", java.lang.Long.valueOf(30L)),
      (2L, Seq("Person"), "Bob", java.lang.Long.valueOf(25L)),
      (3L, Seq("Company"), null.asInstanceOf[String], java.lang.Long.valueOf(1990L)))
      .toDF("id", "labels", "name", "age")
    val edges = Seq(
      (10L, 1L, 2L, "KNOWS", java.lang.Double.valueOf(2.5)),
      (11L, 2L, 3L, "WORKS_AT", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "src", "dst", "relationship", "weight")
    PropertyGraph(nodes, edges)
  }

  test("export emits typed triples with one line per triple") {
    val triples = Rdf.exportTriples(g, "http://ex.org/")
    // 4 label + 2 name (one NULL skipped) + 3 age + 2 direct + 8 reified
    // + 1 weight (one NULL skipped) = 20
    assert(triples.count() == 20L)
    val lines = Rdf.toNTriples(triples)
    assert(lines.count() == 20L) // escaped newline must NOT split a line
    assert(lines.collect().forall(_.endsWith(" .")))
    // typed literal shape
    val age = triples.filter(col("p") === "<http://ex.org/prop/age>")
      .select("o").as[String].collect()
    assert(age.toSet ==
      Set(30L, 25L, 1990L).map(v => "\"" + v + "\"^^<http://www.w3.org/2001/XMLSchema#long>"))
  }

  test("roundtrip of a graph with no edges and no non-null props") {
    val nodes = Seq((7L, Seq("Lonely"), null.asInstanceOf[String], null.asInstanceOf[java.lang.Long]))
      .toDF("id", "labels", "name", "age")
    val edges = Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "relationship")
    val g2 = PropertyGraph(nodes, edges)
    val back = Rdf.importGraph(Rdf.parseNTriples(Rdf.toNTriples(Rdf.exportTriples(g2, "http://ex.org/"))), "http://ex.org/")
    assert(back.nodes.select("id").as[Long].collect().toSeq == Seq(7L))
    assert(back.nodes.select("labels").as[Seq[String]].head() == Seq("Lonely"))
    assert(back.edges.count() == 0L)
  }

  test("roundtrip preserves ids, labels, typed props, edges, nasty strings") {
    val base = "http://ex.org/"
    val back = Rdf.importGraph(Rdf.parseNTriples(Rdf.toNTriples(Rdf.exportTriples(g, base))), base)
    val aN = g.nodes.select(col("id"), sort_array(col("labels")).as("labels"), col("name"), col("age"))
    val bN = back.nodes.select(col("id"), col("labels"), col("name"), col("age"))
    assert(aN.exceptAll(bN).isEmpty && bN.exceptAll(aN).isEmpty)
    val weird = back.nodes.filter(col("id") === 1L).select("name").as[String].head()
    assert(weird == "Ali\"ce\nO\\Brien\there")
    val aE = g.edges.select(col("id"), col("src"), col("dst"), col("relationship"), col("weight"))
    val bE = back.edges.select(col("id"), col("src"), col("dst"), col("relationship"), col("weight"))
    assert(aE.exceptAll(bE).isEmpty && bE.exceptAll(aE).isEmpty)
  }
}
