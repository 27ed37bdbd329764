package graft
import graft.model.PropertyGraph
import graft.rdf.{Rdf, Sparql}
class PPDebug extends SparkSpec {
  import spark.implicits._
  test("debug pp") {
    val base = "http://ex.org/"
    val g = PropertyGraph(
      Seq((1L, Seq("P"), "alice", 10.0), (2L, Seq("P"), "bob", 20.0),
        (3L, Seq("P"), "carol", 30.0), (4L, Seq("Q"), "dave", 40.0))
        .toDF("id", "labels", "name", "balance"),
      Seq((10L, 1L, 2L, "KNOWS"), (11L, 2L, 3L, "KNOWS"), (12L, 1L, 4L, "LIKES"))
        .toDF("id", "src", "dst", "relationship"))
    val triples = Rdf.exportTriples(g, base).localCheckpoint(true)
    val pfx = s"PREFIX gl: <${base}label/>\nPREFIX gp: <${base}prop/>\nPREFIX gr: <${base}rel/>\n"
    Sparql.execute(pfx + "SELECT ?n WHERE { ?a gr:KNOWS/gp:name ?n } ORDER BY ?n", triples).show(10, false)
  }
}
