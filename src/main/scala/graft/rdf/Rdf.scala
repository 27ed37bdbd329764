package graft.rdf

import graft.model.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PG ↔ RDF mapping (reference `src/rdf/`: triple model `types.rs`,
  * N-Triples serialization `serialization/ntriples.rs`, mapper surface
  * `mapping.rs:89-133` — the reference's map_node/map_edge/map_to_graph are
  * declared TODO stubs; this implements the standard "direct mapping" their
  * doc comments describe: node → IRI + one `rdf:type` triple per label + one
  * typed-literal triple per non-null property; edge → a direct predicate
  * triple plus an RDF reification quad carrying the edge id, so edge
  * identity and properties survive the roundtrip).
  *
  * Spark-first: export and import are pure DataFrame transforms (explode /
  * union / pivot / join) over (s, p, o) string columns already in N-Triples
  * term syntax. Serialization is one `concat` away from a text sink; parsing
  * is three `regexp_extract`s. Every stage is partition-parallel — nothing
  * funnels through the driver except the schema-bounded property-key list.
  *
  * IRI layout under a caller-supplied `base` (must end in `/`):
  * `<base>node/<id>`, `<base>edge/<id>`, `<base>label/<L>`,
  * `<base>rel/<TYPE>`, `<base>prop/<key>`.
  */
object Rdf {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XsdNs = "http://www.w3.org/2001/XMLSchema#"

  /** N-Triples string escape: \ " LF CR TAB. */
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")

  /** Inverse of [[esc]] — a sentinel keeps `\\n` (escaped backslash + n)
    * distinct from `\n` (escaped newline) in one pass chain. */
  private def unesc(c: Column): Column = {
    val sentinel = "\u0001"
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\\\\\", sentinel), "\\\\\"", "\""), "\\\\n", "\n"), "\\\\r", "\r"),
      "\\\\t", "\t"), sentinel, "\\\\")
  }

  private def iri(prefix: String, c: Column): Column =
    concat(lit("<" + prefix), c, lit(">"))

  /** XSD datatype for a Spark column type; None = not exportable (arrays,
    * structs, binaries — the multimodal columns stay in parquet). */
  private def xsdOf(dt: DataType): Option[String] = dt match {
    case LongType | IntegerType | ShortType | ByteType => Some(XsdNs + "long")
    case DoubleType | FloatType | _: DecimalType => Some(XsdNs + "double")
    case BooleanType => Some(XsdNs + "boolean")
    case DateType => Some(XsdNs + "date")
    case TimestampType => Some(XsdNs + "dateTime")
    case StringType => Some(XsdNs + "string")
    case _ => None
  }

  /** PG → triples: (s, p, o) columns in N-Triples term syntax. */
  def exportTriples(g: PropertyGraph, base: String): DataFrame = {
    require(base.endsWith("/"), "base IRI must end with '/'")
    val nodeIri = iri(base + "node/", col("id").cast("string"))
    def literal(value: Column, xsd: String): Column =
      concat(lit("\""), esc(value.cast("string")), lit("\"^^<" + xsd + ">"))
    def propTriples(df: DataFrame, subj: Column, skip: Set[String]) =
      df.schema.fields
        .filter(f => !skip.contains(f.name))
        .flatMap(f => xsdOf(f.dataType).map(x => (f.name, x)))
        .map { case (k, x) =>
          df.filter(col(k).isNotNull).select(subj.as("s"),
            lit("<" + base + "prop/" + k + ">").as("p"), literal(col(k), x).as("o"))
        }

    val labelT = g.nodes.select(nodeIri.as("s"), explode(col("labels")).as("_l"))
      .select(col("s"), lit("<" + RdfNs + "type>").as("p"),
        iri(base + "label/", col("_l")).as("o"))
    val nodePropT = propTriples(g.nodes, nodeIri, Set("id", "labels"))

    val srcIri = iri(base + "node/", col("src").cast("string"))
    val dstIri = iri(base + "node/", col("dst").cast("string"))
    val edgeIri = iri(base + "edge/", col("id").cast("string"))
    val relIri = iri(base + "rel/", col("relationship"))
    val directT = g.edges.select(srcIri.as("s"), relIri.as("p"), dstIri.as("o"))
    val reifT = Seq(
      ("type", lit("<" + RdfNs + "Statement>")),
      ("subject", srcIri), ("predicate", relIri), ("object", dstIri))
      .map { case (pred, o) =>
        g.edges.select(edgeIri.as("s"), lit("<" + RdfNs + pred + ">").as("p"), o.as("o"))
      }
    val edgePropT = propTriples(g.edges, edgeIri, Set("id", "src", "dst", "relationship"))

    (Seq(labelT) ++ nodePropT ++ Seq(directT) ++ reifT ++ edgePropT).reduce(_ unionAll _)
  }

  /** Triples → N-Triples text lines (`s p o .`). */
  def toNTriples(triples: DataFrame): Dataset[String] = {
    import triples.sparkSession.implicits._
    triples.select(concat(col("s"), lit(" "), col("p"), lit(" "), col("o"), lit(" ."))
      .as("line")).as[String]
  }

  /** N-Triples text lines → (s, p, o) term columns. Subjects and predicates
    * are IRIs (no whitespace); the object is everything up to the final dot. */
  def parseNTriples(lines: Dataset[String]): DataFrame = {
    val re = "^(\\S+)\\s+(\\S+)\\s+(.+?)\\s*\\.\\s*$"
    lines.toDF("line").filter(length(trim(col("line"))) > 0)
      .select(
        regexp_extract(col("line"), re, 1).as("s"),
        regexp_extract(col("line"), re, 2).as("p"),
        regexp_extract(col("line"), re, 3).as("o"))
  }

  /** Triples → PG, inverting [[exportTriples]]: labels from `rdf:type`,
    * properties by pivot over the (schema-bounded) key set with XSD-driven
    * casts, edges from the reification quads (direct triples carry no edge
    * id, so they are validation-only here). */
  def importGraph(triples: DataFrame, base: String): PropertyGraph = {
    require(base.endsWith("/"), "base IRI must end with '/'")
    val nodeS = col("s").startsWith("<" + base + "node/")
    val edgeS = col("s").startsWith("<" + base + "edge/")
    val sId = regexp_extract(col("s"), "/(-?\\d+)>$", 1).cast("long")
    val typeP = "<" + RdfNs + "type>"
    val litVal = unesc(regexp_extract(col("o"), "^\"(.*)\"\\^\\^<[^>]*>$", 1))
    val litDt = regexp_extract(col("o"), "\\^\\^<([^>]*)>$", 1)
    val propKey = regexp_extract(col("p"), "prop/([^/>]+)>$", 1)
    def castBy(dtIri: String, c: Column): Column = dtIri.stripPrefix(XsdNs) match {
      case "long" | "integer" | "int" => c.cast("long")
      case "double" | "decimal" | "float" => c.cast("double")
      case "boolean" => c.cast("boolean")
      case "date" => c.cast("date")
      case "dateTime" => c.cast("timestamp")
      case _ => c
    }
    // distinct (subject-class, key, datatype) in ONE job — a collect of the
    // SCHEMA, never the data
    val allKeyTypes = triples.filter(col("p").startsWith("<" + base + "prop/"))
      .select(when(nodeS, "n").when(edgeS, "e").as("_c"), propKey.as("_k"), litDt.as("_dt"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

    /** Pivot prop triples of one subject class to (id, key...) columns. */
    def pivotProps(cls: String, subjFilter: Column): Option[DataFrame] = {
      val keyTypes = allKeyTypes.collect { case (`cls`, k, dt) => (k, dt) }.sortBy(_._1)
      if (keyTypes.isEmpty) None
      else {
        val props = triples.filter(subjFilter && col("p").startsWith("<" + base + "prop/"))
          .select(sId.as("id"), propKey.as("_k"), litVal.as("_v"))
        var df = props.groupBy(col("id")).pivot("_k", keyTypes.map(_._1)).agg(first(col("_v")))
        keyTypes.foreach { case (k, dt) => df = df.withColumn(k, castBy(dt, col(k))) }
        Some(df)
      }
    }

    val labels = triples.filter(nodeS && col("p") === typeP)
      .select(sId.as("id"), regexp_extract(col("o"), "label/([^/>]+)>$", 1).as("_l"))
      .groupBy(col("id")).agg(sort_array(collect_list(col("_l"))).as("labels"))
    val nodes = pivotProps("n", nodeS) match {
      case Some(p) => labels.join(p, Seq("id"), "full")
        .withColumn("labels", coalesce(col("labels"), array()))
      case None => labels
    }

    def reifPart(pred: String, oCol: Column, as: String): DataFrame =
      triples.filter(edgeS && col("p") === s"<$RdfNs$pred>")
        .select(sId.as("id"), oCol.as(as))
    val core = reifPart("subject", regexp_extract(col("o"), "/(-?\\d+)>$", 1).cast("long"), "src")
      .join(reifPart("object", regexp_extract(col("o"), "/(-?\\d+)>$", 1).cast("long"), "dst"), Seq("id"))
      .join(reifPart("predicate", regexp_extract(col("o"), "rel/([^/>]+)>$", 1), "relationship"), Seq("id"))
    val edges = pivotProps("e", edgeS) match {
      case Some(p) => core.join(p, Seq("id"), "left")
      case None => core
    }
    PropertyGraph(nodes, edges)
  }
}
