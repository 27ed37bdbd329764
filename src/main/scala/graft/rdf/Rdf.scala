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

  /** N-Triples string escape: \ " LF CR TAB. Literal `replace` (plain
    * substring scan, codegen'd) instead of `regexp_replace` — the patterns
    * are all literal, and five regex-engine passes per exported literal
    * were the serialize hot path. */
  private def esc(c: Column): Column =
    replace(replace(replace(replace(replace(
      c, lit("\\"), lit("\\\\")), lit("\""), lit("\\\"")),
      lit("\n"), lit("\\n")), lit("\r"), lit("\\r")), lit("\t"), lit("\\t"))

  /** Inverse of [[esc]] — a sentinel keeps `\\n` (escaped backslash + n)
    * distinct from `\n` (escaped newline) in one pass chain. */
  private def unesc(c: Column): Column = {
    val sentinel = "\u0001"
    replace(replace(replace(replace(replace(replace(
      c, lit("\\\\"), lit(sentinel)), lit("\\\""), lit("\"")),
      lit("\\n"), lit("\n")), lit("\\r"), lit("\r")),
      lit("\\t"), lit("\t")), lit(sentinel), lit("\\"))
  }

  /** [[unesc]] for sibling modules (SPARQL lexical-value extraction). */
  private[rdf] def unescape(c: Column): Column = unesc(c)

  /** [[esc]] for sibling modules (SPARQL BIND literal construction). */
  private[rdf] def escape(c: Column): Column = esc(c)

  private def iri(prefix: String, c: Column): Column =
    concat(lit("<" + prefix), c, lit(">"))

  /** IRI path-segment percent-encoding for label/type/key names: a name with
    * a space, '>', or non-ASCII would otherwise emit an invalid N-Triples
    * IRI that the whitespace-based term regex splits mid-term. `url_encode`
    * is form-encoding (space → '+'), so '+' is patched to %20; the inverse
    * is plain `url_decode`, which accepts %20. */
  private def encSeg(c: Column): Column = regexp_replace(url_encode(c), "\\+", "%20")
  private def decSeg(c: Column): Column = url_decode(c)
  /** Scala-side twin of [[encSeg]] for schema-derived (driver-side) names. */
  private def encSeg(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

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
    // One (s, p, o) struct per candidate triple, exploded from a per-row
    // array — the WHOLE export is two scan branches (nodes, edges), not a
    // union branch per property. The per-branch union form re-analyzed the
    // full source subtree once per property (the q_rdf_roundtrip fixed
    // planning cost) and re-scanned the table as many times at execution.
    // NULL properties surface as NULL `o` structs filtered after explode.
    def tri(s: Column, p: Column, o: Column): Column =
      struct(s.as("s"), p.as("p"), o.as("o"))
    def propTris(df: DataFrame, subj: Column, skip: Set[String]): Seq[Column] =
      df.schema.fields
        .filter(f => !skip.contains(f.name))
        .flatMap(f => xsdOf(f.dataType).map(x => (f.name, x)))
        .map { case (k, x) =>
          tri(subj, lit("<" + base + "prop/" + encSeg(k) + ">"), literal(col(k), x))
        }.toSeq

    val labelTris = transform(col("labels"), l =>
      tri(nodeIri, lit("<" + RdfNs + "type>"), iri(base + "label/", encSeg(l))))
    val nodeProps = propTris(g.nodes, nodeIri, Set("id", "labels"))
    val nodeArr =
      if (nodeProps.isEmpty) labelTris
      else concat(labelTris, array(nodeProps: _*))
    val nodeT = g.nodes.select(explode(nodeArr).as("_t"))
      .select(col("_t.s").as("s"), col("_t.p").as("p"), col("_t.o").as("o"))
      .filter(col("o").isNotNull)

    val srcIri = iri(base + "node/", col("src").cast("string"))
    val dstIri = iri(base + "node/", col("dst").cast("string"))
    val edgeIri = iri(base + "edge/", col("id").cast("string"))
    val relIri = iri(base + "rel/", encSeg(col("relationship")))
    val edgeArr = array(Seq(
      tri(srcIri, relIri, dstIri),
      tri(edgeIri, lit("<" + RdfNs + "type>"), lit("<" + RdfNs + "Statement>")),
      tri(edgeIri, lit("<" + RdfNs + "subject>"), srcIri),
      tri(edgeIri, lit("<" + RdfNs + "predicate>"), relIri),
      tri(edgeIri, lit("<" + RdfNs + "object>"), dstIri)) ++
      propTris(g.edges, edgeIri, Set("id", "src", "dst", "relationship")): _*)
    val edgeT = g.edges.select(explode(edgeArr).as("_t"))
      .select(col("_t.s").as("s"), col("_t.p").as("p"), col("_t.o").as("o"))
      .filter(col("o").isNotNull)

    nodeT.unionAll(edgeT)
  }

  /** Triples → N-Triples text lines (`s p o .`). */
  def toNTriples(triples: DataFrame): Dataset[String] = {
    import triples.sparkSession.implicits._
    triples.select(concat(col("s"), lit(" "), col("p"), lit(" "), col("o"), lit(" ."))
      .as("line")).as[String]
  }

  /** Deterministic Turtle prefix table for a base IRI. */
  private def turtlePrefixes(base: String): Seq[(String, String)] = Seq(
    "rdf" -> RdfNs, "xsd" -> XsdNs,
    "gn" -> (base + "node/"), "ge" -> (base + "edge/"),
    "gl" -> (base + "label/"), "gr" -> (base + "rel/"),
    "gp" -> (base + "prop/"))

  /** Turtle PN_LOCAL subset our IRIs produce: alnum/_/PLX start, no final
    * dot. Percent escapes are legal PN_LOCAL only as full PLX (`%` HEX HEX)
    * per the grammar — a bare `%` (possible in externally parsed triples)
    * must stay a full `<IRI>`, so the percent branch requires two hex
    * digits. */
  private val SafePlx = "%[0-9A-Fa-f]{2}"
  private val SafeLocal =
    s"(?:[A-Za-z0-9_]|$SafePlx)(?:(?:[A-Za-z0-9_.-]|$SafePlx)*(?:[A-Za-z0-9_-]|$SafePlx))?"

  /** Triples → Turtle text lines (reference
    * `src/rdf/serialization/turtle.rs` — a rio_turtle formatter; here the
    * @prefix header is seven literal rows and every body line is a
    * partition-parallel projection that shortens matching IRIs to prefixed
    * names and `rdf:type` to the grammar's `a` verb). One statement per
    * line — valid Turtle, no subject grouping state needed. */
  def toTurtle(triples: DataFrame, base: String): Dataset[String] = {
    require(base.endsWith("/"), "base IRI must end with '/'")
    val spark = triples.sparkSession
    import spark.implicits._
    val prefixes = turtlePrefixes(base)
    def shortenIri(c: Column): Column =
      // longest namespace first so <base>node/… binds to gn:, not a base prefix
      prefixes.sortBy { case (_, ns) => -ns.length }.foldRight(c) {
        case ((pfx, ns), acc) =>
          val q = java.util.regex.Pattern.quote(ns)
          when(c.rlike("^<" + q + SafeLocal + ">$"),
            concat(lit(pfx + ":"), regexp_extract(c, "^<" + q + "(" + SafeLocal + ")>$", 1)))
            .otherwise(acc)
      }
    def term(c: Column): Column =
      when(c.startsWith("\""), // typed literal: shorten only the datatype IRI
        concat(regexp_extract(c, "^(\".*\")\\^\\^<", 1), lit("^^"),
          shortenIri(regexp_extract(c, "(<[^>]*>)$", 1))))
        .otherwise(shortenIri(c))
    val pred = when(col("p") === lit("<" + RdfNs + "type>"), lit("a"))
      .otherwise(term(col("p")))
    val header = prefixes.map { case (p, ns) => s"@prefix $p: <$ns> ." }.toDS()
    header.unionAll(triples.select(
      concat(term(col("s")), lit(" "), pred, lit(" "), term(col("o")), lit(" ."))
        .as("value")).as[String])
  }

  /** Turtle text lines → (s, p, o) term columns, inverting [[toTurtle]]:
    * @prefix directives are collected (a handful of header rows, never
    * data), prefixed names and `a` expand back to full IRI terms, typed
    * literals expand their datatype. Accepts the line-oriented statement
    * subset [[toTurtle]] emits. */
  def parseTurtle(lines: Dataset[String]): DataFrame = {
    val pfxRe = "^@prefix\\s+([A-Za-z0-9_]*):\\s+<([^>]*)>\\s*\\.\\s*$"
    val prefixes = lines.toDF("line")
      .filter(col("line").rlike(pfxRe))
      .select(regexp_extract(col("line"), pfxRe, 1).as("p"),
        regexp_extract(col("line"), pfxRe, 2).as("ns"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    def expandName(n: Column): Column = prefixes.foldRight(n) {
      case ((pfx, ns), acc) =>
        val q = java.util.regex.Pattern.quote(pfx)
        when(n.rlike("^" + q + ":"),
          concat(lit("<" + ns), regexp_replace(n, "^" + q + ":", ""), lit(">")))
          .otherwise(acc)
    }
    def expand(c: Column): Column =
      when(c === "a", lit("<" + RdfNs + "type>"))
        .when(c.startsWith("\"") && c.rlike("\\^\\^[A-Za-z0-9_]*:\\S*$"),
          concat(regexp_extract(c, "^(\".*\")\\^\\^", 1), lit("^^"),
            expandName(regexp_extract(c, "\\^\\^([A-Za-z0-9_]*:\\S*)$", 1))))
        .when(c.startsWith("\""), c)
        .otherwise(expandName(c))
    val re = "^(\\S+)\\s+(\\S+)\\s+(.+?)\\s*\\.\\s*$"
    lines.toDF("line")
      .filter(length(trim(col("line"))) > 0 && !col("line").rlike("^\\s*@prefix"))
      .select(
        expand(regexp_extract(col("line"), re, 1)).as("s"),
        expand(regexp_extract(col("line"), re, 2)).as("p"),
        expand(regexp_extract(col("line"), re, 3)).as("o"))
  }

  // ---------- RDF/XML (reference src/rdf/serialization/rdfxml.rs — a
  // rio_xml formatter; here a line-oriented writer/parser pair) ----------

  /** XML escape for attribute values and text content (& first). */
  private def xmlEsc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;")

  private def xmlUnesc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "&quot;", "\""), "&gt;", ">"), "&lt;", "<"), "&amp;", "&")

  /** Longest NCName-ish suffix of a predicate IRI — the XML element local
    * name; the remainder is its namespace. RDF/XML genuinely cannot express
    * a predicate with no such suffix (the classic "cannot split URI"
    * limitation — Jena raises too); [[toRdfXml]] raises a clear error. */
  private val NcNameSuffix = "([A-Za-z_][A-Za-z0-9_.-]*)$"

  /** Triples → RDF/XML text lines: an <rdf:RDF> header/footer around one
    * self-contained <rdf:Description> statement per triple (valid, if
    * verbose, RDF/XML — subject grouping is an optional compaction). Each
    * property element declares its own xmlns:p, so parsing needs no
    * cross-line state and every body line is a partition-parallel
    * projection. */
  def toRdfXml(triples: DataFrame, base: String): Dataset[String] = {
    require(base.endsWith("/"), "base IRI must end with '/'")
    val spark = triples.sparkSession
    import spark.implicits._
    val pIri = regexp_extract(col("p"), "^<(.*)>$", 1)
    val local = regexp_extract(pIri, NcNameSuffix, 1)
    val nsCol = xmlEsc(regexp_replace(pIri, NcNameSuffix, ""))
    val subj = xmlEsc(regexp_extract(col("s"), "^<(.*)>$", 1))
    val litVal = xmlEsc(regexp_extract(col("o"), "^\"(.*)\"\\^\\^<", 1))
    val litDt = xmlEsc(regexp_extract(col("o"), "\\^\\^<([^>]*)>$", 1))
    val oIri = xmlEsc(regexp_extract(col("o"), "^<(.*)>$", 1))
    val localOk = when(length(local) > 0, local).otherwise(raise_error(concat(
      lit("RDF/XML cannot split predicate IRI into namespace + XML name: "), col("p"))))
    val line = when(col("o").startsWith("\""),
      concat(lit("<rdf:Description rdf:about=\""), subj, lit("\"><p:"), localOk,
        lit(" xmlns:p=\""), nsCol, lit("\" rdf:datatype=\""), litDt, lit("\">"),
        litVal, lit("</p:"), localOk, lit("></rdf:Description>")))
      .otherwise(
        concat(lit("<rdf:Description rdf:about=\""), subj, lit("\"><p:"), localOk,
          lit(" xmlns:p=\""), nsCol, lit("\" rdf:resource=\""), oIri,
          lit("\"/></rdf:Description>")))
    Seq("<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
      "<rdf:RDF xmlns:rdf=\"" + RdfNs + "\">").toDS()
      .unionAll(triples.select(line.as("value")).as[String])
      .unionAll(Seq("</rdf:RDF>").toDS())
  }

  /** RDF/XML text lines → (s, p, o) term columns, inverting [[toRdfXml]]
    * (accepts its one-statement-per-line subset; header/footer lines are
    * dropped). */
  def parseRdfXml(lines: Dataset[String]): DataFrame = {
    val litRe = "^<rdf:Description rdf:about=\"([^\"]*)\"><p:([^ >]+) xmlns:p=\"([^\"]*)\"" +
      " rdf:datatype=\"([^\"]*)\">(.*)</p:[^>]*></rdf:Description>\\s*$"
    val resRe = "^<rdf:Description rdf:about=\"([^\"]*)\"><p:([^ >]+) xmlns:p=\"([^\"]*)\"" +
      " rdf:resource=\"([^\"]*)\"/></rdf:Description>\\s*$"
    val body = lines.toDF("line").filter(col("line").rlike(litRe) || col("line").rlike(resRe))
    def ext(re: String, i: Int) = regexp_extract(col("line"), re, i)
    body.select(
      concat(lit("<"), xmlUnesc(when(col("line").rlike(litRe), ext(litRe, 1))
        .otherwise(ext(resRe, 1))), lit(">")).as("s"),
      concat(lit("<"), xmlUnesc(when(col("line").rlike(litRe), ext(litRe, 3))
        .otherwise(ext(resRe, 3))),
        when(col("line").rlike(litRe), ext(litRe, 2)).otherwise(ext(resRe, 2)),
        lit(">")).as("p"),
      when(col("line").rlike(litRe),
        concat(lit("\""), xmlUnesc(ext(litRe, 5)), lit("\"^^<"),
          xmlUnesc(ext(litRe, 4)), lit(">")))
        .otherwise(concat(lit("<"), xmlUnesc(ext(resRe, 4)), lit(">"))).as("o"))
  }

  // ---------- JSON-LD (reference src/rdf/serialization/jsonld.rs — the
  // reference SERIALIZES expanded JSON-LD but its parse is a declared stub;
  // here both directions work on the newline-delimited expanded node-object
  // profile) ----------

  /** JSON string escape (terms are already N-Triples-escaped, so no raw
    * control chars remain — backslash and quote suffice). */
  private def jsonEsc(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")

  private def jsonUnesc(c: Column): Column = {
    val sentinel = ""
    regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\\\\\", sentinel), "\\\\\"", "\""), sentinel, "\\\\")
  }

  /** Triples → JSON-LD text lines: one expanded node object per line
    * (the streaming/NDJSON profile — `{"@id": s, p: [{...}]}`), rdf:type as
    * `@type`. Partition-parallel projection, no subject grouping state. */
  def toJsonLd(triples: DataFrame): Dataset[String] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val s = jsonEsc(regexp_extract(col("s"), "^<(.*)>$", 1))
    val p = jsonEsc(regexp_extract(col("p"), "^<(.*)>$", 1))
    val oIri = jsonEsc(regexp_extract(col("o"), "^<(.*)>$", 1))
    val litVal = jsonEsc(regexp_extract(col("o"), "^\"(.*)\"\\^\\^<", 1))
    val litDt = jsonEsc(regexp_extract(col("o"), "\\^\\^<([^>]*)>$", 1))
    val line = when(col("p") === lit("<" + RdfNs + "type>"),
      concat(lit("{\"@id\":\""), s, lit("\",\"@type\":[\""), oIri, lit("\"]}")))
      .when(col("o").startsWith("\""),
        concat(lit("{\"@id\":\""), s, lit("\",\""), p, lit("\":[{\"@value\":\""),
          litVal, lit("\",\"@type\":\""), litDt, lit("\"}]}")))
      .otherwise(
        concat(lit("{\"@id\":\""), s, lit("\",\""), p, lit("\":[{\"@id\":\""),
          oIri, lit("\"}]}")))
    triples.select(line.as("value")).as[String]
  }

  /** JSON-LD text lines → (s, p, o) terms, inverting [[toJsonLd]] — a real
    * parser for the emitted expanded-node-object profile (the reference's
    * JSON-LD parse returns an error unconditionally,
    * `serialization/jsonld.rs:15-20`). */
  def parseJsonLd(lines: Dataset[String]): DataFrame = {
    val str = "((?:[^\"\\\\]|\\\\.)*)" // JSON string body incl. escapes
    val typeRe = "^\\{\"@id\":\"" + str + "\",\"@type\":\\[\"" + str + "\"\\]\\}\\s*$"
    val litRe = "^\\{\"@id\":\"" + str + "\",\"" + str +
      "\":\\[\\{\"@value\":\"" + str + "\",\"@type\":\"" + str + "\"\\}\\]\\}\\s*$"
    val iriRe = "^\\{\"@id\":\"" + str + "\",\"" + str +
      "\":\\[\\{\"@id\":\"" + str + "\"\\}\\]\\}\\s*$"
    val body = lines.toDF("line")
      .filter(col("line").rlike(typeRe) || col("line").rlike(litRe) || col("line").rlike(iriRe))
    def ext(re: String, i: Int) = jsonUnesc(regexp_extract(col("line"), re, i))
    body.select(
      concat(lit("<"),
        when(col("line").rlike(typeRe), ext(typeRe, 1))
          .when(col("line").rlike(litRe), ext(litRe, 1))
          .otherwise(ext(iriRe, 1)), lit(">")).as("s"),
      when(col("line").rlike(typeRe), lit("<" + RdfNs + "type>"))
        .when(col("line").rlike(litRe), concat(lit("<"), ext(litRe, 2), lit(">")))
        .otherwise(concat(lit("<"), ext(iriRe, 2), lit(">"))).as("p"),
      when(col("line").rlike(typeRe), concat(lit("<"), ext(typeRe, 2), lit(">")))
        .when(col("line").rlike(litRe),
          concat(lit("\""), ext(litRe, 3), lit("\"^^<"), ext(litRe, 4), lit(">")))
        .otherwise(concat(lit("<"), ext(iriRe, 3), lit(">"))).as("o"))
  }

  /** N-Triples text lines → (s, p, o) term columns. Subjects and predicates
    * are IRIs (no whitespace); the object is everything up to the final dot. */
  def parseNTriples(lines: Dataset[String]): DataFrame = {
    // one whitespace split + one anchored strip instead of three
    // whole-line regex extractions (the parse hot path): s and p are the
    // first two whitespace-delimited terms, o is the rest minus the
    // terminating dot (an embedded " . " inside a literal survives — only
    // the final anchored dot is stripped, as the non-greedy regex did)
    val parts = split(trim(col("line")), "\\s+", 3)
    lines.toDF("line").filter(length(trim(col("line"))) > 0)
      .select(
        parts.getItem(0).as("s"),
        parts.getItem(1).as("p"),
        regexp_replace(parts.getItem(2), "\\s*\\.\\s*$", "").as("o"))
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
    val propKey = decSeg(regexp_extract(col("p"), "prop/([^/>]+)>$", 1))
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
      .select(sId.as("id"), decSeg(regexp_extract(col("o"), "label/([^/>]+)>$", 1)).as("_l"))
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
      .join(reifPart("predicate", decSeg(regexp_extract(col("o"), "rel/([^/>]+)>$", 1)), "relationship"), Seq("id"))
    val edges = pivotProps("e", edgeS) match {
      case Some(p) => core.join(p, Seq("id"), "left")
      case None => core
    }
    PropertyGraph(nodes, edges)
  }
}
