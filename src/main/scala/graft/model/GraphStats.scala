package graft.model

import org.apache.spark.sql.functions._

/** Cardinality statistics for cost-based pattern-anchor selection
  * (reference `src/query/plan_enumerator.rs:18-64`, `cost_model.rs:11-100` —
  * SURVEY §1.4/§4.1 calls the anchor choice "the single most important
  * planning decision").
  *
  * One distributed pass computes:
  *   - node count per label,
  *   - edge count per (source label, relationship type, target label) triple,
  * both collected to small driver-side maps (labels × types × labels — tens
  * to hundreds of entries regardless of data size: the same shape the
  * reference keeps in RAM, and what an ANALYZE step would persist at 100 TB).
  *
  * Instances are memoized per `statsKey` (the loader sets it to the dataset
  * path), so the pass runs once per dataset per JVM, not once per query.
  */
final class GraphStats(val labelCounts: Map[String, Long],
                       val tripleCounts: Map[(String, String, String), Long],
                       val totalNodes: Long,
                       val totalEdges: Long,
                       val maxDegByType: Map[String, Long] = Map.empty,
                       val maxMultByType: Map[String, Long] = Map.empty) {

  /** Max per-node degree (either direction) over the given edge types
    * (empty = all types). Bounds the size of any per-node adjacency array a
    * plan might build — the WCO fusion's skew guard. */
  def maxDegree(types: Seq[String]): Double =
    if (maxDegByType.isEmpty) 0.0
    else if (types.isEmpty) maxDegByType.values.max.toDouble
    else types.foldLeft(0L)((m, t) => math.max(m, maxDegByType.getOrElse(t, 0L))).toDouble

  /** Max number of parallel (src, dst)-identical edges over the given types
    * (empty = all). Unknown (no stats row) is reported as MaxValue so
    * callers stay on the exact path; 1 proves the graph is simple for these
    * types, letting the WCO fusion drop its multiplicity back-joins. */
  def maxMultiplicity(types: Seq[String]): Double =
    if (maxMultByType.isEmpty) Double.MaxValue
    else if (types.isEmpty) maxMultByType.values.max.toDouble
    else if (types.forall(maxMultByType.contains))
      types.foldLeft(0L)((m, t) => math.max(m, maxMultByType(t))).toDouble
    else Double.MaxValue

  /** Estimated node count for an optional label (None = any node). */
  def nodeCard(label: Option[String]): Double =
    label.map(l => labelCounts.getOrElse(l, 0L).toDouble)
      .getOrElse(totalNodes.toDouble)

  /** Edge count matching (srcLabel?, types?, dstLabel?) in the stored
    * src→dst direction; None/empty = wildcard, summed over the map. */
  def tripleCard(srcLabel: Option[String], types: Seq[String],
                 dstLabel: Option[String]): Double =
    tripleCounts.iterator.collect {
      case ((sl, t, dl), n)
        if srcLabel.forall(_ == sl) && (types.isEmpty || types.contains(t)) &&
          dstLabel.forall(_ == dl) => n
    }.sum.toDouble
}

object GraphStats {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, GraphStats]()

  /** Stats for `g`, computed once per `key` per JVM. */
  def forGraph(g: PropertyGraph, key: String): GraphStats =
    cache.computeIfAbsent(key, _ => compute(g))

  def compute(g: PropertyGraph): GraphStats = {
    val lc = g.nodes.select(explode(col("labels")).as("l"))
      .groupBy("l").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nl = g.nodes.select(col("id"), col("labels"))
    val triples = g.edges.select(col("src"), col("dst"), col("relationship"))
      .join(nl.select(col("id").as("src"), col("labels").as("_sl")), Seq("src"))
      .join(nl.select(col("id").as("dst"), col("labels").as("_dl")), Seq("dst"))
      .select(explode(col("_sl")).as("sl"), col("relationship"), col("_dl"))
      .select(col("sl"), col("relationship"), explode(col("_dl")).as("dl"))
      .groupBy("sl", "relationship", "dl").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    // max per-node degree per edge type, either direction — one extra
    // aggregate pair in the once-per-dataset pass (the 100 TB shape is the
    // same ANALYZE-style job)
    val md = g.edges.select(col("relationship"), col("src").as("n"))
      .unionAll(g.edges.select(col("relationship"), col("dst").as("n")))
      .groupBy("relationship", "n").count()
      .groupBy("relationship").agg(max("count").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mm = g.edges.groupBy(col("relationship"), col("src"), col("dst")).count()
      .groupBy("relationship").agg(max("count").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    new GraphStats(lc, triples, g.nodes.count(), g.edges.count(), md, mm)
  }
}
