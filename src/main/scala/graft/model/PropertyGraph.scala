package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical labeled-property-graph layout: two DataFrames.
  *
  * {{{
  * nodes(id: long, labels: array<string>, <typed property columns>)
  * edges(id: long, src: long, dst: long, relationship: string, <typed property columns>)
  * }}}
  *
  * Mirrors the reference data model (`src/graph/types.rs:39-136` NodeId /
  * EdgeId / Label / EdgeType; `src/graph/node.rs:53-75`; `src/graph/edge.rs:64-109`)
  * re-expressed columnar: labels are an array column (a node may carry several,
  * `src/graph/node.rs:107`), the edge type is a dictionary-encoded string column
  * (the reference interns it to u16, `src/graph/store.rs:507-513` — Parquet
  * dictionary encoding provides the same compression for free).
  *
  * Everything downstream (traversals, algorithms) is a plain DataFrame
  * transformation, so Catalyst sees the whole plan: filter pushdown, column
  * pruning and join reordering apply to graph queries exactly as to relational
  * ones. At cluster scale, partition `edges` by `src` (and optionally keep a
  * dst-partitioned copy) so expand() joins co-locate.
  */
/** @param nodeIdHw known id high-water marks (max allocated id), carried
  *                 across derived graphs by the write path so chained write
  *                 statements allocate ids without rescanning the tables —
  *                 the columnar analog of the reference store's next-id
  *                 counters (`src/graph/store.rs`). None = unknown (a scan
  *                 computes it on demand); ids are sparse by design, so a
  *                 conservative (higher) mark after deletes stays correct. */
final case class PropertyGraph(nodes: DataFrame, edges: DataFrame,
                               byLabel: Map[String, DataFrame] = Map.empty,
                               statsKey: Option[String] = None,
                               constraints: Set[(String, String)] = Set.empty,
                               nodeIdHw: Option[Long] = None,
                               edgeIdHw: Option[Long] = None) {

  /** Nodes carrying `label` — the reference's label_index scan
    * (`src/graph/store.rs:558`). When the loader registered a per-label
    * DataFrame (the columnar analog of the reference's label index), a label
    * scan reads ONLY that table — the multi-branch union (and any dedup
    * inside it) is never touched. Otherwise falls back to a pushable
    * array_contains predicate, which Catalyst folds to prune union branches
    * wherever the branch's labels are a literal. */
  def nodesWithLabel(label: String): DataFrame =
    byLabel.getOrElse(label, nodes.filter(array_contains(col("labels"), label)))

  /** Edges of one relationship type (`edge_type_index`, `store.rs:562`). */
  def edgesOfType(rel: String*): DataFrame =
    if (rel.isEmpty) edges else edges.filter(col("relationship").isin(rel: _*))

  /** Out-degree per node (reference ADR-017 adjacency-count aggregate:
    * `operator.rs:3985-4280` — in Spark a plain partial-aggregated groupBy). */
  def outDegrees: DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  def inDegrees: DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("degree"))

  /** Total degree (in+out). */
  def degrees: DataFrame =
    edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))

  /** Distinct undirected edge set with src<dst canonical orientation —
    * the input shape for triangle counting / LCC. */
  def undirectedEdges: DataFrame = {
    val e = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    e.select(least(col("src"), col("dst")).as("a"),
             greatest(col("src"), col("dst")).as("b")).distinct()
  }

  /** Subgraph projection by node label and/or edge type — the reference's
    * `build_view(label?, edge_type?)` (`src/algo/mod.rs:26`). */
  def subgraph(nodeLabel: Option[String] = None, edgeType: Option[String] = None): PropertyGraph = {
    val n = nodeLabel.map(nodesWithLabel).getOrElse(nodes)
    val e0 = edgeType.map(t => edgesOfType(t)).getOrElse(edges)
    val e = nodeLabel match {
      case None => e0
      case Some(_) =>
        val ids = n.select(col("id"))
        e0.join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    }
    PropertyGraph(n, e)
  }
}
