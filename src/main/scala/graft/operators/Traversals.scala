package graft.operators

import graft.model.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Edge direction for expansion — reference `src/query/ast.rs` Direction. */
sealed trait Direction
object Direction {
  case object Out extends Direction
  case object In extends Direction
  case object Both extends Direction
}

/** Graph traversal operators — the "joins" of a graph engine.
  *
  * Reference semantics: `ExpandOperator` (`src/query/executor/operator.rs:2744-3002`),
  * `ExpandIntoOperator` (`operator.rs:8032-8134`), `VarLengthExpandOperator`
  * (`operator.rs:3003-3224`), `ShortestPathOperator` (`operator.rs:7527-7714`).
  *
  * Spark-first re-expression: one hop = one equi-join against the edges
  * DataFrame (hash/sort-merge picked by Catalyst; broadcast when the bound
  * side is small); bounded var-length = an unrolled loop of joins with
  * per-(start,node) dedup; unbounded reachability / BFS = an iterative
  * frontier loop with localCheckpoint to cut lineage. No Volcano iterators:
  * the whole traversal is a single declarative plan per hop, so predicate
  * pushdown and AQE apply.
  */
object Traversals {

  /** One-hop expansion from a bound node set.
    *
    * @param bound  DataFrame with a node-id column `idCol` (plus any carried columns)
    * @return bound columns + `_edgeId`, `_rel`, `_nbr` (neighbor node id)
    */
  def expand(g: PropertyGraph, bound: DataFrame, idCol: String,
             rels: Seq[String] = Nil, dir: Direction = Direction.Out): DataFrame = {
    val e0 = g.edgesOfType(rels: _*)
    // carry edge property columns (everything beyond id/src/dst/relationship)
    val props = e0.columns.filterNot(Set("id", "src", "dst", "relationship")).toSeq
    def oriented(srcC: String, dstC: String) =
      e0.select(Seq(col("id").as("_edgeId"), col("relationship").as("_rel"),
                col(srcC).as("_from"), col(dstC).as("_nbr")) ++ props.map(col): _*)
    val e = dir match {
      case Direction.Out  => oriented("src", "dst")
      case Direction.In   => oriented("dst", "src")
      case Direction.Both => oriented("src", "dst").unionAll(oriented("dst", "src"))
    }
    bound.join(e, bound(idCol) === e("_from")).drop("_from")
  }

  /** Expand and bind the neighbor's node row (label-filtered), like
    * `MATCH (a)-[r:REL]->(b:Label)` with `a` bound. */
  def expandToNodes(g: PropertyGraph, bound: DataFrame, idCol: String,
                    rels: Seq[String], dir: Direction, targetLabel: Option[String]): DataFrame = {
    val nbrs = expand(g, bound, idCol, rels, dir)
    val tgt = targetLabel.map(g.nodesWithLabel).getOrElse(g.nodes)
    nbrs.join(tgt.withColumnRenamed("id", "_nbr"), Seq("_nbr"))
  }

  /** Edge-existence semi-join between two bound endpoints
    * (`ExpandIntoOperator` — chosen by the reference when both ends are bound,
    * `src/query/logical_optimizer.rs:115-130`). Keeps rows of `bound` that
    * have an edge (srcCol)-[rel]->(dstCol). */
  def expandInto(g: PropertyGraph, bound: DataFrame, srcCol: String, dstCol: String,
                 rels: Seq[String] = Nil): DataFrame = {
    val e = g.edgesOfType(rels: _*).select(col("src").as("_s"), col("dst").as("_d"))
    bound.join(e, bound(srcCol) === e("_s") && bound(dstCol) === e("_d"), "left_semi")
  }

  /** Bounded variable-length expansion `*min..max` (reference BFS with
    * visited-set dedup per start node, `operator.rs:3003-3224`).
    *
    * Returns distinct (start, node, hops) reachability triples — node/edge
    * identity semantics (dedup by id, `record.rs:95-131`), reaching a node at
    * several depths keeps the MINIMUM depth per (start,node), matching
    * BFS-visited semantics.
    *
    * Scale notes: each hop is one shuffle join on `dst`; the frontier is
    * persisted and lineage is cut with localCheckpoint so a 10-hop expansion
    * doesn't replan 10 chained shuffles; dedup keeps frontiers from exploding
    * on cyclic graphs.
    */
  def varLengthExpand(edges: DataFrame, starts: DataFrame, startCol: String,
                      minHops: Int, maxHops: Int): DataFrame = {
    require(minHops >= 1 && maxHops >= minHops, "need 1 <= min <= max")
    val e = edges.select(col("src").as("_src"), col("dst").as("_dst"))
    var frontier = starts.select(col(startCol).cast("long").as("start"))
      .distinct().withColumn("node", col("start"))
    var visited = frontier.withColumn("hops", lit(0))
    var out: DataFrame = null
    var h = 1
    while (h <= maxHops) {
      val next = frontier.join(e, frontier("node") === e("_src"))
        .select(col("start"), col("_dst").as("node")).distinct()
        .join(visited.select(col("start").as("vs"), col("node").as("vn")),
              col("start") === col("vs") && col("node") === col("vn"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val reached = next.withColumn("hops", lit(h))
      visited = visited.unionAll(reached).localCheckpoint(true)
      if (h >= minHops) out = if (out == null) reached else out.unionAll(reached)
      frontier = next
      h += 1
    }
    if (out == null) visited.filter(lit(false)) else out.localCheckpoint(true)
  }

  /** Unweighted shortest-path length between a start set and all reachable
    * nodes (`ShortestPathOperator` BFS, `operator.rs:7527-7714`), bounded by
    * maxIter. Returns (start, node, dist>=1). */
  def shortestPathLengths(edges: DataFrame, starts: DataFrame, startCol: String,
                          maxIter: Int): DataFrame =
    varLengthExpand(edges, starts, startCol, 1, maxIter)
}
