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
    require(minHops >= 0 && maxHops >= minHops, "need 0 <= min <= max")
    // small graph + small start set → in-task multi-source BFS, one job
    // instead of ~1 per hop (graft.algo.LocalKernels has the gate details)
    val (e, small) = graft.algo.LocalKernels.gate(edges.select(col("src"), col("dst")))
    if (small && graft.algo.LocalKernels.isSmall(starts.select(col(startCol))))
      return graft.algo.LocalKernels.varLengthExpand(e, starts, startCol, minHops, maxHops)
    varLengthExpandDistributed(e, starts, startCol, minHops, maxHops)
  }

  private[graft] def varLengthExpandDistributed(
      edges: DataFrame, starts: DataFrame, startCol: String,
      minHops: Int, maxHops: Int): DataFrame = {
    // Each hop's frontier is materialized ONCE via eager localCheckpoint,
    // which also replaces its logical plan with a tiny LogicalRDD. That keeps
    // the per-hop plan (and the AQE plan-string events, which stringify the
    // full tree per stage) CONSTANT-size — a persist() here instead nests the
    // cached plans combinatorially and the driver burns minutes in
    // generateTreeString. The growing visited set is a cheap UNION of those
    // checkpointed frontiers and is never re-materialized.
    val e = edges.select(col("src").cast("long").as("_src"), col("dst").cast("long").as("_dst"))
      .localCheckpoint(true)
    val start0 = starts.select(col(startCol).cast("long").as("start"))
      .distinct().withColumn("node", col("start"))
      .localCheckpoint(true)
    var visited: DataFrame = start0
    var frontier: DataFrame = start0
    var out: DataFrame = if (minHops == 0) start0.withColumn("hops", lit(0)) else null
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = frontier.join(e, frontier("node") === e("_src"))
        .select(col("start"), col("_dst").as("node")).distinct()
        .join(visited, Seq("start", "node"), "left_anti")
        .localCheckpoint(true) // one job; frontier becomes a LogicalRDD
      if (next.isEmpty) done = true // fixpoint: supports unbounded `*`
      else {
        if (h >= minHops) {
          val reached = next.withColumn("hops", lit(h))
          out = if (out == null) reached else out.unionAll(reached)
        }
        visited = visited.unionAll(next)
        frontier = next
        h += 1
      }
    }
    if (out == null) start0.withColumn("hops", lit(0)).filter(lit(false)) else out
  }

  /** varLengthExpand variant that also materializes ONE witness path per
    * (start, node) — the lexicographically-smallest (node-id sequence,
    * edge-id sequence) among the shortest (BFS min-depth) paths, so results
    * are deterministic. Returns (start, node, hops, path: array<long> =
    * [start .. node], epath: array<long> = the traversed edge ids — the
    * reference's paths carry BOTH, `record.rs:85-89`). When the input has
    * no `id` column, epath is an empty array per row.
    * Powers named paths / `shortestPath()` (`operator.rs:7527-7714`,
    * `ast.rs:204-208`): `length(p)` = hops, `nodes(p)` = path,
    * `relationships(p)` = epath. */
  def varLengthExpandPaths(edges: DataFrame, starts: DataFrame, startCol: String,
                           minHops: Int, maxHops: Int): DataFrame = {
    require(minHops >= 0 && maxHops >= minHops, "need 0 <= min <= max")
    // small graph + start set → in-task witness-path BFS (LocalKernels);
    // either way the gated (possibly pre-materialized) projection is used
    val cols = if (edges.columns.contains("id"))
      edges.select(col("src"), col("dst"), col("id")) else edges.select(col("src"), col("dst"))
    val (g, small) = graft.algo.LocalKernels.gate(cols)
    if (small && graft.algo.LocalKernels.isSmall(starts.select(col(startCol))))
      return graft.algo.LocalKernels.varLengthExpandPaths(g, starts, startCol, minHops, maxHops)
    varLengthExpandPathsDistributed(g, starts, startCol, minHops, maxHops)
  }

  private[graft] def varLengthExpandPathsDistributed(
      edges: DataFrame, starts: DataFrame, startCol: String,
      minHops: Int, maxHops: Int): DataFrame = {
    val hasId = edges.columns.contains("id")
    val eid = if (hasId) col("id").cast("long") else lit(null).cast("long")
    val e = edges.select(col("src").cast("long").as("_src"),
        col("dst").cast("long").as("_dst"), eid.as("_eid"))
      .localCheckpoint(true)
    val start0 = starts.select(col(startCol).cast("long").as("start")).distinct()
      .select(col("start"), col("start").as("node"), array(col("start")).as("path"),
        array().cast("array<long>").as("epath"))
      .localCheckpoint(true)
    var visited: DataFrame = start0.select("start", "node")
    var frontier: DataFrame = start0
    var out: DataFrame = if (minHops == 0) start0.withColumn("hops", lit(0)) else null
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = frontier.join(e, frontier("node") === e("_src"))
        .select(col("start"), col("_dst").as("node"),
          concat(col("path"), array(col("_dst"))).as("path"),
          (if (hasId) concat(col("epath"), array(col("_eid"))) else col("epath")).as("epath"))
        .join(visited, Seq("start", "node"), "left_anti")
        .groupBy(col("start"), col("node"))
        .agg(min(struct(col("path"), col("epath"))).as("_w"))
        .select(col("start"), col("node"), col("_w.path").as("path"), col("_w.epath").as("epath"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        if (h >= minHops) {
          val reached = next.withColumn("hops", lit(h))
          out = if (out == null) reached else out.unionAll(reached)
        }
        visited = visited.unionAll(next.select("start", "node"))
        frontier = next
        h += 1
      }
    }
    if (out == null) start0.withColumn("hops", lit(0)).filter(lit(false)) else out
  }

  /** varLengthExpandPaths variant keeping ALL distinct shortest node
    * sequences per (start, node) — `allShortestPaths()` semantics (reference
    * `operator.rs:7534` `all_paths: bool`). A node is still reached only at
    * its BFS depth (the visited anti-join excludes earlier-depth nodes), but
    * every distinct path surviving to that depth is kept instead of one
    * witness. Paths are node-id sequences: parallel edges between the same
    * nodes collapse to one path (node/edge identity is by id).
    * Path multiplicity is inherently combinatorial — the frontier carries
    * one row per (start, node, path); dedup bounds it per hop. */
  def varLengthExpandAllPaths(edges: DataFrame, starts: DataFrame, startCol: String,
                              minHops: Int, maxHops: Int): DataFrame = {
    require(minHops >= 0 && maxHops >= minHops, "need 0 <= min <= max")
    // small graph + start set → in-task all-shortest BFS (LocalKernels)
    val cols = if (edges.columns.contains("id"))
      edges.select(col("src"), col("dst"), col("id")) else edges.select(col("src"), col("dst"))
    val (g, small) = graft.algo.LocalKernels.gate(cols)
    if (small && graft.algo.LocalKernels.isSmall(starts.select(col(startCol))))
      return graft.algo.LocalKernels.varLengthExpandAllPaths(g, starts, startCol, minHops, maxHops)
    varLengthExpandAllPathsDistributed(g, starts, startCol, minHops, maxHops)
  }

  private[graft] def varLengthExpandAllPathsDistributed(
      edges: DataFrame, starts: DataFrame, startCol: String,
      minHops: Int, maxHops: Int): DataFrame = {
    val hasId = edges.columns.contains("id")
    val eid = if (hasId) col("id").cast("long") else lit(null).cast("long")
    val e = edges.select(col("src").cast("long").as("_src"),
        col("dst").cast("long").as("_dst"), eid.as("_eid"))
      .localCheckpoint(true)
    val start0 = starts.select(col(startCol).cast("long").as("start")).distinct()
      .select(col("start"), col("start").as("node"), array(col("start")).as("path"),
        array().cast("array<long>").as("epath"))
      .localCheckpoint(true)
    var visited: DataFrame = start0.select("start", "node")
    var frontier: DataFrame = start0
    var out: DataFrame = if (minHops == 0) start0.withColumn("hops", lit(0)) else null
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      // distinct NODE sequences (path identity is by node ids — parallel
      // edges collapse); per node sequence, the min edge-id witness
      val next = frontier.join(e, frontier("node") === e("_src"))
        .select(col("start"), col("_dst").as("node"),
          concat(col("path"), array(col("_dst"))).as("path"),
          (if (hasId) concat(col("epath"), array(col("_eid"))) else col("epath")).as("epath"))
        .join(visited, Seq("start", "node"), "left_anti")
        .groupBy(col("start"), col("node"), col("path"))
        .agg(min(col("epath")).as("epath"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        if (h >= minHops) {
          val reached = next.withColumn("hops", lit(h))
          out = if (out == null) reached else out.unionAll(reached)
        }
        visited = visited.unionAll(next.select("start", "node").distinct())
        frontier = next
        h += 1
      }
    }
    if (out == null) start0.withColumn("hops", lit(0)).filter(lit(false)) else out
  }

  /** Target-aware shortest paths — `shortestPath((a)-[*]-(b))` /
    * `allShortestPaths` where the pattern CONSTRAINS both endpoints: BFS
    * per start, emitting only rows that land on a target and stopping at
    * the depth where the last target is reached. An unbounded `*` therefore
    * explores only to the target's BFS depth instead of enumerating every
    * shortest node-sequence in the component (combinatorial in diamond-rich
    * graphs — the failure mode the untargeted expansion hits at scale). */
  def shortestPathsToTargets(edges: DataFrame, starts: DataFrame, startCol: String,
                             targets: DataFrame, targetCol: String,
                             minHops: Int, maxHops: Int, allPaths: Boolean): DataFrame = {
    require(minHops >= 0 && maxHops >= minHops, "need 0 <= min <= max")
    val cols = if (edges.columns.contains("id"))
      edges.select(col("src"), col("dst"), col("id")) else edges.select(col("src"), col("dst"))
    val (g, small) = graft.algo.LocalKernels.gate(cols)
    if (small && graft.algo.LocalKernels.isSmall(starts.select(col(startCol))) &&
        graft.algo.LocalKernels.isSmall(targets.select(col(targetCol))))
      return graft.algo.LocalKernels.shortestPathsToTargets(
        g, starts, startCol, targets, targetCol, minHops, maxHops, allPaths)
    shortestPathsToTargetsDistributed(g, starts, startCol, targets, targetCol,
      minHops, maxHops, allPaths)
  }

  private[graft] def shortestPathsToTargetsDistributed(
      edges: DataFrame, starts: DataFrame, startCol: String,
      targets: DataFrame, targetCol: String,
      minHops: Int, maxHops: Int, allPaths: Boolean): DataFrame = {
    val hasId = edges.columns.contains("id")
    val eid = if (hasId) col("id").cast("long") else lit(null).cast("long")
    val e = edges.select(col("src").cast("long").as("_src"),
        col("dst").cast("long").as("_dst"), eid.as("_eid"))
      .localCheckpoint(true)
    val tgt = targets.select(col(targetCol).cast("long").as("_tgt")).distinct()
      .localCheckpoint(true)
    val start0 = starts.select(col(startCol).cast("long").as("start")).distinct()
      .select(col("start"), col("start").as("node"), array(col("start")).as("path"),
        array().cast("array<long>").as("epath"))
      .localCheckpoint(true)
    // (start, target) pairs not yet reached; a start with none left is
    // dropped from the frontier, and the loop ends when the set drains
    var remaining = start0.select(col("start"))
      .crossJoin(tgt.withColumnRenamed("_tgt", "node"))
      .filter(col("start") =!= col("node")) // depth-0 self pair is satisfied
      .localCheckpoint(true)
    var visited: DataFrame = start0.select("start", "node")
    var frontier: DataFrame = start0
    var out: DataFrame =
      if (minHops == 0)
        start0.join(tgt, col("node") === col("_tgt"), "left_semi").withColumn("hops", lit(0))
      else null
    var h = 1
    var done = remaining.isEmpty
    while (h <= maxHops && !done) {
      val grown = frontier.join(e, frontier("node") === e("_src"))
        .select(col("start"), col("_dst").as("node"),
          concat(col("path"), array(col("_dst"))).as("path"),
          (if (hasId) concat(col("epath"), array(col("_eid"))) else col("epath")).as("epath"))
        .join(visited, Seq("start", "node"), "left_anti")
      val next =
        (if (allPaths)
          grown.groupBy(col("start"), col("node"), col("path"))
            .agg(min(col("epath")).as("epath"))
        else
          grown.groupBy(col("start"), col("node"))
            .agg(min(struct(col("path"), col("epath"))).as("_w"))
            .select(col("start"), col("node"), col("_w.path").as("path"),
              col("_w.epath").as("epath")))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        if (h >= minHops) {
          val reached = next.join(tgt, col("node") === col("_tgt"), "left_semi")
            .withColumn("hops", lit(h))
          out = if (out == null) reached else out.unionAll(reached)
        }
        remaining = remaining
          .join(next.select("start", "node").distinct(), Seq("start", "node"), "left_anti")
          .localCheckpoint(true)
        if (remaining.isEmpty) done = true
        else {
          visited = visited.unionAll(next.select("start", "node").distinct())
          frontier = next
            .join(remaining.select("start").distinct(), Seq("start"), "left_semi")
          h += 1
        }
      }
    }
    val empty = start0.withColumn("hops", lit(0)).filter(lit(false))
    if (out == null) empty else out
  }

  /** Unweighted shortest-path length between a start set and all reachable
    * nodes (`ShortestPathOperator` BFS, `operator.rs:7527-7714`), bounded by
    * maxIter; terminates early at the reachability fixpoint.
    * Returns (start, node, dist>=1). */
  def shortestPathLengths(edges: DataFrame, starts: DataFrame, startCol: String,
                          maxIter: Int): DataFrame =
    varLengthExpand(edges, starts, startCol, 1, maxIter)
}
