package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph write path (SURVEY §2.8) as BATCH DataFrame transforms.
  *
  * The reference mutates an in-memory store under MVCC
  * (`operator.rs:5157-7424`: CreateOperator, MergeOperator, DeleteOperator,
  * SetOperator). A Spark analytics engine is immutable-by-design, so each
  * mutation produces a NEW PropertyGraph whose nodes/edges DataFrames are
  * derived declaratively:
  *
  *   - CREATE  = unionByName append
  *   - MERGE   = anti-join split (matched / created) + ON MATCH / ON CREATE
  *               column overwrite + union
  *   - DELETE  = anti-join on the id set (DETACH also anti-joins edges on
  *               both endpoints)
  *   - SET     = conditional column overwrite in ONE projection (atomic —
  *               assignments never observe each other's writes)
  *   - REMOVE  = SET to NULL of the column's type
  *
  * All shapes are one shuffle (or none, when the id set broadcasts) — they
  * scale like any join. The per-label index is dropped on mutation (the
  * label→DataFrame map would go stale); label scans fall back to the pushable
  * predicate.
  */
object GraphMutations {

  /** CREATE nodes (reference `operator.rs:5157-6167`). Caller is responsible
    * for id-space discipline; duplicate ids are NOT checked (use mergeNodes
    * for insert-if-absent). */
  def createNodes(g: PropertyGraph, rows: DataFrame): PropertyGraph = {
    checkUnique(g, rows)
    // the per-label index stays valid under append: each label table gets
    // exactly the appended rows carrying that label (array_contains folds
    // to a constant when the batch's labels are literal — the usual CREATE
    // shape — so untouched label tables keep their pruned single-table
    // scan). Without this every post-write label scan fell back to an
    // array_contains pass over the FULL nodes table: 28-task stages per
    // anchor lookup across q_ldbc_upd/q_finbench_w's statement chains.
    // a batch with no labels column appends label-less nodes: they belong to
    // no label scan, so the existing index is untouched-and-consistent
    val byLabel =
      if (!rows.columns.contains("labels")) g.byLabel
      else g.byLabel.map { case (l, df) =>
        l -> df.unionByName(rows.filter(array_contains(col("labels"), l)),
          allowMissingColumns = true)
      }
    derived(g, g.nodes.unionByName(rows, allowMissingColumns = true), g.edges,
      byLabel)
  }

  /** CREATE edges — nodes (and the label index) are untouched. */
  def createEdges(g: PropertyGraph, rows: DataFrame): PropertyGraph =
    derived(g, g.nodes, g.edges.unionByName(rows, allowMissingColumns = true),
      g.byLabel)

  /** MERGE nodes by id (reference `operator.rs:7304-7424`):
    * existing nodes whose id appears in `incoming` get `onMatchSet` applied;
    * incoming rows whose id is absent are appended after `onCreateSet`. */
  def mergeNodes(g: PropertyGraph, incoming: DataFrame,
                 onCreateSet: Map[String, Column] = Map.empty,
                 onMatchSet: Map[String, Column] = Map.empty): PropertyGraph = {
    // ONE full-outer join, embedding g.nodes ONCE. The previous
    // anti/semi/anti three-way split embedded it three times, so CHAINED
    // merges grew plan text ~3^k (the write-chain lineage pathology —
    // WriteChainSpec); it also probed the incoming key set three times
    // where one pass suffices. ON CREATE values read the INCOMING row, so
    // applying them to every incoming row up front is equivalent (they are
    // only kept where the id turns out absent); ON MATCH values read the
    // EXISTING node columns, which stay unprefixed in the joined frame.
    val incPrepped = applySet(incoming.dropDuplicates("id"), lit(true), onCreateSet)
    checkUnique(g, incPrepped.join(g.nodes.select(col("id")), Seq("id"), "left_anti"))
    val inc = incPrepped.select(incPrepped.columns.map(c => col(c).as(s"_in_$c")): _*)
    val joined = g.nodes.join(inc, col("id") === col(s"_in_id"), "full_outer")
    val isNew = col("id").isNull
    val isMatched = col("id").isNotNull && col("_in_id").isNotNull
    val nodeCols = g.nodes.columns
    val nodeTypes = g.nodes.schema.fields.map(f => f.name -> f.dataType).toMap
    val incCols = incPrepped.columns.toSet
    val incOnly = incPrepped.columns.filterNot(nodeCols.contains)
    val matchOnly = onMatchSet.keys
      .filterNot(k => nodeCols.contains(k) || incCols.contains(k)).toSeq.sorted
    val merged = joined.select((
      nodeCols.map { c =>
        val kept = onMatchSet.get(c)
          .map(v => when(isMatched, v).otherwise(col(c))).getOrElse(col(c))
        val fresh =
          if (incCols.contains(c)) col(s"_in_$c") else lit(null).cast(nodeTypes(c))
        when(isNew, fresh).otherwise(kept).as(c)
      } ++
      // incoming-only columns: created rows carry their value, matched rows
      // take an ON MATCH value when one is assigned, untouched rows -> NULL
      incOnly.map { c =>
        onMatchSet.get(c)
          .map(v => when(isNew, col(s"_in_$c")).when(isMatched, v))
          .getOrElse(when(isNew, col(s"_in_$c"))).as(c)
      } ++
      // ON MATCH SET of a key neither side carries appends it (schema-free)
      matchOnly.map(k => when(isMatched, onMatchSet(k)).as(k))): _*)
    // ON MATCH SET can rewrite a constrained property on existing nodes —
    // guard the update like the insert (reference check_unique_constraint
    // guards index updates too)
    checkUniqueAfterSet(g, merged, onMatchSet.keySet)
    derived(g, merged, g.edges)
  }

  /** DELETE nodes by id set; DETACH also removes incident edges
    * (reference `operator.rs:7023-7089` — plain DELETE on a connected node is
    * an error there; here `detach=false` simply leaves the edges). */
  def deleteNodes(g: PropertyGraph, ids: DataFrame, detach: Boolean = true): PropertyGraph = {
    val idc = ids.select(ids.columns.head).toDF("id").distinct()
    val n = g.nodes.join(idc, Seq("id"), "left_anti")
    val e =
      if (!detach) g.edges
      else g.edges
        .join(idc.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(idc.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
    // label index stays valid under deletion: same anti-join per label table
    derived(g, n, e,
      g.byLabel.map { case (l, df) => l -> df.join(idc, Seq("id"), "left_anti") })
  }

  /** DELETE edges by id set — nodes (and the label index) are untouched. */
  def deleteEdges(g: PropertyGraph, ids: DataFrame): PropertyGraph =
    derived(g, g.nodes,
      g.edges.join(ids.select(ids.columns.head).toDF("id").distinct(), Seq("id"), "left_anti"),
      g.byLabel)

  /** SET node properties where `pred` holds (reference `operator.rs:7090-7228`).
    * All assignments are applied in one projection, so they observe the
    * PRE-update values (statement semantics, not sequential withColumn). */
  def setNodeProps(g: PropertyGraph, pred: Column,
                   assigns: Map[String, Column]): PropertyGraph = {
    val updated = applySet(g.nodes, pred, assigns)
    checkUniqueAfterSet(g, updated, assigns.keySet)
    derived(g, updated, g.edges)
  }

  /** SET edge properties where `pred` holds. */
  def setEdgeProps(g: PropertyGraph, pred: Column,
                   assigns: Map[String, Column]): PropertyGraph =
    derived(g, g.nodes, applySet(g.edges, pred, assigns))

  /** REMOVE node properties where `pred` holds — NULL of the column's type. */
  def removeNodeProps(g: PropertyGraph, pred: Column, keys: Seq[String]): PropertyGraph = {
    val types = g.nodes.schema.fields.map(f => f.name -> f.dataType).toMap
    // REMOVE of a property no node carries is a no-op (Cypher: removing an
    // absent property succeeds silently), not a lookup failure
    setNodeProps(g, pred,
      keys.filter(types.contains).map(k => k -> lit(null).cast(types(k))).toMap)
  }

  /** SET node properties on the id set given as a DATAFRAME — the scale-safe
    * twin of the `pred` overload for MATCH-derived targets: a left join +
    * conditional overwrite instead of collecting ids to the driver and
    * inlining an `isin` (which at scale is both an OOM and a giant plan). */
  def setNodePropsByIds(g: PropertyGraph, ids: DataFrame,
                        assigns: Map[String, Column]): PropertyGraph = {
    val updated = applySetByIds(g.nodes, ids, assigns)
    checkUniqueAfterSet(g, updated, assigns.keySet)
    derived(g, updated, g.edges)
  }

  /** SET edge properties on an id-set DataFrame (join-based, scale-safe). */
  def setEdgePropsByIds(g: PropertyGraph, ids: DataFrame,
                        assigns: Map[String, Column]): PropertyGraph =
    derived(g, g.nodes, applySetByIds(g.edges, ids, assigns))

  /** REMOVE node properties on an id-set DataFrame — typed NULL overwrite. */
  def removeNodePropsByIds(g: PropertyGraph, ids: DataFrame, keys: Seq[String]): PropertyGraph = {
    val types = g.nodes.schema.fields.map(f => f.name -> f.dataType).toMap
    // absent properties: silent no-op (Cypher REMOVE semantics)
    setNodePropsByIds(g, ids, keys.filter(types.contains)
      .map(k => k -> lit(null).cast(types(k))).toMap)
  }

  /** REMOVE edge properties on an id-set DataFrame — typed NULL overwrite. */
  def removeEdgePropsByIds(g: PropertyGraph, ids: DataFrame, keys: Seq[String]): PropertyGraph = {
    val types = g.edges.schema.fields.map(f => f.name -> f.dataType).toMap
    // absent properties: silent no-op (Cypher REMOVE semantics)
    setEdgePropsByIds(g, ids, keys.filter(types.contains)
      .map(k => k -> lit(null).cast(types(k))).toMap)
  }

  /** SET one node property to PER-ID values: `values` is (id, value) rows.
    * Nodes absent from `values` keep their current value (NULL when the
    * property is new — schema-free semantics). Unlike [[setNodePropsByIds]],
    * which overwrites existing columns with one shared expression, this adds
    * the column when it doesn't exist yet. One left join — partition-parallel,
    * broadcastable when the value set is small. */
  def setNodePropValues(g: PropertyGraph, values: DataFrame, prop: String): PropertyGraph = {
    val v = values.toDF("_vid", "_vval")
    val joined = g.nodes.join(v, col("id") === col("_vid"), "left")
    val base = g.nodes.columns
    val cols =
      if (base.contains(prop))
        base.map(c => if (c == prop) coalesce(col("_vval"), col(c)).as(c) else col(c))
      else base.map(col) :+ col("_vval").as(prop)
    val updated = joined.select(cols.toIndexedSeq: _*)
    checkUniqueAfterSet(g, updated, Set(prop))
    derived(g, updated, g.edges)
  }

  /** SET n:Label / REMOVE n:Label on an id-set DataFrame — array_union /
    * array_remove on the multi-label column (reference `cypher.pest:56-57`;
    * nodes may carry multiple labels, `node.rs:107`). */
  def setNodeLabelByIds(g: PropertyGraph, ids: DataFrame, label: String,
                        add: Boolean): PropertyGraph = {
    val newLabels =
      if (add) array_union(col("labels"), array(lit(label)))
      else array_remove(col("labels"), label)
    setNodePropsByIds(g, ids, Map("labels" -> newLabels))
  }

  /** Mutations derive a NEW graph: the stats key is dropped (stale after a
    * write) but registered constraints carry over. The per-label index is
    * carried ONLY where the caller proves it stays consistent (append /
    * delete, which pass the maintained map); SET/MERGE-style mutations
    * rewrite node rows in place, so their label tables would go stale —
    * they keep the default and fall back to the pushable predicate. */
  private def derived(g: PropertyGraph, n: DataFrame, e: DataFrame,
                      byLabel: Map[String, DataFrame] = Map.empty): PropertyGraph =
    PropertyGraph(n, e, byLabel = byLabel, constraints = g.constraints)

  /** Unique-constraint check before node insert (reference
    * `src/index/manager.rs:117-126` check_unique_constraint): for every
    * registered (label, property) the incoming rows carry, fail loudly when
    * a value already exists on a node of that label or is duplicated within
    * the batch itself. One semi-join + one aggregate per applicable
    * constraint — nothing runs when no constraint matches the batch. */
  private def checkUnique(g: PropertyGraph, rows: DataFrame): Unit =
    g.constraints.foreach { case (label, prop) =>
      if (rows.columns.contains(prop) && rows.columns.contains("labels")) {
        val incoming = rows
          .filter(array_contains(col("labels"), label) && col(prop).isNotNull)
          .select(col(prop).as("_v"))
        val existing = g.nodesWithLabel(label)
          .filter(col(prop).isNotNull).select(col(prop).as("_v"))
        val clash = incoming.join(existing, Seq("_v"), "left_semi")
          .unionAll(incoming.groupBy(col("_v")).agg(count(lit(1)).as("_n"))
            .filter(col("_n") > 1).select(col("_v")))
          .limit(1).collect()
        if (clash.nonEmpty) throw new IllegalStateException(
          s"unique constraint violation: :$label($prop) already has value '${clash.head.get(0)}'")
      }
    }

  /** Unique-constraint check after a SET-style update (reference
    * `index/manager.rs` guards index UPDATES as well as inserts): when an
    * update touches a constrained property — or the labels column, which can
    * move a node INTO a constrained label — verify the updated table has no
    * duplicate non-null value for that (label, property). One aggregate per
    * affected constraint; a no-op whenever no constraint is touched (the
    * common case: the constraint set is empty). */
  private[graft] def checkUniqueAfterSet(g: PropertyGraph, updated: DataFrame,
                                         touched: Set[String]): Unit =
    g.constraints.foreach { case (label, prop) =>
      if ((touched.contains(prop) || touched.contains("labels")) &&
          updated.columns.contains(prop) && updated.columns.contains("labels")) {
        val dup = updated
          .filter(array_contains(col("labels"), label) && col(prop).isNotNull)
          .groupBy(col(prop)).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > 1).limit(1).collect()
        if (dup.nonEmpty) throw new IllegalStateException(
          s"unique constraint violation: update would duplicate :$label($prop) " +
            s"value '${dup.head.get(0)}'")
      }
    }

  /** One-projection conditional overwrite. Assignments to keys the frame
    * does not yet carry APPEND the column (NULL where the predicate is
    * false) — Cypher's schema-free SET semantics; dropping them silently
    * loses writes. New keys appended in sorted order for plan determinism. */
  private def applySet(df: DataFrame, pred: Column, assigns: Map[String, Column]): DataFrame =
    if (assigns.isEmpty) df
    else {
      val newKeys = assigns.keys.filterNot(df.columns.contains).toSeq.sorted
      df.select((df.columns.map(c =>
        assigns.get(c).map(v => when(pred, v).otherwise(col(c)).as(c)).getOrElse(col(c))) ++
        newKeys.map(k => when(pred, assigns(k)).as(k))): _*)
    }

  private def applySetByIds(df: DataFrame, ids: DataFrame, assigns: Map[String, Column]): DataFrame =
    if (assigns.isEmpty) df
    else {
      val idc = ids.select(ids.columns.head).toDF("_mid").distinct()
        .withColumn("_hit", lit(true))
      val newKeys = assigns.keys.filterNot(df.columns.contains).toSeq.sorted
      df.join(idc, col("id") === col("_mid"), "left")
        .select((df.columns.map(c =>
          assigns.get(c).map(v => when(col("_hit"), v).otherwise(col(c)).as(c)).getOrElse(col(c))) ++
          newKeys.map(k => when(col("_hit"), assigns(k)).as(k))): _*)
    }
}
