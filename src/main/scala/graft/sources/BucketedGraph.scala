package graft.sources

import graft.model.PropertyGraph
import org.apache.spark.sql.SparkSession

/** Bucketed persistent layout for a property graph — the ingest-time
  * investment that removes the per-query shuffle at cluster scale.
  *
  * Every traversal join (`expand`, var-length, pattern hash joins) keys on
  * a node id: `edges.src == frontier.id`. On an unbucketed store each such
  * join shuffles BOTH sides every query — at 100 TB that shuffle IS the
  * query cost. Writing `nodes` bucketed by `id` and `edges` bucketed by
  * `src` (same bucket count) makes the join's required distribution a
  * property of the TABLE LAYOUT: Catalyst's `EnsureRequirements` sees
  * compatible `HashPartitioning(buckets)` on both sides and plans a
  * sort-merge or shuffled-hash join with ZERO Exchange operators — the
  * shuffle is paid once at ingest, amortized over every query after.
  * (The reference gets the analogous effect from its adjacency store:
  * `src/graph/store.rs` keeps per-node edge lists, so traversal never
  * re-partitions either.)
  *
  * A `dst`-bucketed edge copy serves reverse expansion the same way —
  * the classic space-for-shuffle trade a 100 TB deployment makes.
  *
  * Bucket-count sizing at scale: buckets ≈ total edge bytes / 256 MB,
  * rounded to a multiple of the executor count; at 100 TB that is ~400k
  * buckets, well within Spark's file-handling range when combined with
  * `spark.sql.files.maxPartitionBytes` coalescing on scan.
  */
object BucketedGraph {

  /** Persist the graph as bucketed+sorted parquet tables
    * `<name>_nodes` (bucketed by id) and `<name>_edges` (bucketed by src).
    * Sorting within buckets gives parquet min/max pruning on the id ranges
    * and makes the downstream sort-merge join's sort a no-op per bucket. */
  def save(g: PropertyGraph, name: String, buckets: Int): Unit = {
    val spark = g.nodes.sparkSession
    // managed-table overwrite: drop removes the previous files; a location
    // left by a PREVIOUS session is invisible to the in-memory catalog
    // (DROP IF EXISTS no-ops), so also delete the orphan directory — else
    // CTAS trips LOCATION_ALREADY_EXISTS
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq(s"${name}_nodes", s"${name}_edges").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(wh, t)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    g.nodes.write.format("parquet")
      .bucketBy(buckets, "id").sortBy("id")
      .mode("overwrite").saveAsTable(s"${name}_nodes")
    g.edges.write.format("parquet")
      .bucketBy(buckets, "src").sortBy("src")
      .mode("overwrite").saveAsTable(s"${name}_edges")
  }

  /** Also persist the dst-bucketed edge copy for reverse expansion — the
    * space-for-shuffle trade: incoming-edge traversals join on `dst`, and
    * only a copy bucketed on `dst` serves them exchange-free. Optional and
    * separate from [[save]] because the copy doubles edge storage. */
  def saveWithReverse(g: PropertyGraph, name: String, buckets: Int): Unit = {
    save(g, name, buckets)
    val spark = g.nodes.sparkSession
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val t = s"${name}_edges_rev"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = new org.apache.hadoop.fs.Path(wh, t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    g.edges.write.format("parquet")
      .bucketBy(buckets, "dst").sortBy("dst")
      .mode("overwrite").saveAsTable(t)
  }

  /** Load a graph persisted by [[save]]. Joins of `edges.src` against
    * `nodes.id` (the expand shape) require no Exchange — see
    * BucketingSpec for the plan-level proof. */
  def load(spark: SparkSession, name: String): PropertyGraph =
    PropertyGraph(spark.table(s"${name}_nodes"), spark.table(s"${name}_edges"))

  /** Load the REVERSE view (requires [[saveWithReverse]]): same nodes, but
    * the edge table is the dst-bucketed copy — `Direction.In` expansion
    * keys on `dst`, which is this table's bucket column, so reverse
    * traversal joins plan without shuffling the edge table either. */
  def loadReverse(spark: SparkSession, name: String): PropertyGraph =
    PropertyGraph(spark.table(s"${name}_nodes"), spark.table(s"${name}_edges_rev"))
}
