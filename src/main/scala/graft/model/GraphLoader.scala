package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the canonical PropertyGraph from data sources.
  *
  * The main projection turns the driver's TPC-H-ish testdata into a graph
  * (FIXTURES.md §6): customers place orders, orders contain lineitems,
  * lineitems reference parts/suppliers, customers/suppliers live in nations,
  * nations in regions — giving the same multi-hop / aggregation shapes as the
  * reference's LDBC fixtures (`benches/ldbc_common/mod.rs:460-628`).
  *
  * Node-id spaces are disjoint by construction via fixed offsets; the DuckDB
  * oracle SQL reproduces the identical arithmetic, so ids compare exactly.
  */
object GraphLoader {

  // Fixed id-space offsets (documented in oracle SQL too — keep in sync).
  val OrderOff: Long    = 10000000L
  val LineOff: Long     = 100000000L   // lineitem id = LineOff + l_orderkey*8 + l_linenumber
  val PartOff: Long     = 1000000000L
  val SuppOff: Long     = 1100000000L
  val NationOff: Long   = 1200000000L
  val RegionOff: Long   = 1300000000L

  // Graph memo per (session, dir): PropertyGraph is immutable (mutations
  // derive NEW graphs), so the union/byLabel PLAN objects are safe to share
  // across catalog queries — rebuilding them costs ~100 ms of plan
  // construction + analysis per query. No data is cached.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), PropertyGraph]()

  /** TPC-H star schema → property graph. */
  def tpch(spark: SparkSession, dir: String): PropertyGraph =
    memo.computeIfAbsent((System.identityHashCode(spark), dir),
      _ => tpchBuild(spark, dir))

  private def tpchBuild(spark: SparkSession, dir: String): PropertyGraph = {
    val cust = Tables(spark, dir, "customer")
    val ord  = Tables(spark, dir, "orders")
    val li   = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    val supp = Tables(spark, dir, "supplier")
    val nat  = Tables(spark, dir, "nation")
    val reg  = Tables(spark, dir, "region")

    val lineId = (lit(LineOff) + col("l_orderkey") * 8 + col("l_linenumber")).cast("long")

    // Per-label node tables — kept individually (the columnar label index,
    // reference `store.rs:558`) so `MATCH (n:Label)` reads ONE table; the
    // all-nodes view below unions them for unlabeled patterns.
    val custNodes = cust.select(col("c_custkey").cast("long").as("id"),
      array(lit("Customer")).as("labels"), col("c_name").as("name"),
      col("c_acctbal").as("balance"))
    val ordNodes = ord.select((col("o_orderkey") + OrderOff).cast("long").as("id"),
      array(lit("Order")).as("labels"), col("o_orderstatus").as("name"),
      col("o_totalprice").as("balance"))
    val partNodes = part.select((col("p_partkey") + PartOff).cast("long").as("id"),
      array(lit("Part")).as("labels"), col("p_name").as("name"),
      col("p_retailprice").as("balance"))
    val suppNodes = supp.select((col("s_suppkey") + SuppOff).cast("long").as("id"),
      array(lit("Supplier")).as("labels"), col("s_name").as("name"),
      col("s_acctbal").as("balance"))
    val natNodes = nat.select((col("n_nationkey") + NationOff).cast("long").as("id"),
      array(lit("Nation")).as("labels"), col("n_name").as("name"),
      lit(null).cast("double").as("balance"))
    val regNodes = reg.select((col("r_regionkey") + RegionOff).cast("long").as("id"),
      array(lit("Region")).as("labels"), col("r_name").as("name"),
      lit(null).cast("double").as("balance"))
    // lineitem nodes: (l_orderkey, l_linenumber) is NOT unique in the
    // testdata so ids collide — constant props keep the id-dedup
    // deterministic
    val liNodes = li.select(lineId.as("id"),
      array(lit("Lineitem")).as("labels"), lit(null).cast("string").as("name"),
      lit(null).cast("double").as("balance")).dropDuplicates("id")

    val byLabel = Map(
      "Customer" -> custNodes, "Order" -> ordNodes, "Part" -> partNodes,
      "Supplier" -> suppNodes, "Nation" -> natNodes, "Region" -> regNodes,
      "Lineitem" -> liNodes)

    val nodes = custNodes
      .unionByName(ordNodes).unionByName(partNodes).unionByName(suppNodes)
      .unionByName(natNodes).unionByName(regNodes).unionByName(liNodes)

    val edges =
      ord.select((col("o_orderkey") + OrderOff).cast("long").as("id"),
          col("o_custkey").cast("long").as("src"),
          (col("o_orderkey") + OrderOff).cast("long").as("dst"),
          lit("PLACED").as("relationship"), lit(null).cast("double").as("weight"))
      .unionByName(li.select(lineId.as("id"),
          (col("l_orderkey") + OrderOff).cast("long").as("src"),
          lineId.as("dst"),
          lit("CONTAINS").as("relationship"), col("l_quantity").as("weight")))
      .unionByName(li.select((lineId + 2000000000L).as("id"),
          lineId.as("src"),
          (col("l_partkey") + PartOff).cast("long").as("dst"),
          lit("HAS_PART").as("relationship"), col("l_extendedprice").as("weight")))
      .unionByName(li.select((lineId + 4000000000L).as("id"),
          lineId.as("src"),
          (col("l_suppkey") + SuppOff).cast("long").as("dst"),
          lit("SUPPLIED_BY").as("relationship"), lit(null).cast("double").as("weight")))
      .unionByName(cust.select((col("c_custkey") + 6000000000L).cast("long").as("id"),
          col("c_custkey").cast("long").as("src"),
          (col("c_nationkey") + NationOff).cast("long").as("dst"),
          lit("IN_NATION").as("relationship"), lit(null).cast("double").as("weight")))
      .unionByName(supp.select((col("s_suppkey") + 6100000000L).cast("long").as("id"),
          (col("s_suppkey") + SuppOff).cast("long").as("src"),
          (col("s_nationkey") + NationOff).cast("long").as("dst"),
          lit("IN_NATION").as("relationship"), lit(null).cast("double").as("weight")))
      .unionByName(nat.select((col("n_nationkey") + 6200000000L).cast("long").as("id"),
          (col("n_nationkey") + NationOff).cast("long").as("src"),
          (col("n_regionkey") + RegionOff).cast("long").as("dst"),
          lit("IN_REGION").as("relationship"), lit(null).cast("double").as("weight")))

    // Materialize the all-nodes and edge tables ONCE per dataset as
    // content-fingerprinted parquet MVs (graft.model.SharedMv): the union
    // projection above re-reads lineitem THREE times and re-derives ~2M id
    // rows in every traversal query, and the in-task kernel gate then has
    // to materialize+count it per query. A graph engine's native storage
    // IS this materialized edge list (the reference persists CSR the same
    // way); consumers read one columnar leaf with real size stats, so the
    // kernel gate decides from the estimate alone. Per-label node tables
    // (byLabel) intentionally stay as direct source scans — label scans
    // keep their pushed filters.
    val srcTables = Seq("customer", "orders", "lineitem", "part",
      "supplier", "nation", "region")
    // logicVersion MUST be bumped whenever the node/edge derivation above
    // changes (id offsets, edge types, property projections): the MV
    // fingerprint can only see source-file metadata, not this code
    val gv = "graph-v2" // v2: edge MV hive-partitioned by relationship
    val nodesMv = SharedMv(spark, dir, srcTables, "graph_nodes", gv)(nodes)
    // edges partitioned by relationship: every expand/edgesOfType scan
    // prunes to its type's directories instead of filtering the full MV —
    // the reference's edge_type index as storage layout. Pre-repartition
    // on (relationship, hash bucket) so each type lands in a few files.
    val edgesMv = SharedMv(spark, dir, srcTables, "graph_edges", gv,
      partitionCols = Seq("relationship"))(
      edges.repartition(col("relationship"), pmod(hash(col("id")), lit(4))))
    PropertyGraph(nodesMv, edgesMv, byLabel, statsKey = Some(s"tpch:$dir"))
  }

  /** Generic CSV loader into the canonical layout (reference CSV bulk load,
    * `benches/ldbc_common/mod.rs:50-143`): expects node files with
    * (id, labels?, props…) and edge files with (id, src, dst, relationship, props…). */
  def fromCsv(spark: SparkSession, nodesPath: String, edgesPath: String,
              delimiter: String = "|"): PropertyGraph = {
    def read(p: String) = spark.read
      .option("header", "true").option("delimiter", delimiter)
      .option("inferSchema", "true").csv(p)
    val n0 = read(nodesPath)
    val n = if (n0.columns.contains("labels"))
      n0.withColumn("labels", split(col("labels"), ";")) else n0
    PropertyGraph(n, read(edgesPath))
  }

  /** JSON-lines snapshot loader — the reference's `.sgsnap` format is
    * gzip JSON-lines of node/edge objects (`src/snapshot/mod.rs:30-95`);
    * Spark reads .json.gz transparently. */
  def fromJsonSnapshot(spark: SparkSession, nodesPath: String, edgesPath: String): PropertyGraph =
    PropertyGraph(spark.read.json(nodesPath), spark.read.json(edgesPath))

  /** Snapshot EXPORT sink (reference `src/snapshot/mod.rs:226-257` export):
    * gzip JSON-lines of node / edge objects, written distributedly (one file
    * per partition — at 100 TB a single-stream export would serialize the
    * world through the driver; a directory of part files is the scalable
    * inverse of the loader above, which globs transparently). Round-trips
    * through `fromJsonSnapshot`. */
  def toJsonSnapshot(g: PropertyGraph, nodesPath: String, edgesPath: String): Unit = {
    g.nodes.write.mode("overwrite").option("compression", "gzip").json(nodesPath)
    g.edges.write.mode("overwrite").option("compression", "gzip").json(edgesPath)
  }
}
