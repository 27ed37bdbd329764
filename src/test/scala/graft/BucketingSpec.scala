package graft

import graft.model.PropertyGraph
import graft.sources.BucketedGraph
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Plan-level proof that the bucketed layout removes the traversal-join
  * shuffle: with both tables bucketed on the join key, the physical plan
  * for the expand shape (edges.src == nodes.id) contains ZERO
  * ShuffleExchange operators, while the same join over unbucketed frames
  * shuffles both sides. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  /** Count shuffle exchanges in the FINAL physical plan — under AQE the
    * exchanges live inside the adaptive plan's materialized query stages,
    * not in the outer executedPlan wrapper. */
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case q: ShuffleQueryStageExec => q
      case e: ShuffleExchangeLike => e
    }.size
  }

  test("bucketed nodes-edges join plans with zero Exchange") {
    val g = PropertyGraph(
      (1L to 200L).map(i => (i, Seq("P"), s"n$i")).toDF("id", "labels", "name"),
      (1L until 200L).map(i => (i + 1000, i, i + 1, "R")).toDF("id", "src", "dst", "relationship"))
    BucketedGraph.save(g, "bspec", 4)
    val loaded = BucketedGraph.load(spark, "bspec")

    // broadcast would hide the question; force the shuffle-or-not decision
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = loaded.edges.drop("id")
        .join(loaded.nodes, col("src") === col("id"))
      bucketed.count() // materialize under AQE so executedPlan is final
      assert(exchanges(bucketed) == 0,
        s"bucketed join must not shuffle:\n${bucketed.queryExecution.executedPlan}")

      // control: the same shape over MULTI-partition unbucketed frames must
      // shuffle (a 1-partition LocalTableScan join needs no exchange, which
      // would vacuously pass — use spark.range with 3 partitions)
      val en = spark.range(1, 200, 1, 3)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val nn = spark.range(1, 201, 1, 3).toDF("id")
      val plain = en.join(nn, col("src") === col("id"))
      plain.count()
      assert(exchanges(plain) > 0, "control: the unbucketed join should shuffle")

      // both joins produce the full 199-edge match
      assert(bucketed.count() == 199L && plain.count() == 199L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("2-hop expand over bucketed graph never shuffles the edge table") {
    val g = PropertyGraph(
      (1L to 300L).map(i => (i, Seq(if (i <= 100) "A" else "B"), s"n$i"))
        .toDF("id", "labels", "name"),
      (1L to 100L).flatMap(i => Seq(
        (i + 1000, i, i + 100, "R1"), (i + 2000, i + 100, i + 200, "R2")))
        .toDF("id", "src", "dst", "relationship"))
    BucketedGraph.save(g, "bspec2", 4)
    val loaded = BucketedGraph.load(spark, "bspec2")

    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the q_expand_2hop_bucketed shape: frontier -> hop1 -> hop2 -> agg
      val c = loaded.nodesWithLabel("A").select(col("id").as("cid"))
      val h1 = graft.operators.Traversals.expand(loaded, c, "cid", Seq("R1"))
        .select(col("cid"), col("_nbr").as("oid"))
      val out = graft.operators.Traversals.expand(loaded, h1, "oid", Seq("R2"))
        .groupBy(col("cid")).agg(count(lit(1)).as("n"))
      assert(out.count() == 100L)

      // no ShuffleExchange may sit ABOVE a scan of the bucketed edge table:
      // the 100 TB side must be consumed in its stored distribution; only
      // the frontier is allowed to move
      val plan = out.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // walk stops at binary nodes: a join's OUTPUT is a derived frontier
      // (fine to move); what must never happen is Exchange →
      // (unary ops)* → edge-table scan, i.e. re-partitioning the raw table
      def scansEdges(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.tableIdentifier.exists(_.table == "bspec2_edges")
        case b if b.children.length > 1 => false
        case u => u.children.exists(scansEdges)
      }
      val shuffledEdgeScans = plan.collect {
        case q: ShuffleQueryStageExec if scansEdges(q.plan) => q
        case e: ShuffleExchangeLike if scansEdges(e.child) => e
      }
      assert(shuffledEdgeScans.isEmpty,
        s"edge-table scan found under a shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("reverse expansion over the dst-bucketed copy plans with zero Exchange") {
    val g = PropertyGraph(
      (1L to 200L).map(i => (i, Seq("P"), s"n$i")).toDF("id", "labels", "name"),
      (1L until 200L).map(i => (i + 1000, i, i + 1, "R")).toDF("id", "src", "dst", "relationship"))
    BucketedGraph.saveWithReverse(g, "bspec3", 4)
    val rev = BucketedGraph.loadReverse(spark, "bspec3")

    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // Direction.In keys the join on dst — the reverse table's bucket column
      val bound = rev.nodes.select(col("id"))
      val in = graft.operators.Traversals.expand(rev, bound, "id",
        Seq("R"), graft.operators.Direction.In)
      assert(in.count() == 199L)
      assert(exchanges(in) == 0,
        s"reverse bucketed expand must not shuffle:\n${in.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
