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
}
