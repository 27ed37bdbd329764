package graft

import graft.model.GraphLoader
import graft.operators.Traversals
import graft.queries.{CypherQueries, FinQueries, GraphQueries, LdbcBiQueries, LdbcQueries, LdbcUpdates, PipelineQueries, Relational, WriteQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage catalog: one entry per implemented
  * operator from SURVEY.md §2 (plus the beyond-parity data-pipeline surface),
  * each expressed through the graft library (model/operators/functions/algo/
  * vector/dedup/text/streaming). `oracleSql` carries the DuckDB-equivalent
  * SQL with matching column names/types for the driver's hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: two-hop graph expansion
    * (Customer -PLACED-> Order -CONTAINS-> Lineitem) with aggregation. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val g = GraphLoader.tpch(spark, d)
    val c = g.nodesWithLabel("Customer").select(col("id").as("cid"))
    val h1 = Traversals.expand(g, c, "cid", Seq("PLACED"))
      .select(col("cid"), col("_nbr").as("oid"))
    Traversals.expand(g, h1, "oid", Seq("CONTAINS"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("weight")), 2).as("total_qty"))
      .orderBy(col("cid"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ GraphQueries.defs ++ PipelineQueries.defs ++ CypherQueries.defs ++ LdbcQueries.defs ++ LdbcBiQueries.defs ++ LdbcUpdates.defs ++ FinQueries.defs ++
      WriteQueries.defs

  def oracleSql: Map[String, String] =
    Relational.oracles ++ GraphQueries.oracles ++ PipelineQueries.oracles ++
      CypherQueries.oracles ++ LdbcQueries.oracles ++ LdbcBiQueries.oracles ++ LdbcUpdates.oracles ++ FinQueries.oracles ++ WriteQueries.oracles
}
