package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline diagnostics (beyond-parity): the checks an engineer runs
  * BEFORE a 100 TB job, expressed as cheap aggregates over the same data.
  */
object Diagnostics {

  /** Join/aggregation key-skew report: the top-`k` heaviest keys with
    * their share of all rows, plus the global key count — the diagnostic
    * that decides between a plain shuffle join, a broadcast, and salting
    * (a key with share ≫ 1/parallelism will strangle its reducer at any
    * cluster size).
    *
    * Plan: ONE map-side-combined hash aggregate for per-key counts, a
    * broadcast 1-row total, TakeOrderedAndProject for the top-k (no
    * global sort); the k-row window ranks only the survivors. Returns
    * (key, cnt, share, n_keys, rank). */
  def keySkewReport(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.select(key.as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).cast("double").as("__t"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        graft.functions.CypherFunctions.roundC(
          col("cnt") / col("__t"), 6).as("share"),
        col("n_keys"))
      .orderBy(col("cnt").desc, col("key")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("key"))).cast("long"))
      // explicit output order: the contract must not depend on the window
      // sort incidentally surviving into the returned DataFrame
      .orderBy(col("rank"))
  }
}
