package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT frequency heavy hitters ("what's above s·n?") with bounded memory
  * at any cardinality — the two-pass Misra–Gries discipline:
  *
  *   pass 1: each partition maintains a k-counter Misra–Gries summary
  *           (k ≈ 2/s) — bounded state, NO shuffle, sequential in-task
  *           scan. MG guarantee per partition: any item with local count
  *           > n_p/(k+1) survives; by pigeonhole some partition holds the
  *           item at ≥ its global share, so every item with global share
  *           ≥ s is in the merged candidate set (k+1 > 1/s).
  *   pass 2: EXACT recount of the candidates only — the full aggregate is
  *           semi-join-pruned to ≤ k·partitions keys — then filter
  *           freq ≥ s·n.
  *
  * The output is exact and partition-layout-independent (the sketch only
  * PRUNES; a layout change can add false candidates, never drop a true
  * heavy hitter, and pass 2 removes the impostors) — so local, cluster,
  * and the SQL oracle all agree cell-for-cell. This is the 100 TB answer
  * to "top tokens over a corpus": a plain groupBy materializes the full
  * token cardinality through a shuffle; this shuffles ≤ k keys per
  * partition. mapPartitions is the honest shape for pass 1 — MG is
  * inherently sequential bounded-state per split, and a declarative
  * aggregate would BE the full-cardinality hash MG exists to avoid. */
object HeavyHitters {

  /** Items of `valueCol` (cast to string, nulls dropped) with frequency
    * ≥ minShare·n. Returns (valueCol, freq, share) rows, share rounded
    * to 6. */
  def heavyHitters(df: DataFrame, valueCol: String, minShare: Double): DataFrame = {
    require(minShare > 0 && minShare < 1, s"minShare in (0,1), got $minShare")
    val k = math.max(8, math.ceil(2.0 / minShare).toInt)
    val vals = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint(true) // consumed by pass 1, pass 2, and the n scalar
    import vals.sparkSession.implicits._
    val cand = vals.as[String].mapPartitions { it =>
      val m = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { v =>
        if (m.contains(v) || m.size < k) m.update(v, m.getOrElse(v, 0L) + 1L)
        else { // full and v unseen: the MG decrement-all step (v dropped)
          m.mapValuesInPlace((_, c) => c - 1L)
          m.filterInPlace((_, c) => c > 0L)
        }
      }
      m.keysIterator
    }.toDF("v").distinct()
    val n1 = vals.agg(count(lit(1)).as("__n"))
    vals.join(cand, Seq("v"), "left_semi")
      .groupBy(col("v")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(n1))
      .filter(col("freq") >= col("__n") * minShare)
      .select(col("v").as(valueCol), col("freq"),
        graft.functions.CypherFunctions.roundC(
          col("freq").cast("double") / col("__n"), 6).as("share"))
  }
}
