package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver testdata layout
  * (sfDir/name.parquet, see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Plan memo per (session, dir, table): a DataFrame is an immutable plan,
  // and rebuilding one costs a parquet footer read + analysis (~10-30 ms)
  // that every catalog query would otherwise pay per table. Data is NOT
  // cached — only the plan object is reused.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((System.identityHashCode(spark), dir, name),
      _ => build(spark, dir, name))

  private def build(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // raw long (spark.sql.legacy.parquet.nanosAsLong=true, set by our
    // session builders) — normalize to a µs-precision NTZ timestamp here so
    // every downstream operator sees a real timestamp column.
    if (name == "events" && df.schema.fields.exists(f =>
        f.name == "ts" && f.dataType == LongType)) {
      // integer `div`, NOT `/`: epoch-nanos ≈ 1.7e18 loses precision as a
      // double, shifting timestamps by hundreds of ns
      df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    } else df
  }

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB-oracle naming. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
