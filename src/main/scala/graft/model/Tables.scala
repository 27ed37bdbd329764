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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
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
