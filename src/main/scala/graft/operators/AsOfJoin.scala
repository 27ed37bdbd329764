package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the LATEST right row with
  * `right.ts <= left.ts` for the same key (the time-series "most recent
  * state at event time" join — market data, attribution, slowly-changing
  * dimensions).
  *
  * Spark-first formulation: instead of a per-row range probe (an O(n·m)
  * theta join), both sides are union-tagged and sorted once per key, and
  * the match is `last(payload, ignoreNulls)` over the running window — ONE
  * shuffle on the key, linear scan within each key partition, no join
  * explosion. This is the scalable shape at 100 TB: state rides along the
  * merged timeline rather than being re-searched per row.
  *
  * Ties: a right row at exactly left.ts matches (inclusive), implemented
  * by sorting the right side before the left at equal timestamps. Multiple
  * right rows at the same (key, ts) resolve to the last under
  * (`tieCol` ascending) — pass a unique column for determinism.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           key: String, ts: String, rightVals: Seq[String],
           tieCol: String): DataFrame = {
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(right.schema(tieCol).dataType),
      s"tieCol '$tieCol' must be an integral column (a non-numeric cast " +
        "would silently null every tie-break key)")
    val lcols = left.columns.toSeq
    val pSchema = right.select(rightVals.map(col): _*).schema
    val lSchema = left.select(lcols.map(col): _*).schema
    val l = left.select(col(key).as("__k"), col(ts).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__tie"),
      lit(null).cast(pSchema).as("__p"),
      struct(lcols.map(col): _*).as("__l"))
    // a null key or null timestamp can never satisfy right.ts <= left.ts
    // (SQL comparison semantics, and DuckDB ASOF agrees) — but nulls sort
    // FIRST ascending, where they'd pollute the running last(); drop them
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).as("__k"), col(ts).as("__t"),
        lit(0).as("__side"), col(tieCol).cast("long").as("__tie"),
        struct(rightVals.map(col): _*).as("__p"),
        lit(null).cast(org.apache.spark.sql.types.StructType(lSchema.fields)).as("__l"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lcols.map(c => col(s"__l.$c").as(c)) ++
        rightVals.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}
