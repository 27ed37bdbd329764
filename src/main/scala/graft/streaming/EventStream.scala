package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming engine (SURVEY.md §2.13) — this is the
  * beyond-parity extension: the same transforms run identically on a batch
  * DataFrame or a readStream source, so each op takes a plain DataFrame.
  */
object EventStream {

  /** File-source stream over a directory of event parquet. The testdata's
    * ts column is TIMESTAMP(NANOS) which Spark reads as a raw long (with
    * spark.sql.legacy.parquet.nanosAsLong=true) — normalized here to a real
    * timestamp so watermarks/windows work. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-source streams take a DIRECTORY. The fixture ships events.parquet
    // as a single FILE (stream the parent dir, glob-filtered to that name);
    // Spark-written datasets (e.g. ScaleData's soak fixtures) make it a
    // DIRECTORY of part files (stream the directory itself — the name glob
    // would match zero part files and silently yield an empty stream).
    // Probe via the Hadoop FileSystem API, not java.io.File: a
    // scheme-qualified dir (file:, hdfs:, s3a:) is not a local path, and a
    // java.io probe would return false for a directory-shaped dataset on
    // those filesystems — falling into the glob branch, which matches zero
    // part files and silently yields an empty stream.
    val evPath = new org.apache.hadoop.fs.Path(dir, "events.parquet")
    val isDir = try {
      evPath.getFileSystem(spark.sessionState.newHadoopConf())
        .getFileStatus(evPath).isDirectory
    } catch { case _: java.io.FileNotFoundException => false }
    val raw =
      if (isDir)
        spark.readStream.schema(schema).parquet(evPath.toString)
      else
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
    // NOTE: kept as TIMESTAMP (with zone) — withWatermark rejects NTZ.
    val tsType = schema.fields.find(_.name == "ts").map(_.dataType)
    tsType match {
      case Some(org.apache.spark.sql.types.LongType) =>
        // TIMESTAMP(NANOS) read as raw long (nanosAsLong=true)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // timestamp[us] parquet reads as NTZ; session TZ is pinned UTC so the
        // cast re-tags the same instant and withWatermark accepts it
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling-window counts/sums per event_type with a watermark for state
    * eviction — at scale, state is bounded by (#types × windows in the
    * watermark horizon). */
  /** File-source stream over the documents table (same directory/file
    * probe as [[readEvents]] — a Spark-written dataset is a DIRECTORY of
    * part files, the fixture a single FILE). Documents carry no event
    * time, so consumers must stay STATELESS (projections + stream-static
    * joins) for append mode. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val p = new org.apache.hadoop.fs.Path(dir, "documents.parquet")
    val isDir = try {
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .getFileStatus(p).isDirectory
    } catch { case _: java.io.FileNotFoundException => false }
    if (isDir) spark.readStream.schema(schema).parquet(p.toString)
    else spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** Streaming benchmark decontamination: every INCOMING document is
    * checked against the (static, tiny) eval-probe shingle sets as it
    * arrives — the ingestion-time twin of
    * [[graft.dedup.Dedup.contaminationReport]], with identical output.
    *
    * Deliberately STATELESS so plain append mode works with no watermark:
    * the probe side is a broadcast static table of (probe, shingle ARRAY)
    * rows, the stream side computes its own shingle array per row, and
    * n_hits = size(array_intersect(...)) is a PROJECTION over the
    * stream-static cross join — |probes| comparisons per incoming doc,
    * no streaming aggregation, no state store. array_intersect counts
    * distinct shared shingles, matching the batch report's
    * count(DISTINCT) semantics. */
  def contaminationStream(docs: DataFrame, probes: DataFrame, idCol: String,
                          textCol: String, k: Int, minHits: Int = 1,
                          flagHits: Int = 3): DataFrame = {
    import graft.dedup.Dedup.wordShinglesFromWords
    // shingles are intersected as xxhash64 VALUES, not strings: the
    // per-pair intersect builds a probe set per (doc, probe) row, and
    // hashing 30-element long arrays beats 40-char string arrays ~4×.
    // xxhash64 is codegen'd and collision odds across a corpus's distinct
    // shingles are ~|shingles|²/2⁶⁵ (≈1e-12 here). A collision can perturb
    // n_hits in EITHER direction (two distinct shingles inside one
    // doc∩probe intersection collapse to one hash → deflate; a cross-side
    // collision → inflate) — the safety argument is the negligible
    // probability plus the oracle gate, not a one-sided bias.
    def sh(c: Column) =
      transform(wordShinglesFromWords(split(c, " "), k), s => xxhash64(s))
    val p = broadcast(probes.select(col(idCol).as("probe_id"),
      sh(col(textCol)).as("__ps")))
    // TWO repartition barriers, both load-bearing (r12 + r15 findings):
    // the SECOND is the materialization barrier that stops CollapseProject
    // folding the (interpreted, HOF) shingle build into the cross join's
    // output — without it the build re-runs once per (doc, probe) PAIR
    // instead of once per doc (r12 measured 8.8 s vs 5.4 s). The FIRST
    // distributes the RAW text before the build: a single-file stream
    // source is ONE input partition, so the r12 shape ran the whole
    // shingle build inside the 1-task scan stage (r15 stage trace: 3.5 s
    // single-task). Explicit numPartitions (REPARTITION_BY_NUM) on both:
    // Spark 4's streaming AQE coalesces by BYTE size and was fusing this
    // compute-bound, few-MB stage down to 1-2 tasks; the session's
    // shuffle-partition setting is the scale-tuned value, not a local
    // constant.
    // parse-with-fallback: some platforms set shuffle partitions to a
    // non-integer sentinel (e.g. "auto") — fall back to defaultParallelism
    val n = scala.util.Try(
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(docs.sparkSession.sparkContext.defaultParallelism)
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__txt"))
      .repartition(n, col("doc_id"))
      .select(col("doc_id"), sh(col("__txt")).as("__ds"))
      .repartition(n, col("doc_id"))
      .crossJoin(p)
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("doc_id"), col("probe_id"),
        size(array_intersect(col("__ds"), col("__ps"))).cast("long").as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .withColumn("contaminated", col("n_hits") >= flagHits)
  }

  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Exactly-once style dedup on event_id within the watermark horizon. */
  def dedupedEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  final case class SessionUpdate(user_id: Long, session_start: Long,
                                 session_end: Long, n_events: Long)
  final case class SessState(start: Long, end: Long, n: Long)

  /** Stateful sessionization: events of a user belong to one session while
    * gaps stay under `gapMs`. flatMapGroupsWithState = the custom-state
    * path; one open session per user lives in the executor state store. A
    * session is emitted when a later event closes it (gap exceeded) or when
    * the EVENT-TIME timeout fires — the watermark passing `end + gapMs`
    * proves no in-order event can extend it. Event-time (not processing-
    * time) timeout is the at-scale shape: state eviction is driven by data
    * progress, and an idle stream doesn't spin no-data batches. */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long,
                 watermarkDelay: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    // the watermarked ts column must survive projection — the event-time-
    // timeout check looks for it on the grouped input's schema
    val typed = events.withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"),
        (unix_micros(col("ts")) / 1000).cast("long").as("ts_ms"),
        col("ts")).as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            Iterator(SessionUpdate(user, s.start, s.end, s.n))
          } else {
            val ts = rows.map(_._2).toSeq.sorted
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[SessionUpdate]()
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs => cur = Some(SessState(s.start, t, s.n + 1))
                case Some(s) =>
                  out += SessionUpdate(user, s.start, s.end, s.n)
                  cur = Some(SessState(t, t, 1))
                case None => cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark proves the gap can't be beaten
              state.setTimeoutTimestamp(s.end + gapMs + 1)
            }
            out.iterator
          }
      }.toDF()
  }

  /** Stream-stream INTERVAL join: left-type events join right-type events of
    * the same user landing within `[left.ts, left.ts + horizon]`. Both sides
    * carry a watermark, so each side's join state is bounded by the horizon
    * — the at-scale shape for funnel/attribution joins (state per user ×
    * horizon, evicted as the watermark advances; no unbounded buffering).
    * Works identically on batch frames (watermark is a no-op there). */
  def intervalJoin(left: DataFrame, right: DataFrame, horizon: String): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      .withWatermark("l_ts", horizon)
    val r = right.select(col("user_id").as("_r_uid"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
      .withWatermark("r_ts", horizon)
    l.join(r, expr(s"user_id = _r_uid AND r_ts >= l_ts AND r_ts <= l_ts + interval $horizon"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("l_ts")) / 1000).cast("long").as("l_ms"),
        (unix_micros(col("r_ts")) / 1000).cast("long").as("r_ms"))
  }

  /** Batch-mode sessionization over the same data — window-function
    * formulation (session id = running count of gap-breaks per user). Used as
    * the oracle-checkable twin of the stateful stream version. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col("user_id"),
      (unix_micros(col("ts").cast("timestamp")) / 1000).cast("long").as("ts_ms"),
      col("event_id"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    base
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_sess",
        (col("prev_ts").isNull || (col("ts_ms") - col("prev_ts")) > gapMs).cast("int"))
      .withColumn("session_seq", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_ms")).as("session_start"), max(col("ts_ms")).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
