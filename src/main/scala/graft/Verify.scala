package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional 3rd+ args: restrict to these query names (local iteration)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is TIMESTAMP(NANOS) parquet — read as long, normalized
      // to a timestamp in graft.model.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bound GraphX Pregel lineage (scc) — dir set in Algorithms.scc
      .config("spark.graphx.pregel.checkpointInterval", "10")
      // iterative operators emit many AQE plan events; bound plan-string cost
      .config("spark.sql.maxPlanStringLength", "32768")
      .config("spark.ui.enabled", "false")
      // the SQL status store retains up to 1000 executions INCLUDING their
      // plan graphs — iterative queries produce huge plans, and across a
      // ~95-query suite the retained state becomes GBs of old-gen garbage
      // that makes late-suite queries 10-40x slower (GC-bound). Retain
      // almost nothing: this is a batch driver, not a UI server.
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      // see Bench: force periodic driver GC so the ContextCleaner actually
      // drains accumulated broadcast/checkpoint blocks during the suite
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CodegenTripwire.install() // fail loudly on silent interpreted fallback
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only.contains(q._1))
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries are independent — drop leftover cache/checkpoint blocks so
      // one query's persisted state never skews the next one's run
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // codegen tripwire: any ERROR CodeGenerator during the run means a
    // catalog query silently went interpreted — fail the whole dump
    if (CodegenTripwire.errors > 0) {
      System.err.println(s"[verify] CODEGEN TRIPWIRE: " +
        s"${CodegenTripwire.errors} compile failure(s); samples:")
      CodegenTripwire.sampleMessages.foreach(m => System.err.println("  " + m))
      spark.stop()
      sys.exit(2)
    }
    spark.stop()
  }
}
