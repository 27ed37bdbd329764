package graft

// Scratch per-query profiler for the r15 optimization round: runs named
// catalog queries N times inside ONE JVM/session (min-of-N, count action —
// the bench's methodology) so cross-window machine noise cancels. Args:
//   runMain graft.QProbe q_a q_b ...
// Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_QPROBE_REPS.
import org.apache.spark.sql.SparkSession

object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QPROBE_REPS", "4").toInt
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graphx.pregel.checkpointInterval", "10")
      .config("spark.sql.maxPlanStringLength", "32768")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional conf overrides for routing experiments (e.g. kernel-gate
    // thresholds): SPARK_GRAFT_QPROBE_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_QPROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    // optional stage trace: SPARK_GRAFT_QPROBE_TRACE=1 prints every stage's
    // wall time + task count + callsite so per-query cost decomposes
    val trace = sys.env.get("SPARK_GRAFT_QPROBE_TRACE").contains("1")
    if (trace) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          println(f"[stage] ${ms.getOrElse(-1L)}%6d ms  ${si.numTasks}%4d tasks  ${si.name.take(110)}")
        }
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(js.jobId, js.time): Unit
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val ms = Option(jobStart.remove(je.jobId)).map(je.time - _).getOrElse(-1L)
          println(f"[job]   $ms%6d ms  job ${je.jobId}")
        }
      })
    }
    val names = args.toSeq
    // one warmup of the first query absorbs JVM/parquet warmup
    names.headOption.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count() catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // a failed rep must NOT contribute its (near-zero) elapsed time to the
      // min — record NaN for it and filter below (ADVICE r15)
      val split = sys.env.get("SPARK_GRAFT_QPROBE_SPLIT").contains("1")
      val runs = (1 to reps).map { rep =>
        if (trace) println(s"[qprobe] ---- $n rep $rep")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        val t0 = System.nanoTime()
        val ok = try {
          val df = fn(spark, sfDir)
          if (split) {
            // decompose the action into catalyst phases: optimization and
            // physical planning are driver-side CPU; "exec" is the jobs
            val t1 = System.nanoTime()
            val cnt = df.groupBy().count() // the count()'s actual plan
            cnt.queryExecution.optimizedPlan
            val t2 = System.nanoTime()
            cnt.queryExecution.executedPlan
            val t3 = System.nanoTime()
            cnt.collect() // executes the already-planned count
            val t4 = System.nanoTime()
            println(f"[qprobe]   $n build ${(t1 - t0) / 1e9}%.3f  opt ${(t2 - t1) / 1e9}%.3f  phys ${(t3 - t2) / 1e9}%.3f  exec ${(t4 - t3) / 1e9}%.3f")
          } else df.count()
          true
        } catch { case e: Throwable =>
          println(s"[qprobe] $n ERROR ${e.getMessage.take(120)}"); false }
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
      }
      val good = runs.filterNot(_.isNaN)
      val minS = if (good.nonEmpty) f"${good.min}%7.3f" else "  FAIL "
      println(f"[qprobe] $n%-34s min $minS  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
