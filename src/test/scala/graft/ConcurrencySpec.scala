package graft

import java.util.concurrent.{Executors, TimeUnit}
import scala.util.Try

/** Concurrent-query smoke (r11 verdict task #6): 8 threads submit mixed
  * catalog queries against ONE SparkSession, each thread in its own FAIR
  * scheduler pool. The shared state this exists to race: the SharedMv
  * fingerprint-keyed build (two threads observing a missing _SUCCESS and
  * overwrite-writing the same MV directory — now serialized by a
  * per-directory build lock) and the GraphLoader graph memo
  * (computeIfAbsent). Correctness = every thread's every run hashes
  * identical to the serial baseline. */
class ConcurrencySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  // read-only, deterministic, no session-global temp views; q_ldbc_is1 and
  // q_finbench_sr1 pull their SharedMv-backed loaders into the mix
  private val names = Seq("q1_agg", "q_label_count", "q_expand_1hop",
    "q_cypher_match_agg", "q_dedup_exact", "q_knn_exact", "q_wcc",
    "q_ldbc_is1")

  private def canon(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.sorted
    df.select(cols.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .collect()
      .map(r => (0 until r.length).map(i => ClusterVerify.canon(r.get(i))).mkString("|"))
      .sorted.mkString("\n")
  }

  test("8 threads x mixed catalog queries: per-thread results match the serial baseline") {
    val expected = names.map(n => n -> canon(n)).toMap
    val pool = Executors.newFixedThreadPool(8)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val futures = (0 until 8).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          // a real pool under FAIR mode (SparkSpec sets spark.scheduler.mode)
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"graft-$t")
          (0 until 3).foreach { i =>
            val n = names((t + i * 3) % names.length)
            Try(canon(n)).fold(
              e => { errors.add(s"$n on thread $t threw: $e"); () },
              got => if (got != expected(n)) {
                errors.add(s"$n on thread $t diverged from the serial baseline"); ()
              })
          }
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "query threads timed out")
    futures.foreach(_.get())
    assert(errors.isEmpty, s"concurrent divergences: $errors")
  }

  // the r12 spec raced only reads; the state that would ACTUALLY corrupt
  // under concurrent sessions is the write path — the MV-backed loader
  // (SharedMv build lock), the constraint check's driver-side collect
  // (GraphMutations.checkUnique), and WriteTranslator's localCheckpoint
  // id-pinning all run per-thread against ONE SparkSession here. Each
  // catalog write chain mutates its own PropertyGraph value derived from
  // the SHARED loader graph, so threads are disjoint by construction —
  // any cross-thread bleed (a clone batch visible to another thread's
  // readback, a constraint check seeing foreign in-flight rows) diverges
  // the canon hash from the serial baseline.
  private val writeNames = Seq("q_create", "q_merge", "q_set", "q_delete",
    "q_cypher_write_create", "q_cypher_write_set", "q_cypher_write_merge",
    "q_cypher_unique_constraint")

  test("8 threads x write chains: every mutation chain matches the serial baseline") {
    val expected = writeNames.map(n => n -> canon(n)).toMap
    val pool = Executors.newFixedThreadPool(8)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    (0 until 8).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"graft-w$t")
          (0 until 2).foreach { i =>
            val n = writeNames((t + i * 3) % writeNames.length)
            Try(canon(n)).fold(
              e => { errors.add(s"$n on thread $t threw: $e"); () },
              got => if (got != expected(n)) {
                errors.add(s"$n on thread $t diverged from the serial baseline"); ()
              })
          }
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "write threads timed out")
    assert(errors.isEmpty, s"concurrent write divergences: $errors")
  }

  test("SharedMv: 8 threads racing a COLD build produce one consistent MV") {
    import org.apache.spark.sql.functions._
    val buildCount = new java.util.concurrent.atomic.AtomicInteger(0)
    // unique name per run => the directory is cold and every thread races
    // the same missing _SUCCESS; the per-directory lock must serialize to
    // exactly ONE build
    val name = s"conc_probe_${System.nanoTime()}"
    val pool = Executors.newFixedThreadPool(8)
    val results = (0 until 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long =
          graft.model.SharedMv(spark, sfDir, "nation", name) {
            buildCount.incrementAndGet()
            spark.read.parquet(s"$sfDir/nation.parquet")
              .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
          }.agg(sum(col("n"))).head().getLong(0)
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    val values = results.map(_.get()).toSet
    assert(values.size == 1, s"racing readers saw different MVs: $values")
    assert(buildCount.get() == 1,
      s"expected exactly one MV build under the race, got ${buildCount.get()}")
  }
}
