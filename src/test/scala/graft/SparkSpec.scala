package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session).
  * Every suite also arms the codegen tripwire: an `ERROR CodeGenerator`
  * logged during the suite (janino failing a huge generated method →
  * silent interpreted fallback) aborts the suite — a fixture plan that
  * outgrows codegen must be split, not silently slow. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  private var codegenBaseline = 0L

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    spark // force session init (installs log4j config)
    CodegenTripwire.install()
    codegenBaseline = CodegenTripwire.errors
  }

  override protected def afterAll(): Unit = {
    val n = CodegenTripwire.errors - codegenBaseline
    if (n > 0) throw new IllegalStateException(
      s"$suiteName: $n ERROR CodeGenerator event(s) during this suite — " +
        "a plan silently fell back to interpreted execution. Samples:\n" +
        CodegenTripwire.sampleMessages.mkString("\n"))
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // FAIR so ConcurrencySpec's per-thread scheduler pools are real
      // (under FIFO the pool local property is a no-op); with no
      // allocation file every pool gets default weight — serial suites
      // see FIFO-identical behavior
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
