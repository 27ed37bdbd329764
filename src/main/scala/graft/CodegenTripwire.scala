package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Tripwire for silent whole-stage-codegen compile failures.
  *
  * When janino fails to compile a generated `processNext()` (huge-method
  * plans), Spark logs `ERROR CodeGenerator: failed to compile ...` and
  * FALLS BACK TO INTERPRETED execution — results stay correct, the test
  * stays green, and a hot stage quietly runs 10-50× slower. That is
  * exactly the perf cliff this repo builds native expressions to avoid,
  * so it must fail loudly: [[install]] attaches a log4j2 appender that
  * counts ERROR events from the codegen loggers; Verify and the test
  * suite call [[assertClean]] at the end of a run.
  *
  * Implementation: the appender hangs off the ROOT logger config (always
  * present) and filters by logger name — Spark's `CodeGenerator` and
  * `WholeStageCodegenExec` both live under
  * `org.apache.spark.sql.catalyst.expressions.codegen` /
  * `org.apache.spark.sql.execution`; any ERROR they emit is a compile
  * failure. Additivity-safe: an extra appender never suppresses existing
  * console output. */
object CodegenTripwire {
  private val count = new java.util.concurrent.atomic.AtomicLong()
  private val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile private var installed = false

  def install(): Unit = synchronized {
    if (installed) return
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appender = new AbstractAppender(
      "graft-codegen-tripwire", null, null, true, null) {
      override def append(e: LogEvent): Unit = {
        val ln = e.getLoggerName
        if (ln != null && e.getLevel.isMoreSpecificThan(Level.ERROR) &&
            (ln.endsWith(".CodeGenerator") || ln.endsWith(".WholeStageCodegenExec"))) {
          count.incrementAndGet()
          if (samples.size < 3) {
            val m = e.getMessage
            samples.add((ln + ": " +
              (if (m == null) "" else String.valueOf(m.getFormattedMessage))).take(400))
          }
        }
      }
    }
    appender.start()
    val config = ctx.getConfiguration
    config.getLoggerConfig(LogManager.ROOT_LOGGER_NAME)
      .addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
    installed = true
  }

  def errors: Long = count.get()

  def sampleMessages: Seq[String] = {
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq
  }

  /** Throws if any codegen compile error was logged since install. */
  def assertClean(context: String): Unit = {
    val n = errors
    if (n > 0) throw new IllegalStateException(
      s"$context: $n ERROR CodeGenerator event(s) — a stage silently fell " +
        s"back to interpreted execution. Samples:\n" +
        sampleMessages.mkString("\n"))
  }
}
