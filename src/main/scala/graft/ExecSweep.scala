package graft

import org.apache.spark.sql.SparkSession
import graft.model.PropertyGraph
import graft.cypher.QueryEngine

/** Execute (not just parse) the reference's swept query corpus against a
  * small generic property graph and classify every outcome.
  *
  * The corpus is the ~1,249 Cypher strings extracted from the reference's
  * own tests/src/benches (the same file `graft.ParseSweep` reads). The
  * contract being checked is CRASH-SAFETY, not result correctness: every
  * string must either execute, or fail with a graceful user-facing error
  * (parse error, unknown function, missing parameter). An engine-internal
  * error (MatchError, NPE, ClassCast, StackOverflow, ...) anywhere in the
  * cause chain is a bug and is reported as `internal`.
  *
  * Outcome classes printed in the report:
  *   ok             — executed; result row count taken
  *   graceful_error — rejected with a clean exception (expected for queries
  *                    over labels/functions/indexes this fixture lacks)
  *   param_skip     — needs a bind parameter the sweep cannot invent
  *                    (retried once with generic bindings first)
  *   parse_error    — does not parse (extraction noise: Rust format
  *                    templates, truncated fragments)
  *   timeout        — exceeded the per-query budget (jobs cancelled)
  *   internal       — engine bug; top of the report, must be zero
  */
object ExecSweep {

  private def loadCorpus(path: String): Seq[String] = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val items = scala.collection.mutable.ArrayBuffer[String]()
    var i = raw.indexOf('"')
    val sb = new StringBuilder
    while (i >= 0 && i < raw.length) {
      sb.clear()
      var j = i + 1
      var done = false
      while (!done && j < raw.length) {
        raw(j) match {
          case '\\' =>
            raw(j + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
              case 'u' => sb += Integer.parseInt(raw.substring(j + 2, j + 6), 16).toChar; j += 4
              case c => sb += c
            }
            j += 2
          case '"' => done = true; j += 1
          case c => sb += c; j += 1
        }
      }
      items += sb.toString
      i = raw.indexOf('"', j)
    }
    items.toSeq
  }

  /** Small multi-label fixture covering the labels/rel-types the corpus
    * references most (Person/KNOWS dominate; Company, Post, Account, Item,
    * Tag, Product follow). Labels the corpus mentions but this graph lacks
    * simply match zero rows — that is the graceful path being exercised. */
  private def fixture(spark: SparkSession): PropertyGraph = {
    import spark.implicits._
    val nodes = Seq(
      (1L, Seq("Person"), "Alice", 30L, "Paris", "alice@example.com", 85.5),
      (2L, Seq("Person"), "Bob", 25L, "London", "bob@example.com", 72.0),
      (3L, Seq("Person", "Employee"), "Carol", 35L, "Paris", "carol@example.com", 91.2),
      (4L, Seq("Person"), "Dave", 41L, "Berlin", "dave@example.com", 60.0),
      (5L, Seq("Person"), "Eve", 29L, "Paris", "eve@example.com", 88.8),
      (6L, Seq("Company"), "Acme", 1990L, "London", null, 0.0),
      (7L, Seq("Company"), "Globex", 2001L, "Berlin", null, 0.0),
      (8L, Seq("Post"), "Hello world", 2020L, null, null, 0.0),
      (9L, Seq("Post"), "Graphs are fun", 2021L, null, null, 0.0),
      (10L, Seq("Account"), "acc-1", 2015L, null, null, 1000.0),
      (11L, Seq("Account"), "acc-2", 2016L, null, null, 250.5),
      (12L, Seq("Item"), "Widget", 2019L, null, null, 9.99),
      (13L, Seq("Item"), "Gadget", 2018L, null, null, 19.99),
      (14L, Seq("Tag"), "spark", 0L, null, null, 0.0),
      (15L, Seq("Tag"), "graph", 0L, null, null, 0.0),
      (16L, Seq("Product"), "Thing", 2022L, null, null, 42.0),
      (17L, Seq("Country"), "France", 0L, null, null, 0.0),
      (18L, Seq("City"), "Paris", 0L, null, null, 0.0))
      .toDF("id", "labels", "name", "age", "city", "email", "score")
    val edges = Seq(
      (100L, 1L, 2L, "KNOWS", 2010L, 0.9),
      (101L, 2L, 3L, "KNOWS", 2015L, 0.7),
      (102L, 1L, 3L, "KNOWS", 2020L, 0.8),
      (103L, 3L, 4L, "KNOWS", 2018L, 0.4),
      (104L, 4L, 5L, "KNOWS", 2019L, 0.6),
      (105L, 5L, 1L, "KNOWS", 2021L, 0.5),
      (106L, 1L, 6L, "WORKS_AT", 2018L, 1.0),
      (107L, 3L, 6L, "WORKS_AT", 2019L, 1.0),
      (108L, 4L, 7L, "WORKS_AT", 2012L, 1.0),
      (109L, 8L, 1L, "HAS_CREATOR", 2020L, 0.0),
      (110L, 9L, 2L, "HAS_CREATOR", 2021L, 0.0),
      (111L, 8L, 14L, "HAS_TAG", 0L, 0.0),
      (112L, 9L, 15L, "HAS_TAG", 0L, 0.0),
      (113L, 1L, 9L, "LIKES", 2021L, 0.0),
      (114L, 2L, 8L, "LIKES", 2020L, 0.0),
      (115L, 10L, 11L, "TRANSFER", 2022L, 500.0),
      (116L, 11L, 10L, "TRANSFER", 2023L, 120.0),
      (117L, 1L, 12L, "BOUGHT", 2022L, 9.99),
      (118L, 2L, 13L, "BOUGHT", 2023L, 19.99),
      (119L, 18L, 17L, "IS_IN", 0L, 0.0),
      (120L, 1L, 18L, "LIVES_IN", 0L, 0.0))
      .toDF("id", "src", "dst", "relationship", "since", "weight")
    PropertyGraph(nodes, edges)
  }

  /** Generic bindings for the retry pass: every `$name` in the text bound to
    * a small value whose type is guessed from how the parameter is used. */
  private def genericParams(q: String): Map[String, Any] = {
    val names = "\\$([A-Za-z_][A-Za-z0-9_]*)".r.findAllMatchIn(q).map(_.group(1)).toSet
    names.map { n =>
      val lower = n.toLowerCase
      val v: Any =
        if (lower.contains("name") || lower.contains("str") || lower.contains("word") ||
            lower.contains("country") || lower.contains("tag") || lower.contains("city")) "Alice"
        else if (lower.contains("vec") || lower.contains("emb")) Seq(0.1f, 0.2f, 0.3f)
        else if (lower.contains("date") || lower.contains("time")) 2020L
        else if (lower.contains("ids") || lower == "list") Seq(1L, 2L, 3L)
        else 1L
      n -> v
    }.toMap
  }

  private def isInternal(t: Throwable): Boolean = {
    var cur: Throwable = t
    var depth = 0
    while (cur != null && depth < 12) {
      cur match {
        case _: MatchError | _: NotImplementedError | _: NullPointerException |
             _: ClassCastException | _: IndexOutOfBoundsException |
             _: StackOverflowError | _: scala.ScalaReflectionException => return true
        case _ =>
      }
      cur = if (cur.getCause eq cur) null else cur.getCause
      depth += 1
    }
    false
  }

  def main(args: Array[String]): Unit = {
    val corpusPath = args.headOption.getOrElse("/tmp/ref_queries.json")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = fixture(spark)
    val corpus = loadCorpus(corpusPath)
    val budgetMs = sys.env.getOrElse("SPARK_GRAFT_SWEEP_TIMEOUT_MS", "60000").toLong

    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val internals = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val gracefulMsgs = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)

    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    def runOne(q: String, params: Map[String, Any]): Either[Throwable, Long] = {
      val group = "sweep-" + System.nanoTime()
      val fut = pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
        def call(): Either[Throwable, Long] = {
          spark.sparkContext.setJobGroup(group, q.take(60), interruptOnCancel = true)
          try Right(QueryEngine.execute(q, g, params).count())
          catch { case t: Throwable => Left(t) }
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try fut.get(budgetMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          Left(new RuntimeException("sweep timeout"))
        case e: java.util.concurrent.ExecutionException => Left(e.getCause)
      }
    }

    corpus.zipWithIndex.foreach { case (q, idx) =>
      if (idx % 100 == 0) System.err.println(s"... $idx/${corpus.size}")
      // parse gate first so extraction noise never reaches the engine path
      val parsed =
        try { val _ = graft.cypher.CypherParser.parse(
          q.replaceAll("(?is)^\\s*(?:EXPLAIN|PROFILE)\\b", "")); true }
        catch { case _: Throwable =>
          // DDL routes around the grammar in QueryEngine
          "(?is)^\\s*(SHOW\\s|CREATE\\s+(?:VECTOR\\s+)?INDEX|DROP\\s+INDEX|CREATE\\s+CONSTRAINT).*".r
            .findFirstIn(q).isDefined }
      if (!parsed) counts("parse_error") += 1
      else runOne(q, Map.empty) match {
        case Right(_) => counts("ok") += 1
        case Left(t) if t.getMessage == "sweep timeout" => counts("timeout") += 1
          internals += ((q.take(120).replace("\n", " "), "TIMEOUT"))
        case Left(t) =>
          val msg = String.valueOf(t.getMessage)
          val paramish = msg.toLowerCase.contains("param")
          val retry = if (paramish) Some(runOne(q, genericParams(q))) else None
          retry match {
            case Some(Right(_)) => counts("ok_with_params") += 1
            case _ =>
              val finalT = retry.flatMap(_.left.toOption).getOrElse(t)
              if (isInternal(finalT)) {
                counts("internal") += 1
                internals += ((q.take(160).replace("\n", " "),
                  finalT.getClass.getSimpleName + ": " + String.valueOf(finalT.getMessage).take(120)))
              } else if (paramish) counts("param_skip") += 1
              else {
                counts("graceful_error") += 1
                gracefulMsgs(finalT.getClass.getSimpleName + ": " +
                  String.valueOf(finalT.getMessage).take(70)) += 1
              }
          }
      }
    }
    pool.shutdownNow()

    println("=== ExecSweep report ===")
    println(s"corpus: ${corpus.size} strings from $corpusPath")
    counts.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"  $k%-16s $v%5d") }
    if (internals.nonEmpty) {
      println("\n--- INTERNAL ERRORS (bugs) ---")
      internals.foreach { case (q, e) => println(s"  [$e]\n    $q") }
    }
    println("\n--- top graceful error shapes ---")
    gracefulMsgs.toSeq.sortBy(-_._2).take(20).foreach { case (m, c) => println(f"  [$c%4d] $m") }
    spark.stop()
  }
}
