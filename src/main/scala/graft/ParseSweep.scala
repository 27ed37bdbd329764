package graft

// scratch: parse the reference's own test-corpus queries and report failures
object ParseSweep {
  def main(args: Array[String]): Unit = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/ref_queries.json"))), "UTF-8")
    // minimal JSON string-array parse (no deps): items are JSON strings
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
    // route like QueryEngine: DDL statements go to the regex path, an
    // EXPLAIN/PROFILE prefix is stripped before the grammar sees the body
    val ddl = ("(?is)^\\s*(SHOW\\s+(?:INDEXES?|CONSTRAINTS)|CREATE\\s+(?:VECTOR\\s+)?INDEX|" +
      "DROP\\s+INDEX|CREATE\\s+CONSTRAINT)\\b.*").r
    val explain = "(?is)^\\s*(?:EXPLAIN|PROFILE)\\b(.*)".r
    var ok = 0
    val fails = scala.collection.mutable.ArrayBuffer[(String, String)]()
    items.foreach { q0 =>
      val q = q0 match { case explain(rest) => rest; case other => other }
      try {
        q match {
          case ddl(_*) => ok += 1
          case _ => graft.cypher.CypherParser.parse(q); ok += 1
        }
      }
      catch { case e: Throwable => fails += ((q.take(120).replace("\n", " "), String.valueOf(e.getMessage).take(90))) }
    }
    println(s"parsed OK: $ok / ${items.size}")
    fails.groupBy(_._2).toSeq.sortBy(-_._2.size).take(25).foreach { case (msg, qs) =>
      println(s"\n[${qs.size}] $msg")
      qs.take(3).foreach(q => println(s"    ${q._1}"))
    }
  }
}
