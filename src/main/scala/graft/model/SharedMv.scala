package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized-view helper: build an expensive shared projection ONCE per
  * (dataset content, name) and read it back as a plain parquet leaf.
  *
  * The MV key is a CONTENT fingerprint of the source table's files (names +
  * sizes + mtimes), so regenerating a dataset at the same path invalidates
  * the cache automatically and concurrent JVMs on different inputs never
  * collide on a directory. This is the at-scale shape: an expensive
  * projection shared by several analytics (a co-purchase graph, a near-dup
  * pair set) is materialized to storage once and amortized over every
  * consumer — and unlike .cache() a file survives cache clearing, exactly
  * like a real shared table.
  */
object SharedMv {
  def apply(s: SparkSession, d: String, srcTable: String, name: String)
           (build: => DataFrame): DataFrame =
    apply(s, d, Seq(srcTable), name)(build)

  /** Multi-source form: the fingerprint covers EVERY table the builder
    * reads, so regenerating any one of them invalidates the MV (a trade
    * graph derived from lineitem+orders+customer+supplier must not survive
    * an orders regen that left lineitem untouched).
    *
    * `logicVersion` is the BUILDER's version and is part of the
    * fingerprint: source-file metadata cannot see a code change to the
    * derivation itself, so any change to what `build` computes MUST bump
    * the version at the call site — otherwise the old materialization is
    * silently served. */
  def apply(s: SparkSession, d: String, srcTables: Seq[String], name: String,
            logicVersion: String = "1")
           (build: => DataFrame): DataFrame = {
    val parts: Seq[java.io.File] = srcTables.sorted.flatMap { tbl =>
      val src = new java.io.File(d, s"$tbl.parquet")
      if (src.isDirectory) Option(src.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      else Seq(src)
    }
    val fp = java.lang.Long.toHexString(
      parts.sortBy(f => (f.getParent, f.getName))
        .foldLeft(1125899906842597L * 31 + logicVersion.hashCode) { (h, f) =>
          31 * (31 * (31 * h + f.getName.hashCode) + f.length()) + f.lastModified()
        })
    val root = new java.io.File(s"${System.getProperty("java.io.tmpdir")}/graft_mv")
    val stem = s"${name}_${math.abs(d.hashCode).toHexString}_"
    val dir = new java.io.File(root, stem + fp)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      // evict STALE versions of this same (name, dataset) MV — a regenerated
      // source table changes fp and would otherwise leave the old
      // materialization in tmp forever (same leak class as checkpoint dirs)
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(stem) && f.getName != dir.getName)
        .foreach { f =>
          def rm(x: java.io.File): Unit = {
            if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
            x.delete(): Unit
          }
          rm(f)
        }
      build.write.mode("overwrite").parquet(dir.getPath)
    }
    s.read.parquet(dir.getPath)
  }
}
