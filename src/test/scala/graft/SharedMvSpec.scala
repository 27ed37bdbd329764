package graft

import graft.model.SharedMv
import org.apache.spark.sql.functions._

/** SharedMv fingerprinting: logicVersion participates in the key (a
  * derivation change must not serve the old materialization) and stale
  * versions of the same (name, dataset) MV are evicted on rebuild. */
class SharedMvSpec extends SparkSpec {
  import spark.implicits._

  test("logicVersion invalidates; stale materializations are evicted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_spec").toFile
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/src.parquet")
      val name = s"spec_${System.nanoTime()}"

      var builds = 0
      def build(tag: String) = {
        builds += 1
        spark.read.parquet(s"$dir/src.parquet").withColumn("tag", lit(tag))
      }

      val v1 = SharedMv(spark, dir.getPath, Seq("src"), name, "v1")(build("one"))
      assert(v1.select("tag").distinct().as[String].head() == "one")
      assert(builds == 1)
      // same version: served from the materialization, builder not invoked
      val v1b = SharedMv(spark, dir.getPath, Seq("src"), name, "v1")(build("one'"))
      assert(v1b.select("tag").distinct().as[String].head() == "one")
      assert(builds == 1)
      // bumped version: rebuilt with the new logic...
      val v2 = SharedMv(spark, dir.getPath, Seq("src"), name, "v2")(build("two"))
      assert(v2.select("tag").distinct().as[String].head() == "two")
      assert(builds == 2)
      // ...and the v1 materialization survives the 15-min grace window (a
      // concurrent JVM may still be serving it)...
      val root = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_mv")
      def versions = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"${name}_"))
      assert(versions.length == 2)
      // ...but once quiet past the grace window, the next rebuild evicts it
      versions.foreach(f =>
        f.setLastModified(System.currentTimeMillis() - 16L * 60 * 1000): Unit)
      val v3 = SharedMv(spark, dir.getPath, Seq("src"), name, "v3")(build("three"))
      assert(v3.select("tag").distinct().as[String].head() == "three")
      assert(versions.length == 1)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
      Option(new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_mv").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("spec_")).foreach(rm)
    }
  }
}
