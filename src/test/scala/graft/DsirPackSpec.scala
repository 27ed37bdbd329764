package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** DSIR importance resampling + harmonic no-split packing. */
class DsirPackSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala twin of the engine-portable polynomial feature hash
  private def refHash(tok: String): Long =
    tok.foldLeft(0L)((a, c) => (a * 131L + c.toLong) % 1000003L)

  test("featureHash matches the plain-Scala fold (engine portability pin)") {
    val toks = Seq("a", "hello", "world2", "zz99", "quick_brown")
    val got = toks.toDF("tok")
      .select(col("tok"), TextAnalysis.featureHash(col("tok")).as("h"))
      .as[(String, Long)].collect().toMap
    toks.foreach(t => assert(got(t) == refHash(t), s"hash mismatch for '$t'"))
  }

  private val corpus = Seq(
    // target slice: law-ish vocabulary
    (1L, "statute court ruling appeal verdict statute court", "tgt"),
    (2L, "court verdict appeal ruling judge statute", "tgt"),
    // raw doc that LOOKS like the target — DSIR should up-weight it
    (3L, "statute court ruling appeal judge verdict", "raw"),
    // raw docs with disjoint vocabulary — down-weighted
    (4L, "banana smoothie recipe blender tropical fruit snack", "raw"),
    (5L, "guitar chord strumming pattern acoustic melody", "raw"),
    // degenerate: nothing survives normalization
    (6L, "!!! ??? --- ///", "raw")
  ).toDF("doc_id", "text", "src")

  test("dsir: target-like raw doc outweighs off-target docs; empty doc is 0") {
    val out = TextAnalysis.dsirResample(corpus, "doc_id", "text",
      col("src") === "tgt", buckets = 256, k = 3)
      .select("doc_id", "n_feats", "logw", "g", "selected")
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(3L)._3 > out(4L)._3 && out(3L)._3 > out(5L)._3,
      s"target-like doc 3 should outweigh 4/5: ${out(3L)._3} vs ${out(4L)._3}, ${out(5L)._3}")
    assert(out(6L)._2 == 0L && out(6L)._3 == 0.0)
    assert(out.values.count(_._5) == 3, "Gumbel top-k must select exactly k")
  }

  test("dsir: per-doc feature count is unigrams + bigrams of normalized tokens") {
    val out = TextAnalysis.dsirResample(corpus, "doc_id", "text",
      col("src") === "tgt", buckets = 256, k = 2)
      .select("doc_id", "n_feats").as[(Long, Long)].collect().toMap
    // doc 1: 7 tokens -> 7 unigrams + 6 bigrams
    assert(out(1L) == 13L, s"doc 1 n_feats = ${out(1L)}")
  }

  test("dsir: logw matches an independent in-memory twin on every doc") {
    // full-pipeline differential against a from-scratch Scala
    // implementation — independent of both the engine plan and the DuckDB
    // oracle, so a bug common to query and oracle SQL would still be caught
    def norm(text: String): Seq[String] = text.trim.split("\\s+").toSeq
      .map(_.toLowerCase.replaceAll("[^a-z0-9]", "")).filter(_.nonEmpty)
    val buckets = 256
    val rows = Seq(
      (1L, "statute court ruling appeal verdict statute court", true),
      (2L, "court verdict appeal ruling judge statute", true),
      (3L, "statute court ruling appeal judge verdict", false),
      (4L, "banana smoothie recipe blender tropical fruit snack", false),
      (5L, "guitar chord strumming pattern acoustic melody", false),
      (6L, "!!! ??? --- ///", false))
    val featsByDoc = rows.map { case (id, text, tgt) =>
      val n = norm(text)
      val fs = (n ++ n.zip(n.drop(1)).map { case (a, b) => s"${a}_$b" })
        .map(f => refHash(f) % buckets)
      (id, tgt, fs)
    }
    val ct = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cr = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    featsByDoc.foreach { case (_, tgt, fs) =>
      fs.foreach { b => cr(b) += 1; if (tgt) ct(b) += 1 }
    }
    val tTot = ct.values.sum.toDouble
    val rTot = cr.values.sum.toDouble
    val expected = featsByDoc.map { case (id, _, fs) =>
      id -> (fs.map(b => math.log(ct(b) + 1d) - math.log(cr(b) + 1d)).sum
        + fs.size * (math.log(rTot + buckets) - math.log(tTot + buckets)))
    }.toMap
    val got = TextAnalysis.dsirResample(corpus, "doc_id", "text",
      col("src") === "tgt", buckets, k = 3)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    expected.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) < 1e-3, s"doc $id: engine ${got(id)} vs twin $w")
    }
  }

  private val packDocs = Seq(
    // shard A: sizes 60, 60, 30, 30, 30, 200 (oversize), capacity 100
    (1L, "a " * 60, "A"), (2L, "b " * 60, "A"),
    (3L, "c " * 30, "A"), (4L, "d " * 30, "A"), (5L, "e " * 30, "A"),
    (6L, "f " * 200, "A"),
    // shard B packs independently
    (7L, "g " * 55, "B"), (8L, "h " * 55, "B")
  ).map { case (i, t, s) => (i, t.trim, s) }.toDF("doc_id", "text", "shard")

  test("harmonic packing: bins never exceed capacity, oversize isolated") {
    val out = TextAnalysis.packHarmonic(packDocs, "doc_id", "text", "shard", 100)
      .select("doc_id", "shard", "n_tokens", "fit", "bin", "pos")
      .as[(Long, String, Long, Long, Long, Int)].collect()
    val byDoc = out.map(r => r._1 -> r).toMap
    // fit-classes: 60-token docs -> fit 1; 30-token -> fit 3; 200 -> fit 1
    assert(byDoc(1L)._4 == 1L && byDoc(3L)._4 == 3L && byDoc(6L)._4 == 1L)
    // within-capacity bins: group by (shard, fit, bin), sum sizes
    out.filter(_._3 <= 100).groupBy(r => (r._2, r._4, r._5)).foreach {
      case (key, rs) =>
        assert(rs.map(_._3).sum <= 100, s"bin $key exceeds capacity")
    }
    // oversize doc is alone in its bin
    val oversizeBin = out.filter(r =>
      r._2 == "A" && r._4 == byDoc(6L)._4 && r._5 == byDoc(6L)._5)
    assert(!oversizeBin.exists(r => r._1 != 6L && r._3 >= 100) ||
      oversizeBin.count(_._3 >= 100) == 1)
    // the three 30-token docs share ONE bin (fit 3): decreasing-rank fill
    val smalls = out.filter(r => Set(3L, 4L, 5L).contains(r._1))
    assert(smalls.map(_._5).distinct.length == 1 &&
      smalls.map(_._6).sorted.sameElements(Array(0, 1, 2)))
    // shards pack independently: B's two 55-token docs are fit 1, bins 0/1
    val b = out.filter(_._2 == "B").sortBy(_._1)
    assert(b.map(_._5).toSeq == Seq(0L, 1L))
  }
}
