package graft

import graft.text.TextAnalysis

/** Naive-Bayes quality classifier: differential against a from-scratch
  * in-memory twin (independent of both the engine plan and the DuckDB
  * oracle), plus edge-case pins.
  */
class NbQualitySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // positive exemplars under (minWords=3, maxWords=5, dupCut=0.5):
    (1L, "clear prose sentence here"),
    (2L, "clear concise prose paragraph"),
    // negative: too short
    (3L, "spam"),
    // negative: too long (6 tokens)
    (4L, "buy buy cheap cheap pills pills"),
    // negative: in-band word count but dup fraction 3/5 > 0.5
    (5L, "spam spam spam spam pills"),
    // unlabeled-region transfer case: 2 tokens (too short → negative
    // label) but quality vocabulary — NB should score it above doc 3
    (6L, "clear prose"),
    // zero tokens: keeps a row, score = prior alone
    (7L, "   ")
  ).toDF("doc_id", "text")

  // from-scratch twin
  private def twin(docs: Seq[(Long, String)], minW: Int, maxW: Int,
                   dupCut: Double): Map[Long, (Int, Boolean, Double)] = {
    def toks(t: String) = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val labeled = docs.map { case (id, t) =>
      val tk = toks(t)
      val lab = tk.nonEmpty && tk.size >= minW && tk.size <= maxW &&
        (1.0 - tk.distinct.size.toDouble / tk.size) <= dupCut
      (id, tk, lab)
    }
    val posToks = labeled.filter(_._3).flatMap(_._2)
    val negToks = labeled.filterNot(_._3).flatMap(_._2)
    val vocab = (posToks ++ negToks).distinct
    val v = vocab.size.toDouble
    val np = posToks.size.toDouble
    val nn = negToks.size.toDouble
    val cp = posToks.groupBy(identity).map { case (k, g) => k -> g.size }
    val cn = negToks.groupBy(identity).map { case (k, g) => k -> g.size }
    val lo = vocab.map(t => t -> (math.log((cp.getOrElse(t, 0) + 1.0) / (np + v))
      - math.log((cn.getOrElse(t, 0) + 1.0) / (nn + v)))).toMap
    val prior = math.log(labeled.count(_._3).toDouble / labeled.count(!_._3))
    labeled.map { case (id, tk, lab) =>
      val s = prior + tk.map(lo).sum
      id -> (tk.size, lab, BigDecimal(s).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  test("nb score matches the in-memory twin on every doc") {
    val got = TextAnalysis.nbQualityScore(corpus, "doc_id", "text",
      minWords = 3, maxWords = 5, dupCut = 0.5)
      .select("doc_id", "n_words", "label", "nb_score", "predicted")
      .as[(Long, Long, Boolean, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val exp = twin(Seq(1L -> "clear prose sentence here",
      2L -> "clear concise prose paragraph", 3L -> "spam",
      4L -> "buy buy cheap cheap pills pills", 5L -> "spam spam spam spam pills",
      6L -> "clear prose", 7L -> "   "), 3, 5, 0.5)
    assert(got.size == 7)
    exp.foreach { case (id, (nw, lab, s)) =>
      val g = got(id)
      assert(g._2 == nw.toLong, s"doc $id n_words ${g._2} != $nw")
      assert(g._3 == lab, s"doc $id label ${g._3} != $lab")
      assert(math.abs(g._4 - s) < 1e-9, s"doc $id score ${g._4} != $s")
      assert(g._5 == (g._4 > 0.0), s"doc $id predicted inconsistent")
    }
  }

  test("token evidence transfers past the seed rule; empty doc scores the prior") {
    val got = TextAnalysis.nbQualityScore(corpus, "doc_id", "text",
      minWords = 3, maxWords = 5, dupCut = 0.5)
      .select("doc_id", "label", "nb_score")
      .as[(Long, Boolean, Double)].collect().map(r => r._1 -> r).toMap
    // doc 6 is labeled negative (too short) but carries positive-class
    // vocabulary: the learned score must rank it above the spam docs
    assert(!got(6L)._2)
    assert(got(6L)._3 > got(3L)._3 && got(6L)._3 > got(4L)._3 &&
      got(6L)._3 > got(5L)._3,
      s"quality vocab should outrank spam: ${got(6L)._3} vs " +
        s"${got(3L)._3}/${got(4L)._3}/${got(5L)._3}")
    // doc 7 has no tokens: its score is exactly the rounded prior
    val prior = math.log(2.0 / 5.0)
    val expected = BigDecimal(prior).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(7L)._3 - expected) < 1e-9,
      s"empty doc score ${got(7L)._3} != rounded prior $expected")
  }

  // plain-Scala twin of graft_polyhash (same fold as DsirPackSpec)
  private def refHash(tok: String): Long =
    tok.foldLeft(0L)((a, c) => (a * 131L + c.toLong) % 1000003L)

  test("hashed model + apply matches an in-memory twin; unseen token is neutral") {
    val B = 64
    val (lo, prior) = TextAnalysis.nbHashedModel(corpus, "doc_id", "text",
      buckets = B, minWords = 3, maxWords = 5, dupCut = 0.5)
    assert(lo.size == B)
    // twin: rebuild bucket counts from the same labels as the twin() above
    def toks(t: String) = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val docs = Seq(1L -> "clear prose sentence here",
      2L -> "clear concise prose paragraph", 3L -> "spam",
      4L -> "buy buy cheap cheap pills pills", 5L -> "spam spam spam spam pills",
      6L -> "clear prose", 7L -> "   ")
    val labeled = docs.map { case (id, t) =>
      val tk = toks(t)
      (id, tk, tk.nonEmpty && tk.size >= 3 && tk.size <= 5 &&
        (1.0 - tk.distinct.size.toDouble / tk.size) <= 0.5)
    }
    val cp = new Array[Long](B); val cn = new Array[Long](B)
    labeled.foreach { case (_, tk, lab) =>
      tk.foreach { t =>
        val b = (refHash(t) % B).toInt
        if (lab) cp(b) += 1 else cn(b) += 1
      }
    }
    val np = cp.sum.toDouble; val nn = cn.sum.toDouble
    val expLo = (0 until B).map(b => math.log((cp(b) + 1.0) / (np + B))
      - math.log((cn(b) + 1.0) / (nn + B)))
    (0 until B).foreach(b => assert(math.abs(lo(b) - expLo(b)) < 1e-12,
      s"bucket $b: ${lo(b)} != ${expLo(b)}"))
    assert(math.abs(prior - math.log(2.0 / 5.0)) < 1e-12)
    // apply on batch (same code path the stream runs) matches the twin
    val got = TextAnalysis.nbQualityApply(corpus, "doc_id", "text", lo, prior)
      .select("doc_id", "nb_score").as[(Long, Double)].collect().toMap
    labeled.foreach { case (id, tk, _) =>
      val s = prior + tk.map(t => expLo((refHash(t) % B).toInt)).sum
      val exp = BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(id) - exp) < 1e-9, s"doc $id: ${got(id)} != $exp")
    }
    // a token absent from training hits its bucket's Laplace default —
    // scoring must not error and must equal the twin's default lookup
    val unseen = Seq((100L, "zzqqxv")).toDF("doc_id", "text")
    val u = TextAnalysis.nbQualityApply(unseen, "doc_id", "text", lo, prior)
      .select("nb_score").as[Double].head()
    val exp = BigDecimal(prior + expLo((refHash("zzqqxv") % B).toInt))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(u - exp) < 1e-9, s"unseen-token score $u != $exp")
  }
}
