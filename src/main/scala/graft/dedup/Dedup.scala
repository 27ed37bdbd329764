package graft.dedup

import graft.vector.VectorSearch
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Not present in the reference (it is a graph OLTP engine) — added as the
  * beyond-parity data-pipeline surface. All variants follow the same scale
  * discipline: candidate generation must never be O(n²) on the full corpus —
  * exact dedup is a hash aggregate, MinHash/SimHash bucket with LSH bands so
  * the verification join only sees colliding candidates, and n-gram Jaccard
  * joins on shared shingles (inverted-index join), optionally dropping
  * stop-shingles above a document-frequency cap.
  */
object Dedup {

  /** Distinct word k-gram shingles from a pre-split words-array column —
    * built-in HOFs only (sequence/transform/slice), codegen'd. Takes the
    * words COLUMN (not the raw text) so the split isn't re-evaluated per
    * lambda element (no CSE inside HOF lambdas). */
  def wordShinglesFromWords(words: Column, k: Int): Column =
    when(size(words) >= k,
      array_distinct(transform(sequence(lit(1), size(words) - (k - 1)),
        i => array_join(slice(words, i, lit(k)), " "))))
      .otherwise(array())

  /** (docId, shingle) rows for a corpus: split once into a projected column,
    * then explode the shingle array. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc"), split(col(textCol), " ").as("__words"))
      .select(col("doc"), explode(wordShinglesFromWords(col("__words"), k)).as("s"))

  /** Exact duplicate groups: canonical doc kept = min id per normalized-text
    * hash. Returns (id, keep_id, text_hash). A plain hash aggregate — one
    * shuffle, fully scalable. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    val w = Window.partitionBy(col("text_hash"))
    docs.select(col(idCol), h.as("text_hash"))
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
  }

  /** Exact dedup: keep one row per distinct text (the min-id row). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDupGroups(docs, idCol, textCol)
      .filter(col(idCol) === col("keep_id"))
      .select(col(idCol), col("text_hash"))

  /** Exact n-gram Jaccard similarity for all candidate pairs sharing at least
    * one k-word shingle (inverted-index self-join — the oracle-checkable
    * ground truth for the approximate methods below).
    *
    * @param maxDocFreq drop shingles appearing in more than this many docs
    *                   (stop-shingle cap — bounds the self-join fan-out at scale;
    *                   pass Int.MaxValue for exact semantics on small corpora)
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, k: Int,
                   threshold: Double, maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val sh0 = docShingles(docs, idCol, textCol, k)
    val sh =
      if (maxDocFreq == Int.MaxValue) sh0
      else {
        val w = Window.partitionBy(col("s"))
        sh0.withColumn("df", count(lit(1)).over(w)).filter(col("df") <= maxDocFreq).drop("df")
      }
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("i"), col("b.doc").as("j"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("i"), col("n").as("ni")), Seq("i"))
      .join(sizes.select(col("doc").as("j"), col("n").as("nj")), Seq("j"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") / (col("ni") + col("nj") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: numHashes independent min-hash values per doc over
    * its shingle set, using seeded murmur3 (`hash(seed, shingle)`).
    * Returns (doc, sig: array<int>). */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, numHashes: Int): DataFrame = {
    val sh = docShingles(docs, idCol, textCol, k)
    val mins = (0 until numHashes).map(i => min(hash(lit(i), col("s"))).as(s"h$i"))
    sh.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-duplicate pairs: band the signature (bands × rowsPerBand
    * = numHashes), bucket-join docs agreeing on any full band, then verify
    * with the estimated Jaccard = fraction of agreeing minhashes.
    * Only colliding candidates are ever paired — no quadratic blow-up. */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String, k: Int,
                      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minHashSignatures(docs, idCol, textCol, k, numHashes).cache()
    val banded = sig.select(col("doc"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * r + 1, lit(r)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("i"), col("b.doc").as("j"),
        col("a.sig").as("si"), col("b.sig").as("sj"))
      .dropDuplicates("i", "j")
    cand.select(col("i"), col("j"),
        (size(filter(zip_with(col("si"), col("sj"), (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 32-bit SimHash fingerprint per doc: each token votes ±1 on each bit of
    * murmur3(token); fingerprint bit b is set iff the weighted sum is > 0. */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(split(col(textCol), "\\s+")).as("t"))
      .withColumn("h", hash(col("t")))
    val bitSums = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val agg = tok.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 32).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    agg.select(col("doc"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, via 8
    * 4-bit-band join — pigeonhole: a pair at distance <= 7 differs in at most
    * 7 of the 8 nibbles, so it MUST agree on >= 1 band. (4 byte-bands would
    * only guarantee distance <= 3; the band count is sized to the maxHamming
    * the API accepts.) */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 7, s"8-band pigeonhole guarantees recall only for hamming <= 7, got $maxHamming")
    val fp = simHash(docs, idCol, textCol).cache()
    val banded = fp.select(col("doc"), col("simhash"),
      posexplode(array((0 until 8).map(i =>
        shiftright(col("simhash"), i * 4).bitwiseAND(0xF)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "nibble")
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.nibble") === col("b.nibble") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("i"), col("b.doc").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("i", "j")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-duplicate pairs above `threshold`.
    *
    * `lshBits = 0` → exact all-pairs (the oracle path; O(n²), small corpora
    * only). `lshBits > 0` → multi-table sign-LSH: `lshTables` independent
    * hyperplane sets; a pair is a candidate iff it collides in ANY table's
    * bucket, then candidates are verified with the exact cosine. Recall for
    * a pair with bit-agreement probability p is 1-(1-p^bits)^tables — size
    * (bits, tables) to the similarity regime (fewer bits + more tables for
    * lower-cosine targets). Candidate generation touches only colliding
    * pairs; the full cross join never happens. */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, lshBits: Int = 0, dim0: Int = 0,
                            seed: Long = 42L, lshTables: Int = 1): DataFrame = {
    val dim = if (dim0 > 0) dim0 else VectorSearch.detectDim(emb, vecCol)
    // pre-normalize each side ONCE (unrolled codegen'd norm) so the pair
    // condition is a single dot product, not dot + two norms
    val base =
      if (lshBits <= 0) {
        val a = emb.select(col(idCol).as("i"), col(vecCol).as("va"),
          VectorSearch.l2Norm(col(vecCol), dim).as("na"))
        val b = emb.select(col(idCol).as("j"), col(vecCol).as("vb"),
          VectorSearch.l2Norm(col(vecCol), dim).as("nb"))
        a.join(b, col("i") < col("j"))
      } else {
        val buckets = (0 until lshTables).map { t =>
          val planes = VectorSearch.hyperplanes(dim, lshBits, seed + t)
          struct(lit(t).as("t"), VectorSearch.lshBucketCompact(col(vecCol), planes).as("b"))
        }
        // Materialize the bucket projection ONCE (eager checkpoint): the
        // tables×bits unrolled plane dots are a huge codegen'd expression, and
        // without the cut it is inlined into BOTH self-join children (and the
        // broadcast build side), exploding generated-code size superlinearly.
        // After the cut the join children are plain scans of the materialized
        // relation — which is also the right shape at 100 TB (compute buckets
        // once, write out partitioned by (table, bucket), then join).
        val withB = emb.select(col(idCol), col(vecCol),
            VectorSearch.l2Norm(col(vecCol), dim).as("_n"),
            array(buckets: _*).as("_tbs"))
          .localCheckpoint(true)
        val banded = withB.select(col(idCol), col(vecCol), col("_n"),
          explode(col("_tbs")).as("_tb"))
        val a = banded.select(col(idCol).as("i"), col(vecCol).as("va"),
          col("_n").as("na"), col("_tb"))
        val b = banded.select(col(idCol).as("j"), col(vecCol).as("vb"),
          col("_n").as("nb"), col("_tb").as("_tb2"))
        a.join(b, col("_tb") === col("_tb2") && col("i") < col("j"))
          .dropDuplicates("i", "j")
      }
    base.select(col("i"), col("j"),
        (VectorSearch.dot(col("va"), col("vb"), dim) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
