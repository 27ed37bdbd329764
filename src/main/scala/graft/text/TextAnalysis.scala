package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CypherFunctions
// NOTE for maintainers: never nest an expensive expression inside a
// higher-order-function lambda that runs once per array element — project it
// to a column first (no CSE inside lambdas; see winnowingSketch).

/** Text-analysis operators for training-data pipelines (beyond-parity
  * surface; the reference has no text analytics). Everything is built-in
  * Catalyst expressions — no UDFs — so these run inside whole-stage codegen
  * and scale linearly with a single scan.
  */
object TextAnalysis {

  /** Whitespace tokens (collapsing runs; leading/trailing trimmed). */
  // filter-out of empty tokens (vs trusting trim) because Spark's trim
  // strips only spaces: "\t" survives it and split would yield phantom ""
  // tokens — this form gives 0 words on any all-whitespace text
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Duplicate-token fraction, `1 - distinct/total` over whitespace tokens
    * (the classic corpus-filter repetition signal — a high ratio marks
    * boilerplate/spam). Rounded to 4 decimals for cross-engine compare. */
  def dupTokenRatio(text: Column): Column = {
    val t = tokens(text)
    CypherFunctions.roundC(
      lit(1.0) - size(array_distinct(t)).cast("double") / size(t), 4)
  }

  /** Duplicate-bigram fraction over adjacent token pairs — CCNet-style
    * duplicated-n-gram character of the document; 0.0 for single-token
    * texts. Bigrams are space-joined zipped slices (tokens cannot contain
    * spaces, so the join is unambiguous; strings rather than structs keep
    * the distinct comparable across engines). */
  def dupBigramRatio(text: Column): Column = {
    val t = tokens(text)
    val n = size(t)
    val bi = zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    when(n > 1,
      CypherFunctions.roundC(
        lit(1.0) - size(array_distinct(bi)).cast("double") / (n - 1), 4))
      .otherwise(0.0)
  }

  /** BPE-ish subword count estimate: word-boundary pieces + digit runs +
    * punctuation each count as a token (a cheap deterministic proxy for a
    * real tokenizer's token count). */
  def subwordCountEstimate(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(
      size(filter(split(text, "(?<=[\\s\\p{Punct}])|(?=[\\s\\p{Punct}])|(?<=[a-z])(?=[A-Z])|(?<=\\D)(?=\\d)|(?<=\\d)(?=\\D)"),
        t => length(trim(t)) > 0)))

  /** Exact substring-level dedup signal: per document, how many of its
    * tokens are covered by a k-token window that occurs MORE THAN ONCE in
    * the whole corpus (same-document repeats count). This is the
    * "deduplicating training data" exact-substring technique (Lee et al.
    * 2022 use suffix arrays; the 50-token repeated-span rule) re-expressed
    * relationally: windows are a per-row transform+posexplode (no
    * suffix-array build), the global duplicate test is ONE hash aggregate
    * on the window key, and coverage is an explode of the [i, i+k) span
    * positions with a distinct-count per doc — every step a shuffle on a
    * key, nothing driver-side, linear in total window count.
    *
    * Windows here group by the window STRING so the DuckDB oracle is
    * byte-exact; at 100 TB group by a 128-bit window hash instead (two
    * independent xxhash64 seeds) — same plan shape, ~50× less shuffle
    * volume, collision odds ~n²/2¹²⁸.
    *
    * Returns (idCol, total_tokens, covered_tokens, dup_fraction). */
  def substringDupStats(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8): DataFrame = {
    val t = docs
      .select(col(idCol).as("_id"), tokens(lower(col(textCol))).as("_t"))
      .withColumn("_n", size(col("_t")))
    val win = t.filter(col("_n") >= k)
      .select(col("_id"), posexplode(transform(
        sequence(lit(0), col("_n") - k),
        i => concat_ws(" ", slice(col("_t"), i + 1, lit(k))))).as(Seq("_i", "_w")))
    val dup = win.groupBy("_w").agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1).select("_w")
    val covered = win.join(dup, "_w")
      .select(col("_id"), explode(sequence(col("_i"), col("_i") + (k - 1))).as("_j"))
      .groupBy("_id").agg(countDistinct(col("_j")).as("covered_tokens"))
    t.select(col("_id"), col("_n").cast("long").as("total_tokens"))
      .join(covered, Seq("_id"), "left")
      .na.fill(0, Seq("covered_tokens"))
      .select(col("_id").as(idCol), col("total_tokens"), col("covered_tokens"),
        when(col("total_tokens") > 0, CypherFunctions.roundC(
          col("covered_tokens").cast("double") / col("total_tokens"), 4))
          .otherwise(0.0).as("dup_fraction"))
  }

  /** Quality metrics per document: char/token counts, mean token length,
    * alphabetic & whitespace ratios, and a composite [0,1] score (rounded for
    * engine-stable comparison). */
  def qualityMetrics(text: Column): Seq[Column] = {
    val nChars = length(text)
    val toks = tokens(text)
    val nTokens = tokenCount(text)
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", ""))
    val spaces = length(regexp_replace(text, "[^ ]", ""))
    val meanTokLen = when(nTokens > 0, CypherFunctions.roundC(alpha.cast("double") / nTokens, 4)).otherwise(0.0)
    val alphaRatio = when(nChars > 0, CypherFunctions.roundC(alpha.cast("double") / nChars, 4)).otherwise(0.0)
    val spaceRatio = when(nChars > 0, CypherFunctions.roundC(spaces.cast("double") / nChars, 4)).otherwise(0.0)
    Seq(nChars.as("n_chars_m"), nTokens.as("n_tokens"), meanTokLen.as("mean_tok_len"),
      alphaRatio.as("alpha_ratio"), spaceRatio.as("space_ratio"))
  }

  /** Composite quality score in [0,1]: favors 50-5000 chars, high alpha
    * ratio, sane mean token length (3-12 chars). Deterministic and
    * oracle-expressible. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val meanTok = when(nTokens > 0, alpha / nTokens).otherwise(lit(0.0))
    val lenScore = when(nChars >= 50 && nChars <= 5000, 1.0)
      .when(nChars < 50, nChars / 50.0).otherwise(lit(5000.0) / nChars)
    val alphaScore = when(nChars > 0, alpha / nChars).otherwise(lit(0.0))
    val tokScore = when(meanTok >= 3 && meanTok <= 12, 1.0).otherwise(lit(0.5))
    CypherFunctions.roundC((lenScore + alphaScore + tokScore) / 3.0, 4)
  }

  // Tiny per-language stopword lexicons for the n-gram/stopword language-ID
  // heuristic. Deterministic; mirrored verbatim in the DuckDB oracle.
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** Stopword hit count for one language lexicon. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(words.map(lit): _*).cast("boolean")))

  /** DataFrame form of langId: tokenizes once into a projected column, then
    * scores lexicons over it (avoids re-splitting per language). */
  def langIdDf(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val toks = col("__lang_toks")
    val withToks = df.withColumn("__lang_toks", tokens(lower(col(textCol))))
    val hits = langLexicons.zipWithIndex.map { case ((l, ws), ord) =>
      struct(size(filter(toks, t => t.isin(ws.map(lit): _*))).as("h"),
        lit(-ord).as("nord"), lit(l).as("l"))
    }
    val top = array_max(array(hits: _*))
    withToks.withColumn(outCol,
        when(top.getField("h") > 0, top.getField("l")).otherwise("und"))
      .drop("__lang_toks")
  }

  /** Heuristic language ID: argmax of per-language stopword hits, ties broken
    * by lexicon order, no hits at all → "und" (undetermined). */
  def langId(text: Column): Column = {
    val hits = langLexicons.map { case (l, ws) => (l, stopwordHits(text, ws)) }
    val best = hits.map { case (l, h) => struct(h.as("h"), lit(langLexicons.indexWhere(_._1 == l)).as("ord"), lit(l).as("l")) }
    val top = array_max(array(best.map(s => struct(s.getField("h").as("h"), (-s.getField("ord")).as("nord"), s.getField("l").as("l"))): _*))
    when(top.getField("h") > 0, top.getField("l")).otherwise("und")
  }

  /** Canonical text normalization: lowercase + collapse whitespace + trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint = md5 of the normalized text (content-defined
    * identity for exact near-normalization dedup). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Winnowing-style rolling fingerprint: hash every char k-gram, take the
    * min hash in each sliding window of w hashes, distinct — a compact
    * sketch robust to local edits (Schleimer et al., SIGMOD'03).
    *
    * Implemented as staged projections (one withColumn per level) rather
    * than one nested expression: Catalyst does NOT do common-subexpression
    * elimination inside higher-order-function lambdas, so a nested form
    * re-evaluates the normalization regex per array element — O(len³). */
  def winnowingSketch(df: DataFrame, textCol: String, k: Int = 8, w: Int = 4,
                      outCol: String = "sketch"): DataFrame = {
    val n = col("__winnow_norm"); val hs = col("__winnow_hashes")
    df.withColumn("__winnow_norm", normalize(col(textCol)))
      .withColumn("__winnow_hashes",
        when(length(n) >= k,
          transform(sequence(lit(1), length(n) - (k - 1)), i => hash(n.substr(i, lit(k)))))
          .otherwise(array(hash(n))))
      .withColumn(outCol,
        array_distinct(when(size(hs) >= w,
          transform(sequence(lit(1), size(hs) - (w - 1)),
            i => array_min(slice(hs, i, lit(w)))))
          .otherwise(array(array_min(hs)))))
      .drop("__winnow_norm", "__winnow_hashes")
  }

  // ---- PII detection / redaction -----------------------------------------

  /** Conservative PII patterns (the common pre-training scrub set). Kept to
    * the regex subset with identical semantics in Java regex and RE2 so the
    * DuckDB oracle reproduces matches exactly. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ \\t\\n]+"
  val PhonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** Per-document PII hit counts — three codegen'd regexp_count projections,
    * one scan, no shuffle; the shape that holds at 100 TB. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailPattern)).as("n_emails"),
    regexp_count(text, lit(UrlPattern)).as("n_urls"),
    regexp_count(text, lit(PhonePattern)).as("n_phones"))

  /** Redact PII in place (emails, then URLs, then phone numbers — fixed
    * order so redacted output is deterministic and oracle-reproducible). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>"),
      PhonePattern, "<PHONE>")

  // ---- sequence packing ---------------------------------------------------

  /** Chunked-concatenation sequence packing: assign each document to a
    * training-sequence bin of `capacity` tokens, packing documents in
    * id order WITHIN each value of `shardCol` (the standard "concat the
    * stream, cut every C tokens" formulation — a document whose tokens
    * straddle a cut starts lives in the bin where its first token lands).
    *
    * bin = floor((running_total - n_tokens) / capacity), i.e. the bin of
    * the document's first token; pos = 0-based index within the bin.
    *
    * Scale: the only ordering is a window PARTITIONED BY the shard column —
    * each shard sorts independently (no global sort, no single partition).
    * Real pipelines shard by file/source exactly so packing parallelizes;
    * a degenerate single-shard input degrades to one sorted partition,
    * which is the semantics the caller asked for. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    shardCol: String, capacity: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    val base = df.select(col(idCol), col(shardCol),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("__cum") - col("n_tokens")) / capacity))
    base
      .withColumn("pos",
        row_number().over(Window.partitionBy(col(shardCol), col("bin"))
          .orderBy(col(idCol))) - 1)
      .drop("__cum")
  }

  // ---- deterministic stratified sampling ----------------------------------

  /** Deterministic keep-decision for rate-based downsampling: keeps a row
    * iff (id * 2654435761) mod 100 < ratePct. Knuth's multiplicative hash
    * in plain BIGINT arithmetic — bit-identical in any engine, no RNG, so
    * the sample is reproducible and the oracle can re-derive it. */
  def sampleKeep(id: Column, ratePct: Column): Column =
    (id.cast("long") * lit(2654435761L)) % 100 < ratePct

  /** Stratified downsampling: keep `ratePct(stratum)`% of rows per stratum
    * (default 100 for unlisted strata). One scan + codegen'd filter — the
    * language-rebalancing step of a corpus pipeline, zero shuffles. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratePct: Map[String, Int]): DataFrame = {
    val rate = ratePct.foldLeft(lit(100)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(sampleKeep(col(idCol), rate))
  }

  // ---- tf-idf -------------------------------------------------------------

  /** Top-`k` TF-IDF terms per document: tf = in-doc term count, idf =
    * ln(N / df) with df = corpus document frequency. Two hash aggregates
    * (term counts, document frequencies) + one broadcast-able join — the
    * inverted-index formulation; nothing is per-document driver-side.
    * Ties (equal rounded score) break lexicographically so ranking is
    * engine-independent. Returns (idCol, token, tf, df, score, rank). */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    // corpus size rides along as a broadcast 1-row aggregate — the whole
    // computation is ONE declarative plan, no driver-side action
    val nDf = df.agg(count_distinct(col(idCol)).cast("double").as("__n"))
    val scored = tf.join(dfreq, "token").crossJoin(broadcast(nDf))
      .withColumn("score",
        graft.functions.CypherFunctions.roundC(col("tf") * log(col("__n") / col("df")), 4))
      .drop("__n")
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("score"), col("rank"))
  }

  // ---- temperature-based mixture weighting --------------------------------

  /** Temperature-based mixture weights across strata — the multilingual
    * data-mixing step: sampling share ∝ n^alpha with alpha in (0,1]
    * flattens the source distribution exactly like temperature sampling
    * (alpha=1 keeps raw proportions, alpha→0 approaches uniform). Per
    * stratum: count, raw share, tempered share, and the effective up/
    * down-sampling factor. One hash aggregate + a broadcast 1-row total —
    * the whole computation is a single declarative plan with no driver
    * action, so it composes under a 100 TB scan. */
  def temperatureMix(df: DataFrame, stratumCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).cast("double").as("_tot"),
      sum(pow(col("n"), alpha)).as("_wtot"))
    val r = CypherFunctions.roundC(_: Column, 4)
    counts.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n"),
        r(col("n") / col("_tot")).as("raw_share"),
        r(pow(col("n"), alpha) / col("_wtot")).as("temp_share"),
        r((pow(col("n"), alpha) / col("_wtot")) / (col("n") / col("_tot")))
          .as("boost"))
  }

  // ---- Gopher-style heuristic quality rules -------------------------------

  /** Rule-based document filter in the style of the published Gopher /
    * MassiveText quality heuristics (word-count bounds, mean word length
    * band, alphabetic-word fraction, minimum stopword evidence): each rule
    * is a named boolean column plus the metrics it reads, and `pass` is
    * their conjunction. Pure codegen'd projections over one scan — at
    * 100 TB this is a single map stage with no shuffle at all.
    *
    * Metrics are arithmetic on the raw text (word count, character counts)
    * so the oracle re-derives them exactly; doubles are roundC'd. */
  def gopherRules(text: Column,
                  minWords: Int = 20, maxWords: Int = 100000,
                  minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
                  minAlphaFrac: Double = 0.8, minStopHits: Int = 1): Seq[Column] = {
    val toks = tokens(text)
    val nWords = tokenCount(text)
    // words are single-space separated after trim: total word chars =
    // len - (n_words - 1) separators
    val wordChars = (length(trim(text)) - (nWords - 1)).cast("double")
    val meanLen = when(nWords > 0,
      graft.functions.CypherFunctions.roundC(wordChars / nWords, 4)).otherwise(0.0)
    val alphaWords = size(filter(toks, t => t.rlike("[a-zA-Z]")))
    val alphaFrac = when(nWords > 0,
      graft.functions.CypherFunctions.roundC(alphaWords.cast("double") / nWords, 4))
      .otherwise(0.0)
    val stopHits = stopwordHits(text, Seq("the", "a", "and", "of", "to", "in"))
    val okWords = nWords >= minWords && nWords <= maxWords
    val okMean = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val okAlpha = alphaFrac >= minAlphaFrac
    val okStop = stopHits >= minStopHits
    Seq(nWords.as("n_words"), meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"), stopHits.as("stop_hits"),
      okWords.as("ok_words"), okMean.as("ok_mean_len"),
      okAlpha.as("ok_alpha"), okStop.as("ok_stop"),
      (okWords && okMean && okAlpha && okStop).as("pass"))
  }

  // ---- sliding-window chunking --------------------------------------------

  /** Overlapping sliding-window chunks of `chunkWords` words every
    * `strideWords` words — the RAG-indexing / context-window-preprocessing
    * step. Chunk starts are 0, stride, 2·stride, … while start < n_words,
    * so a short document yields exactly one (possibly partial) chunk and
    * trailing windows keep their partial text.
    *
    * One generate+explode projection per row — embarrassingly parallel,
    * no shuffle; chunk text is hashed so downstream exact-dedup of chunks
    * is a plain hash aggregate. Returns (idCol, chunk_idx, start_word,
    * n_chunk_words, chunk_hash). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkWords: Int, strideWords: Int): DataFrame = {
    require(strideWords > 0 && chunkWords >= strideWords,
      s"need 0 < stride <= chunk, got chunk=$chunkWords stride=$strideWords")
    val withWords = df.select(col(idCol), tokens(col(textCol)).as("__words"))
      .withColumn("__n", size(col("__words")))
    withWords
      .select(col(idCol), col("__words"), col("__n"),
        posexplode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(strideWords))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start_word")
      .select(col(idCol), col("chunk_idx"), col("start_word"),
        least(lit(chunkWords), col("__n") - col("start_word")).as("n_chunk_words"),
        md5(array_join(slice(col("__words"), col("start_word") + 1, lit(chunkWords)), " "))
          .as("chunk_hash"))
  }

  /** CCNet-style paragraph-level dedup WITH document reassembly (Wenzek et
    * al. 2020): the corpus is split into non-overlapping `chunkWords`-token
    * paragraphs, each paragraph is kept only at its FIRST occurrence
    * corpus-wide (order = (doc id, position in doc)), and every document is
    * rebuilt from its surviving paragraphs. This is the dedup that SHRINKS
    * the corpus in place — boilerplate repeated across crawls disappears
    * from every copy but the first — where [[chunkDocs]]-based dedup only
    * REPORTS duplicated windows.
    *
    * Scale shape: one explode projection (doc → paragraphs), ONE aggregate
    * on the paragraph key to elect the first occurrence
    * (min(struct(doc, pos)) — struct min compiles to a SortAggregate, but
    * its PARTIAL combine still runs map-side, never a window over the
    * exploded corpus), one join back on the key, and one aggregate to
    * reassemble. The elected-occurrence exchange is bounded by the number
    * of DISTINCT paragraphs, so hot boilerplate (the skewed key) collapses
    * before it moves. Returns (idCol, n_paragraphs, n_kept, clean_text)
    * for every input document that has at least one non-empty paragraph —
    * a fully-DEDUPED doc survives with n_kept = 0 and empty text, but an
    * EMPTY/whitespace-only doc (zero non-empty paragraphs) produces no
    * output row at all (its single empty paragraph is dropped before the
    * election, matching the SQL-oracle formulation). */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     chunkWords: Int = 10): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be positive, got $chunkWords")
    val paras = df
      .select(col(idCol), tokens(col(textCol)).as("__words"))
      .withColumn("__n", size(col("__words")))
      .select(col(idCol), col("__n"),
        posexplode(transform(
          sequence(lit(0), greatest(ceil(col("__n") / lit(chunkWords)).cast("int") - 1, lit(0))),
          i => array_join(slice(col("__words"), i * chunkWords + 1, lit(chunkWords)), " "))))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__para")
      .filter(length(col("__para")) > 0) // empty doc → one empty paragraph; drop
    val first = paras.groupBy(col("__para"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__first"))
    val kept = paras.join(first, "__para")
      .withColumn("__keep",
        col("__first")(idCol) === col(idCol) && col("__first")("__pos") === col("__pos"))
    kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_paragraphs"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(sort_array(collect_list(
          when(col("__keep"), struct(col("__pos"), col("__para")))))
          .getField("__para"), " ").as("clean_text"))
  }

  // ---- bigram-LM quality scoring (CCNet-style) ----------------------------

  /** Per-document cross-entropy under a bigram MLE language model trained on
    * the corpus itself — the CCNet/Wikipedia-LM quality-filter shape (docs
    * whose token transitions are improbable under the corpus LM score high
    * and get filtered). P(w2|w1) = c(w1,w2) / c(w1·) over all bigram
    * occurrences; doc score = -mean log2 P over its bigrams; ppl = 2^score.
    *
    * Scale shape: the LM IS a distributed table (two hash aggregates over
    * the exploded bigram stream), and scoring is a shuffle join on the
    * bigram key — at 100 TB the model never has to fit anywhere, unlike a
    * broadcast/driver-side LM. MLE on own corpus means no zero-prob terms.
    * Returns (idCol, n_bigrams, xent_bits, ppl), rounded for cross-engine
    * compare. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val big = words.withColumn("w2", lead(col("w"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("w"), col("w2"))
    val bigramCounts = big.groupBy(col("w"), col("w2")).agg(count(lit(1)).as("c12"))
    val contextCounts = big.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val logp = bigramCounts.join(contextCounts, "w")
      .select(col("w"), col("w2"),
        log2(col("c12").cast("double") / col("c1")).as("lp"))
    big.join(logp, Seq("w", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), (-avg(col("lp"))).as("__x"))
      .select(col(idCol), col("n_bigrams"),
        CypherFunctions.roundC(col("__x"), 4).as("xent_bits"),
        CypherFunctions.roundC(pow(lit(2.0), col("__x")), 4).as("ppl"))
  }

  // ---- Gopher repetition signals ------------------------------------------

  /** Repetition signals in the style of the published Gopher/MassiveText
    * filters: the fraction of document characters covered by occurrences of
    * the single most frequent word 2-gram, and by ALL duplicated word
    * 5-grams (count > 1; overlaps ignored, the standard approximation).
    * High values mark boilerplate/spam. Tie-break for the top 2-gram is
    * (count desc, gram asc) so the winner is engine-independent.
    *
    * One explode + two hash aggregates per n — no self-joins, no windows
    * over the corpus; linear at 100 TB. Returns
    * (idCol, top_bigram, top_bigram_n, top_bigram_frac, dup_5gram_frac). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol),
      length(trim(col(textCol))).cast("double").as("__chars"),
      tokens(col(textCol)).as("__words"))
    def grams(k: Int) = base.select(col(idCol), col("__chars"),
      explode(when(size(col("__words")) >= k,
        transform(sequence(lit(1), size(col("__words")) - (k - 1)),
          i => array_join(slice(col("__words"), i, lit(k)), " ")))
        .otherwise(array())).as("g"))
      .groupBy(col(idCol), col("__chars"), col("g")).agg(count(lit(1)).as("n"))
    val top2 = grams(2)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("n").desc, col("g"))))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("g").as("top_bigram"), col("n").as("top_bigram_n"),
        CypherFunctions.roundC(col("n") * length(col("g")) / col("__chars"), 4)
          .as("top_bigram_frac"))
    val dup5 = grams(5).groupBy(col(idCol), col("__chars"))
      .agg(sum(when(col("n") > 1, col("n") * length(col("g"))).otherwise(0)).as("__dup"))
      .select(col(idCol),
        CypherFunctions.roundC(col("__dup") / col("__chars"), 4).as("dup_5gram_frac"))
    top2.join(dup5, idCol)
  }

  // ---- BM25 ranking -------------------------------------------------------

  /** Okapi BM25 document ranking for a fixed query term set — the inverted
    * -index retrieval scorer. idf = ln((N - df + 0.5)/(df + 0.5) + 1)
    * (the Lucene-style always-positive form); per-term score =
    * idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl)); doc score = sum
    * over query terms present.
    *
    * Same scale shape as [[tfIdfTopTerms]]: term frequencies and document
    * frequencies are hash aggregates over the exploded token stream, corpus
    * N/avgdl ride as a broadcast 1-row aggregate, and only docs containing
    * a query term survive the semi-join — never a full-corpus sort. Ties
    * break by doc id. Returns (idCol, score, rank) for the top `k`. */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
               query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty && k > 0, "need query terms and k > 0")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val lens = df.select(col(idCol),
      tokenCount(col(textCol)).cast("double").as("__len"))
    val stats = lens.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__len")).as("__avgdl"))
    val qToks = toks.filter(col("token").isin(query.map(lit): _*))
    val tf = qToks.groupBy(col(idCol), col("token")).agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = qToks.select(col(idCol), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).cast("double").as("__df"))
    val scored = tf.join(dfreq, "token").join(lens, idCol).crossJoin(broadcast(stats))
      .withColumn("__idf", log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))
      .withColumn("__s", col("__idf") * col("__tf") * (k1 + 1) /
        (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__len") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(CypherFunctions.roundC(sum(col("__s")), 4).as("score"))
    // top-k first (TakeOrderedAndProject — no global sort), then rank the
    // k survivors; the single-partition window only ever sees k rows
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("score"), col("rank"))
  }

  // ---- deterministic epoch shuffle ----------------------------------------

  /** Deterministic training-epoch shuffle: every row gets a shard and a
    * position within that shard from arithmetic on its id alone — fully
    * reproducible across engines and runs (same multiplicative-hash idiom
    * as [[stratifiedSample]]; no RNG, no Spark-specific hash). At 100 TB
    * the real export is `write.partitionBy(shard)` + sort-within-partitions
    * on the order key — one shuffle, no global sort; the row_number here
    * materializes that order so the oracle can check it. Returns
    * (idCol, shard, pos). */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int, seed: Int = 1): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // pre-mod before the multiply: (p-1) * 2654435761 < 2^63, so the
    // arithmetic never overflows for ANY id — overflow would wrap silently
    // in Spark but raise in engines with checked arithmetic, and a silent
    // wrap is not a portable shuffle key
    val k1 = pmod(pmod(col(idCol), lit(1000000007L)) * lit(2654435761L)
      + lit(seed.toLong), lit(1000000007L))
    val k2 = pmod(pmod(col(idCol), lit(999999937L)) * lit(97654321L)
      + lit(seed.toLong), lit(999999937L))
    df.select(col(idCol), pmod(k1, lit(nShards.toLong)).as("shard"), k2.as("__k2"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__k2"), col(idCol))))
      .select(col(idCol), col("shard"), col("pos"))
  }

  // ---- CCNet perplexity buckets --------------------------------------------

  /** CCNet-style head/middle/tail quality buckets: per-language perplexity
    * terciles of the corpus bigram LM ([[bigramLmScore]]); lower perplexity
    * = head. The tercile boundaries are ONE percentile aggregate per
    * language (groups × 2 cells) broadcast back onto the scored stream —
    * deliberately NOT an ntile window, which would sort each language's
    * whole corpus inside one partition at 100 TB. (Exact `percentile`
    * buffers a distinct-value→count map per language; ppl is rounded to 4
    * decimals first, which bounds that map — at extreme per-language
    * cardinality swap in `percentile_approx`, trading the oracle's
    * exactness for fixed memory.) Thresholds round to 4 decimals so the
    * boundary comparison is engine-portable. Docs with no
    * bigrams carry no LM score and bucket as 'tail'. Returns
    * (idCol, langCol, ppl, bucket). */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        langCol: String): DataFrame = {
    val r = CypherFunctions.roundC(_: Column, 4)
    val scored = df.select(col(idCol), col(langCol))
      .join(bigramLmScore(df, idCol, textCol).select(col(idCol), col("ppl")),
        Seq(idCol), "left")
    val thr = scored.filter(col("ppl").isNotNull)
      .groupBy(col(langCol)).agg(
        r(percentile(col("ppl"), lit(1.0 / 3))).as("__t1"),
        r(percentile(col("ppl"), lit(2.0 / 3))).as("__t2"))
    scored.join(broadcast(thr), Seq(langCol), "left")
      .select(col(idCol), col(langCol), col("ppl"),
        when(col("ppl").isNull, lit("tail"))
          .when(col("ppl") <= col("__t1"), lit("head"))
          .when(col("ppl") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  // ---- token-budget mixture allocation --------------------------------------

  /** Allocate a global training-token budget across strata by temperature
    * weighting on TOKEN counts (the budget is tokens, so shares weight
    * token mass, not doc counts — a stratum of few huge docs competes
    * honestly with many small ones). Per stratum:
    * share = tokens^alpha / Σ tokens^alpha, alloc = floor(budget · share),
    * epochs = alloc / tokens (>1 ⇒ the stratum repeats). Two hash
    * aggregates + a broadcast 1-row total; nothing is driver-side.
    * Returns (stratumCol, n_docs, n_tokens, temp_share, alloc_tokens,
    * epochs). */
  def mixTokenBudget(df: DataFrame, idCol: String, textCol: String,
                     stratumCol: String, alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val r = CypherFunctions.roundC(_: Column, 4)
    val stats = df.groupBy(col(stratumCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col(textCol))).cast("long").as("n_tokens"))
    val tot = stats.agg(sum(pow(col("n_tokens"), alpha)).as("__w"))
    stats.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        r(pow(col("n_tokens"), alpha) / col("__w")).as("temp_share"),
        // rounded double, not floor: floor would turn a 1-ulp cross-engine
        // difference at an integer boundary into an off-by-one token count
        r(lit(budget.toDouble) * pow(col("n_tokens"), alpha) / col("__w"))
          .as("alloc_tokens"),
        r(lit(budget.toDouble) * pow(col("n_tokens"), alpha) / col("__w")
          / col("n_tokens")).as("epochs"))
  }

  // ---- DSIR: data selection via importance resampling ----------------------

  /** Engine-portable feature hash: polynomial fold over the character codes
    * of an ASCII-normalized token, `h = fold(h * 131 + code) mod 1000003`,
    * starting from 0 — step one yields the first code, identical to
    * DuckDB's `list_reduce` (which seeds with the first element). Tokens
    * are lowercased and stripped to [a-z0-9] BEFORE hashing so both
    * engines fold the same byte sequence (CCNet-style normalization; DSIR
    * is collision-tolerant by construction, so the cheap hash costs
    * nothing in selection quality). Implemented by the native codegen'd
    * [[graft.functions.PolyHash]] — the HOF formulation
    * (`aggregate(transform(split(…)))`) is CodegenFallback and its
    * per-CHARACTER interpreted lambdas dominated the whole DSIR operator. */
  def featureHash(tok: Column): Column = call_function("graft_polyhash", tok)

  /** Normalized unigram + bigram feature STRINGS of a text — the hashed
    * n-gram feature space of DSIR (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"); hashing happens after
    * explode so it runs as one codegen'd expression per feature, not
    * inside a HOF lambda. Bigrams join with '_' so they share one hash
    * function with unigrams. */
  private def featureStrings(text: Column): Column = {
    val norm = filter(
      transform(tokens(text), t => regexp_replace(lower(t), "[^a-z0-9]", "")),
      t => length(t) > 0)
    // slice length must be computed (start+length overflows on a
    // Int.MaxValue sentinel → empty array); zip_with pads the shorter side
    // with null → the trailing concat is null; drop it rather than hash it
    val bi = filter(
      zip_with(norm, slice(norm, lit(2), greatest(size(norm) - 1, lit(0))),
        (a, b) => concat(a, lit("_"), b)),
      f => f.isNotNull)
    concat(norm, bi)
  }

  /** DSIR importance resampling: score every document by how much more
    * likely its hashed-n-gram features are under the target slice's unigram
    * bucket model than under the raw corpus's, then take the Gumbel-top-k —
    * the standard way to materialize "sample k docs with probability
    * proportional to the importance weight" deterministically.
    *
    * Per-doc log-weight (add-1 smoothed over `buckets`):
    *   logw = Σ_f [ln(ct_f + 1) − ln(cr_f + 1)] + n_f · ln((R + B)/(T + B))
    * with ct/cr = target/raw occurrence counts of the feature's bucket and
    * T/R their totals. The Gumbel key reuses the corpus-wide multiplicative-
    * hash idiom (no RNG): u = ((id·2654435761) mod 10^6 + 0.5)/10^6,
    * g = logw − ln(−ln u). Both scores round to 4 decimals before ranking
    * so the order is engine-independent; ties break on id.
    *
    * Scale shape: feature extraction is a per-row transform + one explode;
    * the bucket LM is ONE hash aggregate collapsing to ≤ `buckets` rows
    * (broadcast back onto the exploded features); per-doc weights are one
    * more hash aggregate. Selection takes the k-th composite key via a
    * distributed top-k (TakeOrderedAndProject + 1-row aggregate, broadcast)
    * — there is no global window anywhere, so nothing is single-partition
    * at 100 TB. Returns (idCol, n_feats, logw, g, selected). */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
                   isTarget: Column, buckets: Int, k: Int): DataFrame = {
    require(buckets > 0 && k > 0, s"buckets=$buckets k=$k must be positive")
    // materialize the hashed feature stream ONCE (executor-local blocks,
    // never the driver): it feeds BOTH the bucket-LM and the per-doc
    // aggregate — without the cut, each branch re-tokenizes the corpus AND
    // re-plans/re-codegens the (large) HOF feature-expression tree, which
    // dominated the operator at catalog scale. (id, flag, bucket) is 3
    // numbers per feature — the natural DSIR intermediate at any scale.
    val feats = df.select(col(idCol), isTarget.as("__t"),
        explode(featureStrings(col(textCol))).as("__f"))
      .select(col(idCol), col("__t"),
        pmod(featureHash(col("__f")), lit(buckets.toLong)).as("__b"))
      .localCheckpoint(true)
    // bucket LM: one combined aggregate for target and raw counts; the
    // totals ride along as a broadcast 1-row aggregate, never a collect
    val lm = feats.groupBy(col("__b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
      count(lit(1)).as("__cr"))
    val tot = lm.agg(sum(col("__ct")).cast("double").as("__T"),
      sum(col("__cr")).cast("double").as("__R"))
    val perDoc = feats.join(broadcast(lm), "__b")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_feats"),
        sum(log(col("__ct") + 1d) - log(col("__cr") + 1d)).as("__s"))
    val scored = df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        CypherFunctions.roundC(
          coalesce(col("__s"), lit(0d)) +
            coalesce(col("n_feats"), lit(0L)) *
              (log(col("__R") + buckets) - log(col("__T") + buckets)), 4).as("logw"))
      .withColumn("__u",
        (pmod(pmod(col(idCol), lit(1000000007L)) * lit(2654435761L),
          lit(1000000L)).cast("double") + 0.5d) / 1000000d)
      .withColumn("g", CypherFunctions.roundC(
        col("logw") - log(-log(col("__u"))), 4))
      .withColumn("__key", struct((-col("g")).as("ng"), col(idCol).as("i")))
    // exact k-th composite key, distributed: sort-limit-k is planned as
    // TakeOrderedAndProject; the 1-row max broadcasts as the threshold
    val kth = scored.select(col("__key")).orderBy(col("__key")).limit(k)
      .agg(max(col("__key")).as("__kth"))
    scored.crossJoin(broadcast(kth))
      .select(col(idCol), col("n_feats"), col("logw"), col("g"),
        (col("__key") <= col("__kth")).as("selected"))
  }

  // ---- deterministic weighted sampling (Efraimidis–Spirakis) ----------------

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * IPL 97(5)): each row draws key = ln(u)/w — the log form of u^(1/w) —
    * and the k LARGEST keys are exactly a w-weighted sample without
    * replacement (the token-weighted document selection step of a corpus
    * pipeline). u comes from the corpus multiplicative-hash idiom (same
    * as DSIR's Gumbel draw): no RNG, reproducible across engines and
    * runs. Rows with weight ≤ 0 are never eligible. Ids must be
    * NON-NEGATIVE: the multiplicative-hash `pmod` and a SQL oracle's `%`
    * diverge on negative operands (same precondition as
    * [[graft.algo.Algorithms.triangleCountApprox]]).
    *
    * Scale shape: one scan + a codegen'd projection; the k-th composite
    * key is TakeOrderedAndProject + a broadcast 1-row max, so selection
    * never becomes a global sort or window. Returns every eligible row
    * with (idCol, weight, key, selected); key rounded to 6 so the
    * boolean's tie-break is engine-portable. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val scored = df
      .select(col(idCol), weight.cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("__u",
        (pmod(pmod(col(idCol), lit(1000000007L)) * lit(2654435761L),
          lit(1000000L)).cast("double") + 0.5d) / 1000000d)
      .withColumn("key",
        CypherFunctions.roundC(log(col("__u")) / col("weight"), 6))
      .withColumn("__k", struct((-col("key")).as("nk"), col(idCol).as("i")))
    val kth = scored.select(col("__k")).orderBy(col("__k")).limit(k)
      .agg(max(col("__k")).as("__kth"))
    scored.crossJoin(broadcast(kth))
      .select(col(idCol), col("weight"), col("key"),
        (col("__k") <= col("__kth")).as("selected"))
  }

  // ---- harmonic bin packing (no-split token budgets) ------------------------

  /** Harmonic bin packing of whole documents into fixed token budgets
    * (Lee & Lee 1985): a doc with n tokens lands in fit-class
    * f = floor(capacity / n) (how many such docs fit one bin; oversize docs
    * get f = 1 and their own truncated bin), docs are ranked inside
    * (shard, class) by descending size, and bins take f consecutive ranks.
    * Every bin's token total is ≤ f · (capacity / f) ≤ capacity by
    * construction, and harmonic packing's waste is provably bounded
    * (≤ 1.691× optimal) — unlike [[packSequences]], which concatenates and
    * SPLITS documents across chunk boundaries, this packs each document
    * whole, the shape needed for SFT examples that cannot straddle windows.
    *
    * Scale shape: one scan computes (n_tokens, class); the only ordering is
    * a window PARTITIONED BY (shard, class) — parallelism is shards ×
    * classes, strictly finer than [[packSequences]]'s per-shard windows,
    * and no state crosses partitions. Returns
    * (idCol, shardCol, n_tokens, fit, bin, pos). */
  def packHarmonic(df: DataFrame, idCol: String, textCol: String,
                   shardCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val base = df.select(col(idCol), col(shardCol),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("fit",
        when(col("n_tokens") >= capacity || col("n_tokens") <= 0, lit(1L))
          .otherwise(floor(lit(capacity.toLong) / col("n_tokens"))))
    val w = Window.partitionBy(col(shardCol), col("fit"))
      .orderBy(col("n_tokens").desc, col(idCol))
    base
      .withColumn("__rk", row_number().over(w) - 1)
      .withColumn("bin", floor(col("__rk") / col("fit")))
      .withColumn("pos", (col("__rk") % col("fit")).cast("int"))
      .drop("__rk")
  }

  // ---- naive-Bayes quality classifier ---------------------------------------

  /** Multinomial naive-Bayes quality classifier with corpus-self-supervised
    * labels — the fastText/FineWeb-Edu quality-filter shape without an
    * external model: documents passing a cheap heuristic (word count within
    * `[minWords, maxWords]` and duplicate-token fraction ≤ `dupCut`) are the
    * positive exemplars, the rest negative; a Laplace-smoothed token
    * log-odds model is trained from those labels in one pass and every
    * document is re-scored by it. The learned score generalizes the seed
    * rule: it transfers token-level evidence from labeled to unlabeled
    * regions, which is why production pipelines train a classifier instead
    * of shipping the heuristic.
    *
    * Scale shape: training is ONE token explode + hash aggregate (per-token
    * class counts); the class totals and vocabulary size are a broadcast
    * 1-row aggregate of that table, and the document prior another — the
    * model is a DISTRIBUTED table keyed by token, never driver-side.
    * Scoring joins the log-odds table back on the same exploded stream and
    * sums per document — shuffle ∝ token count, linear at 100 TB. Zero-token
    * documents keep a row (score = prior alone). Returns
    * (idCol, n_words, label, nb_score, predicted); `predicted` compares the
    * ROUNDED score to 0 so the boolean is reproducible across engines. */
  /** The corpus-self-supervised quality label shared by [[nbQualityScore]],
    * [[nbHashedModel]], and the composed pipeline entry: word count within
    * the band AND duplicate-token fraction at most `dupCut`; zero-token
    * docs are negative (the dup-fraction division never runs). ONE
    * definition so the classifier's training labels and any gate built on
    * the rule cannot desynchronize. `toks` must be the [[tokens]] array. */
  def heuristicQualityLabel(toks: Column, minWords: Int = 20,
                            maxWords: Int = 200,
                            dupCut: Double = 0.5): Column = {
    val nw = size(toks)
    when(nw === 0, lit(false)).otherwise(
      nw.between(minWords, maxWords) &&
        (lit(1.0) - size(array_distinct(toks)).cast("double") / nw) <= dupCut)
  }

  def nbQualityScore(df: DataFrame, idCol: String, textCol: String,
                     minWords: Int = 20, maxWords: Int = 200,
                     dupCut: Double = 0.5): DataFrame = {
    require(minWords <= maxWords, s"minWords $minWords > maxWords $maxWords")
    val base = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__nw", size(col("__toks")))
      .withColumn("label",
        heuristicQualityLabel(col("__toks"), minWords, maxWords, dupCut))
    val tok = base.select(col(idCol), col("label"),
      explode(col("__toks")).as("__tok"))
    val counts = tok.groupBy(col("__tok")).agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("__cp"),
      sum(when(col("label"), 0L).otherwise(1L)).as("__cn"))
    val totals = counts.agg(sum(col("__cp")).as("__np"),
      sum(col("__cn")).as("__nn"), count(lit(1)).as("__v"))
    val logOdds = counts.crossJoin(broadcast(totals))
      .select(col("__tok"),
        (log((col("__cp") + 1.0) / (col("__np") + col("__v")))
          - log((col("__cn") + 1.0) / (col("__nn") + col("__v")))).as("__lo"))
    // degenerate corpora (all one class) raise IN the plan instead of
    // silently nulling every score: log(P/0) is null in Spark and the
    // nulls would flow to nb_score/predicted without this guard
    val prior = base.agg(
      when(sum(when(col("label"), 1L).otherwise(0L)) === 0 ||
        sum(when(col("label"), 0L).otherwise(1L)) === 0,
        raise_error(lit("nbQualityScore: the heuristic labeled every " +
          "document one class — adjust minWords/maxWords/dupCut")))
        .otherwise(
          log(sum(when(col("label"), 1L).otherwise(0L)).cast("double")
            / sum(when(col("label"), 0L).otherwise(1L)))).as("__prior"))
    val docScore = tok.join(logOdds, "__tok")
      .groupBy(col(idCol)).agg(sum(col("__lo")).as("__s"))
    base.join(docScore, Seq(idCol), "left").crossJoin(broadcast(prior))
      .select(col(idCol), col("__nw").cast("long").as("n_words"), col("label"),
        CypherFunctions.roundC(
          col("__prior") + coalesce(col("__s"), lit(0.0)), 4).as("nb_score"))
      .withColumn("predicted", col("nb_score") > 0.0)
  }

  /** Hash-bucketed variant of the [[nbQualityScore]] model — the fastText
    * DEPLOYMENT shape: tokens hash to `buckets` fixed slots
    * (graft_polyhash % B, collisions merge counts), so the trained model is
    * a bounded B-double array regardless of corpus size. Training stays the
    * one-explode + hash-aggregate plan; ONLY the B-bucket reduction is
    * collected (bounded by construction, same class as k-bounded seed
    * collects — at 100 TB the array is still `buckets` doubles). Buckets no
    * training token hashed into carry the Laplace default, so unseen
    * stream tokens score neutrally rather than erroring. Returns
    * (per-bucket log-odds array, document prior). */
  def nbHashedModel(df: DataFrame, idCol: String, textCol: String,
                    buckets: Int = 4096, minWords: Int = 20,
                    maxWords: Int = 200, dupCut: Double = 0.5): (Seq[Double], Double) = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = df.select(tokens(col(textCol)).as("__toks"))
      .withColumn("label",
        heuristicQualityLabel(col("__toks"), minWords, maxWords, dupCut))
    val hb = base.select(col("label"), explode(col("__toks")).as("__tok"))
      .select(col("label"), pmod(featureHash(col("__tok")), lit(buckets.toLong))
        .cast("int").as("__bk"))
    val counts = hb.groupBy(col("__bk")).agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("__cp"),
      sum(when(col("label"), 0L).otherwise(1L)).as("__cn"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val np = counts.valuesIterator.map(_._1).sum.toDouble
    val nn = counts.valuesIterator.map(_._2).sum.toDouble
    val lo = (0 until buckets).map { b =>
      val (cp, cn) = counts.getOrElse(b, (0L, 0L))
      math.log((cp + 1.0) / (np + buckets)) - math.log((cn + 1.0) / (nn + buckets))
    }
    val labels = base.agg(
      coalesce(sum(when(col("label"), 1L).otherwise(0L)), lit(0L)).as("p"),
      coalesce(sum(when(col("label"), 0L).otherwise(1L)), lit(0L)).as("n")).head()
    val (p, nl) = (labels.getLong(0), labels.getLong(1))
    require(p > 0 && nl > 0,
      "nbHashedModel: the heuristic labeled every document one class " +
        s"(positives=$p, negatives=$nl) — adjust minWords/maxWords/dupCut")
    (lo, math.log(p.toDouble / nl))
  }

  /** Stateless quality scoring against a pre-trained hashed NB model —
    * works unchanged on a STREAMING DataFrame (pure per-row projection:
    * no aggregation, no state store, plain append mode). The model rides
    * as a literal array column (fixed `buckets` doubles broadcast with the
    * plan); each token costs one polyhash + one O(1) array lookup inside
    * the fold. Returns (idCol, n_words, nb_score, predicted). */
  def nbQualityApply(docs: DataFrame, idCol: String, textCol: String,
                     modelLogOdds: Seq[Double], prior: Double): DataFrame = {
    val arr = typedlit(modelLogOdds)
    val b = lit(modelLogOdds.size.toLong)
    val toks = tokens(col(textCol))
    docs
      .select(col(idCol), size(toks).cast("long").as("n_words"),
        CypherFunctions.roundC(
          lit(prior) + aggregate(toks, lit(0.0), (acc, t) =>
            acc + element_at(arr, (pmod(featureHash(t), b) + 1).cast("int"))),
          4).as("nb_score"))
      .withColumn("predicted", col("nb_score") > 0.0)
  }
}
