package graft.operators

import graft.Fp
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-data pipelines (north star BASELINE.json:6):
  * per-language stats, TF-IDF, language-ID heuristic, quality scoring,
  * token counting, order-sensitive document fingerprinting.
  *
  * Everything is built-in expressions (codegen'd); the only shuffles
  * are the per-key aggregations. TF-IDF's doc-frequency side is a
  * term-level aggregate joined back broadcast-style (terms ≪ docs at
  * scale after a min-df cut).
  */
object TextQueries {

  private def words(c: Column): Column = split(c, " ")

  /** Tokenize + per-language document/char stats. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_words", size(words(col("text"))))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        Fp.r4(avg("n_chars")).as("avg_chars"),
        sum(col("n_words").cast("long")).as("sum_words"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  /** TF-IDF top-3 terms per document (docs < 100), deterministic
    * tie-break by term. idf = ln(N/df) over the full corpus. */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("tfidf"), asc("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        Fp.r4(col("tf") * log(col("n_docs").cast("double") / col("df"))))
      .filter(col("doc_id") < 100)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term", "tfidf")
      .orderBy("doc_id", "rank")
  }

  /** Stopword lists per language for the language-ID heuristic.
    * Deterministic and CASE-expressible so DuckDB can replay it. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und"),
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("de", "le", "shi"))

  /** N-gram/stopword-ratio language ID: score each language by its
    * marker-token count; predict the argmax (ties → alphabetical,
    * i.e. the Seq order above). On this synthetic corpus accuracy is
    * incidental — the operator shape (vectorized token-set scoring,
    * no UDF) is what carries to real data. */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val toks = words(col("text"))
    val scores: Seq[Column] = langMarkers.map { case (lang, ms) =>
      size(filter(toks, t => t.isin(ms.map(x => x: Any): _*))).as(s"s_$lang")
    }
    // argmax with first-wins tie-break via a single greatest() compare
    val pred = langMarkers.foldRight(lit("??")) { case ((lang, _), acc) =>
      val others = langMarkers.filter(_._1 != lang).map(l => col(s"s_${l._1}"))
      when(col(s"s_$lang") >= greatest(others: _*), lit(lang)).otherwise(acc)
    }
    t(s, dir, "documents")
      .select((col("doc_id") +: col("lang") +: scores): _*)
      .withColumn("pred_lang", pred)
      .withColumn("is_match", (col("lang") === col("pred_lang")).cast("int"))
      .select("doc_id", "lang", "pred_lang", "is_match")
      .orderBy("doc_id")
  }

  /** Quality score from length / lexical diversity / mean word length
    * — pure arithmetic, identical in the oracle. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    t(s, dir, "documents")
      .withColumn("n_words", size(w))
      .withColumn("n_distinct", size(array_distinct(w)))
      .withColumn("len_score",
        least(lit(1.0), col("n_chars").cast("double") / 500.0))
      .withColumn("diversity",
        col("n_distinct").cast("double") / col("n_words"))
      .withColumn("avg_word_len",
        (col("n_chars") - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("quality",
        Fp.r4(lit(0.3) * col("len_score") + lit(0.4) * col("diversity") +
          lit(0.3) * least(lit(1.0), col("avg_word_len") / 10.0)))
      .select("doc_id", "n_words", "n_distinct", "quality")
      .orderBy("doc_id")
  }

  /** Token counting two ways: whitespace and a BPE-ish regex
    * ([a-z]+ / digit-runs / single other chars). */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(words(col("text"))).as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Order-sensitive integer fingerprint: Σ pos·7919 + len(tok)·131 +
    * ascii(first char), mod 2³¹−1. All-integer math ⇒ bit-identical in
    * DuckDB; position factor makes token order matter (rolling-hash
    * style) while staying SQL-expressible. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(words(col("text"))))
      .select(col("doc_id"),
        ((col("pos") + 1).cast("long") * 7919 +
          length(col("col")).cast("long") * 131 +
          ascii(col("col")).cast("long")).as("term_h"))
      .groupBy("doc_id")
      .agg((sum("term_h") % 2147483647L).as("fingerprint"))
      .orderBy("doc_id")

  /** End-to-end corpus-cleaning COMPOSITION — the shape a training-data
    * pipeline actually runs: exact-dedup survivors → quality gate →
    * per-(lang, source) corpus stats. One pass over documents feeding a
    * narrow hash-dedup shuffle, then integer-exact quality predicates
    * (2·distinct ≥ words avoids an FP threshold entirely), then a
    * two-phase aggregate — three shuffles total at any scale, text
    * never shuffles (the dedup key is the sha2 digest). */
  def pipelineCleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val survivors = docs
      .groupBy(sha2(col("text"), 256).as("text_sha"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val w = words(col("text"))
    docs.join(survivors, "doc_id")
      .withColumn("n_words", size(w))
      .withColumn("n_distinct", size(array_distinct(w)))
      .filter(col("n_words") >= 5 &&
        col("n_distinct") * 2 >= col("n_words"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("sum_words"),
        Fp.r4(avg(col("n_distinct").cast("double") / col("n_words")))
          .as("avg_diversity"))
      .orderBy("lang", "source")
  }

  /** Corpus-level frequent items: top-25 WORDS by document frequency
    * (the exact path; shingles() would lift the same shape to n-grams).
    * explode → distinct per doc →
    * two-phase count → TakeOrderedAndProject; ROUNDED-free (all
    * integers) and fully deterministic via the (count desc, word)
    * tie-break. At 100 TB the exact path holds as long as the
    * vocabulary fits a shuffle (words/n-grams do); past that the
    * mergeable-sketch path (text_heavy_hitters) takes over. */
  def textTopWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .distinct()
      .groupBy("word")
      .agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("word"))
      .limit(25)

  val HhK = 50

  /** Heavy hitters via SKETCH + EXACT VERIFY — the production pattern
    * when the vocabulary itself is too big to count exactly: pass 1
    * folds each partition into a ≤50-entry Misra–Gries summary (custom
    * typed Aggregator, mergeable state — only k counters cross the
    * shuffle); pass 2 re-counts ONLY the ≤50 candidates (broadcast
    * semi-join, so the full vocabulary never shuffles) and keeps those
    * with exact count·(k+1) > N — an integer-exact threshold. The MG
    * guarantee (candidates ⊇ every word with count > N/(k+1),
    * regardless of merge order) makes the final output deterministic
    * and ORACLE-ABLE even though the sketch state itself is
    * partitioning-dependent. */
  def textHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val terms = t(s, dir, "documents")
      .select(explode(words(col("text"))).as("word"))
    // .name (not .as) keeps the TypedColumn through the typed select
    val sketch = terms.as[String]
      .select(graft.functions.MisraGries(HhK).toColumn.name("sketch"))
    val cand = sketch.toDF("sketch")
      .select(explode(col("sketch"))).select(col("key").as("word"))
    val total = terms.agg(count(lit(1)).as("total"))
    terms.join(broadcast(cand), "word")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (HhK + 1) > col("total"))
      .select("word", "cnt")
      .orderBy(desc("cnt"), asc("word"))
  }

  /** BM25 top-3 terms per document (docs < 100) — the ranking function
    * retrieval-based data curation actually uses (tf saturation + doc-
    * length normalization), same join shape as [[textTfidf]]: term
    * explode → (doc,term) tf → term df (broadcast-sized after the
    * aggregate) → one broadcast scalar (n_docs, avgdl). Constants
    * k1=1.2, b=0.75 appear as the same literals in the oracle so every
    * FP op is a single identical IEEE op in both engines; avgdl comes
    * from an exact BIGINT sum / exact count. */
  def textBm25(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) +
        lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("bm25"), asc("term"))
    tf.join(df, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
      .withColumn("bm25", Fp.r4(idf * tfNorm))
      .filter(col("doc_id") < 100)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term", "bm25")
      .orderBy("doc_id", "rank")
  }

  /** Text normalization — the first stage of every corpus pipeline:
    * lowercase, strip non-alphanumerics, collapse whitespace, trim.
    * Runs over events.props (the one column with punctuation/digits to
    * actually normalize). Pure per-row projection, zero shuffles before
    * the final sort; the md5 digest makes the oracle comparison cover
    * the full normalized string without shipping it. */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_id") < 200)
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower(col("props")), "[^a-z0-9 ]", ""), " +", " ")))
      .select(col("event_id"),
        length(col("norm")).as("n_chars_norm"),
        md5(col("norm").cast("binary")).as("digest"))
      .orderBy("event_id")

  /** Sequence packing — the "concatenate then chunk" step that turns a
    * cleaned corpus into fixed-budget training sequences: documents are
    * laid end-to-end per language in doc_id order and every document is
    * assigned to the 512-token bin its STARTING offset falls in
    * (bin = start_offset div 512). One running-sum window per language
    * partition + one aggregation — all-integer, so the oracle is exact,
    * and the window scales as the per-partition sort (the same shape as
    * win_running). */
  def pipelinePackBins(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    t(s, dir, "documents")
      .withColumn("tokens", size(words(col("text"))).cast("long"))
      .withColumn("start_off", coalesce(sum("tokens").over(w), lit(0L)))
      .withColumn("bin", expr("start_off div 512"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("tokens").as("sum_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "bin")
  }

  /** Tokens per packed training sequence for [[pipelinePackSequences]].
    * 512 keeps sf0.001 output multi-row; the math is L-agnostic. */
  val PackSeqLen = 512L

  /** Bucket width (in doc_id units) for the two-level prefix sum in
    * [[pipelinePackSequences]] — any monotone doc_id → bucket map
    * works; div keeps buckets contiguous so the carry frame is tiny. */
  val PackBucketW = 4096L

  /** Exact concat-and-chunk sequence packing — the step that turns a
    * tokenized corpus into fixed 512-token pretraining sequences, with
    * documents SPLIT across sequence boundaries (unlike
    * [[pipelinePackBins]], which assigns whole docs to the bin of
    * their start offset). Per sequence: how many docs contribute, the
    * exact token count (= 512 everywhere but the tail), and the
    * first/last contributing doc.
    *
    * Scale design — the global token offset is the crux. A single
    * `Window.orderBy(doc_id)` running sum would move the corpus to one
    * task, so offsets come from a TWO-LEVEL prefix sum (the
    * win_concurrency decomposition): per-bucket local running sums
    * (bucket = doc_id div [[PackBucketW]], a partitioned window), plus
    * a carry computed on the #buckets-row summary frame and broadcast
    * back. The boundary explode then emits one row per (doc, spanned
    * sequence) — fan-out 1 + tokens/L per doc, bounded by corpus
    * token count / L overall, never rows². All-integer arithmetic, so
    * the DuckDB oracle (one global window over the same doc order)
    * replays it exactly — the hash proves the decomposition is
    * invisible. */
  def pipelinePackSequences(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = PackSeqLen
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("toks"))
      .withColumn("bucket", expr(s"doc_id div $PackBucketW"))
    val local = docs.withColumn("loc",
      coalesce(sum("toks").over(Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // carry: exclusive prefix over per-bucket totals — #buckets rows,
    // the only unpartitioned window, never sees document rows
    val carry = docs.groupBy("bucket").agg(sum("toks").as("tot"))
      .withColumn("off0",
        coalesce(sum("tot").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "off0")
    local.join(broadcast(carry), "bucket")
      .withColumn("off", col("off0") + col("loc"))
      .withColumn("seq_id",
        explode(sequence(expr(s"off div $L"), expr(s"(off + toks - 1) div $L"))))
      .withColumn("seq_toks",
        least(col("off") + col("toks"), (col("seq_id") + 1) * L)
          - greatest(col("off"), col("seq_id") * L))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("seq_toks").as("n_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("seq_id")
  }

  /** Dataset card — the summary a curation pipeline PUBLISHES with the
    * corpus (docs/tokens/chars totals, per-language and per-source
    * composition, exact-duplicate count), emitted long-format as
    * (metric, key, value) rows so one schema carries every statistic.
    * Each branch is its own bounded aggregate (1, #langs, #sources
    * rows); the only non-trivial shuffle is the exact distinct over
    * content digests, the same single-digest-shuffle shape as
    * dedup_exact. All-integer ⇒ exact oracle. */
  def pipelineDatasetCard(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("lang"), col("source"),
        size(words(col("text"))).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"),
        sha2(col("text"), 256).as("sha"))
    val total = d
      .agg(count(lit(1)).as("docs"), sum("toks").as("tokens"),
        sum("chars").as("nchars"), countDistinct("sha").as("uniq"))
      .select(explode(array(
        struct(lit("docs_total").as("metric"), lit("").as("key"),
          col("docs").as("value")),
        struct(lit("tokens_total").as("metric"), lit("").as("key"),
          col("tokens").as("value")),
        struct(lit("chars_total").as("metric"), lit("").as("key"),
          col("nchars").as("value")),
        struct(lit("dup_docs").as("metric"), lit("").as("key"),
          (col("docs") - col("uniq")).as("value")))).as("m"))
      .select("m.*")
    val byLang = d.groupBy(col("lang").as("key"))
      .agg(count(lit(1)).as("value"))
      .select(lit("docs_lang").as("metric"), col("key"), col("value"))
    val bySource = d.groupBy(col("source").as("key"))
      .agg(count(lit(1)).as("value"))
      .select(lit("docs_source").as("metric"), col("key"), col("value"))
    total.unionByName(byLang).unionByName(bySource)
      .orderBy("metric", "key")
  }

  /** posexplode_outer — the generator (UDTF) variant that KEEPS rows
    * whose array is empty, emitting (null, null): long words per doc,
    * with empty-result docs preserved. The lateral explode is
    * partition-local (zero shuffle); output size is bounded by total
    * token count, never rows². */
  def udtfPosexplodeOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode_outer(filter(words(col("text")), w => length(w) > 6)))
      .withColumnRenamed("col", "word")
      .orderBy(asc("doc_id"), asc_nulls_first("pos"))

  /** Corpus bigram counts (the n-gram language-model building block):
    * each doc's word list zipped with its own tail, exploded, counted,
    * global top-20 with a lexicographic tie-break. The zip/explode is
    * partition-local; only (bigram, partial count) rows shuffle —
    * counts, never text. Top-k compiles to TakeOrderedAndProject. */
  /** Bigram language-model statistics — the conditional distribution
    * P(w₂|w₁) = c(w₁w₂)/c(w₁·) an n-gram LM estimates, restricted to
    * the 20 highest-continuation contexts so the output stays
    * bounded. Unlike textBigrams (raw joint counts), this emits the
    * per-context CONDITIONAL with a deterministic top-3 continuation
    * cut (count desc, word asc). Two aggregations over one exploded
    * projection — the context totals come from re-aggregating the
    * bigram counts (vocabulary-sized, never corpus-sized) and join
    * back broadcast; probability is a single division over exact
    * counts. The (context, count) ordering ties break on the word, so
    * ranks are engine-identical. */
  def textBigramLm(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    val bigrams = zip_with(
      slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bc = t(s, dir, "documents")
      .select(explode(bigrams).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
    val ctx = bc.groupBy("w1").agg(sum("n").as("ctx_total"))
      .orderBy(desc("ctx_total"), asc("w1")).limit(20)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("w1").orderBy(desc("n"), asc("w2"))
    bc.join(broadcast(ctx), "w1")
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 3)
      .select(col("w1"), col("rank"), col("w2"), col("n"),
        Fp.r4(col("n").cast("double") / col("ctx_total")).as("p"))
      .orderBy("w1", "rank")
  }

  /** COLLOCATION mining — bigrams ranked by pointwise association
    * (lift = P(w1w2) / (P(w1·)·P(·w2)), the monotone integer core of
    * PMI), the phrase-detection pass (word2vec's phrase step, spaCy's
    * collocation finder) a corpus pipeline runs to merge "new york"
    * into one token. Differs from text_bigrams (raw counts rank
    * frequent-but-independent pairs first) and text_bigram_lm (the
    * conditional P(w₂|w₁)): lift normalizes BOTH marginals, so rare
    * strongly-bound pairs surface.
    *
    * All counts derive from the one bigram table (left/right
    * marginals + total), materialized ONCE — three re-derivations of
    * the tokenize+explode otherwise. lift_bp = (10⁴·n·N) div (c1·c2)
    * stays in int64 up to ~10⁷ bigram tokens (sf1); beyond that the
    * two factors move to DECIMAL(38,0). Min-support [[ColMinCount]]
    * kills the 1-count noise floor first, so the ranked join is
    * support-pruned before any marginal joins. Marginals are
    * vocab-sized; the 1-row total broadcasts (intended BNLJ). */
  /** RAG-style CHUNKING with overlap — the retrieval-prep pass that
    * splits every document into fixed-size overlapping windows
    * ([[ChunkLen]] chars, stride [[ChunkStride]], so consecutive
    * chunks share ChunkLen−ChunkStride chars and no sentence is lost
    * at a boundary). Emits the per-document chunking manifest with
    * two verifiable invariants as columns: total chunk chars and a
    * coverage flag (the last chunk ends exactly at n_chars) — so the
    * oracle pins not just how many chunks but that they tile the
    * document.
    *
    * Scale: the offset fan-out is a per-row `sequence` + explode —
    * partition-local, never a shuffle; the only shuffle is the
    * per-doc aggregate, keyed on doc_id (unique ⇒ perfectly
    * balanced). Chunk COUNT per doc is ⌈(n_chars−len)/stride⌉+1, so
    * the fan-out is ~n_chars/stride ≈ 7× rows of offsets for 1 kB
    * docs — metadata-sized, the chunk text itself is never
    * materialized here (a downstream consumer substrings on demand). */
  val ChunkLen = 200
  val ChunkStride = 150
  def pipelineChunk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("nc"))
      .withColumn("k", expr(
        s"1 + greatest(0, (nc - $ChunkLen + ${ChunkStride - 1}) div $ChunkStride)"))
      .withColumn("i", explode(sequence(lit(0), col("k") - 1)))
      .withColumn("off", lit(1) + col("i") * ChunkStride)
      .withColumn("len", length(expr(s"substring(text, off, $ChunkLen)")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("len").as("chunk_chars"),
        (max(col("off") + col("len") - 1) === max(col("nc"))).as("covered"))
      .orderBy("doc_id")

  val ColMinCount = 5
  val ColTopK = 20
  def textCollocations(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    val bigrams = zip_with(
      slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bc = t(s, dir, "documents")
      .select(explode(bigrams).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val left = bc.groupBy("w1").agg(sum("n").as("c1"))
    val right = bc.groupBy("w2").agg(sum("n").as("c2"))
    val tot = bc.agg(sum("n").as("nn"))
    bc.filter(col("n") >= ColMinCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(tot))
      .withColumn("lift_bp", expr("(10000 * n * nn) div (c1 * c2)"))
      .select("w1", "w2", "n", "c1", "c2", "lift_bp")
      .orderBy(desc("lift_bp"), asc("w1"), asc("w2")).limit(ColTopK)
  }

  def textBigrams(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    val bigrams = zip_with(
      slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1),
      (a, b) => concat(a, lit(" "), b))
    t(s, dir, "documents")
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(20)
  }

  /** Grams with train-side document frequency above this are dropped
    * before the contamination join: a ubiquitous gram (license
    * boilerplate, template headers) carries no contamination signal but
    * fans the gram equi-join out by |eval_docs(g)|×|train_docs(g)| —
    * the single-key shuffle explosion that kills decontamination jobs
    * at corpus scale. Production pipelines cap exactly like this; the
    * cap is part of the query's spec and the oracle replays it. */
  val ContaminationMaxDf = 10

  /** Train/eval contamination check (decontamination): the corpus is
    * hash-split (same key-hash family as SampleQueries — eval =
    * buckets ≥ 95), docs shingle into 5-word grams, and an equi-join
    * on gram surfaces every eval doc sharing a (non-ubiquitous) gram
    * with the training side. Output per contaminated eval doc: number
    * of distinct shared grams + total train-doc hits those grams carry.
    *
    * Scale: the train side pre-aggregates to (gram, df) and drops
    * grams with df > [[ContaminationMaxDf]] BEFORE the join, so no
    * gram can fan out more than MaxDf-fold and the join output is
    * ≤ |eval grams| × MaxDf rows. The eval side dedups (doc, gram)
    * first, so the final per-doc rollup is a plain count/sum — no
    * countDistinct Expand anywhere. At 100 TB grams would be 64-bit
    * hashes instead of strings so only 8-byte keys shuffle
    * (dedup_ngram_jaccard demonstrates that variant). */
  /** 5-word grams of a MATERIALIZED word-array column, hashed to
    * xxhash64 longs so only 8-byte keys ever shuffle/join (shared by
    * [[contaminationFrom]] and [[pipelineEndToEnd]]; the string-gram
    * oracles would surface a hash collision as a mismatch).
    * sequence() steps BACKWARD when start > stop, so short docs need
    * the explicit empty-array branch, not sequence(1, size-4). */
  private def grams5Of(ws: Column): Column =
    when(size(ws) >= 5,
      transform(sequence(lit(1), size(ws) - 4),
        i => xxhash64(concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2), element_at(ws, i + 3), element_at(ws, i + 4)))))
      .otherwise(array().cast("array<bigint>"))

  def pipelineContamination(s: SparkSession, dir: String): DataFrame =
    contaminationFrom(t(s, dir, "documents"))

  /** The contamination pipeline over an arbitrary (doc_id, text) frame
    * — split out so tests can feed a crafted corpus (e.g. a ubiquitous
    * boilerplate gram that must be cap-dropped). */
  def contaminationFrom(documents: DataFrame): DataFrame = {
    // the word array is MATERIALIZED as a column before the gram lambda
    // touches it: a raw `split(text)` expression inside the transform
    // would re-tokenize the document for every element_at reference
    // (5 per gram × ~200 grams = ~1000 splits/row — this, not the join,
    // was the query's r03 hot spot)
    val docs = documents
      .withColumn("bkt", SampleQueries.hashBucket(col("doc_id")))
      .select(col("doc_id"), col("bkt"), words(col("text")).as("ws"))
    val g = docs.select(col("doc_id"), col("bkt"),
      explode(grams5Of(col("ws"))).as("gram"))
    val evalG = g.filter(col("bkt") >= 95)
      .select(col("doc_id").as("eval_doc"), col("gram")).distinct()
    val trainDf = g.filter(col("bkt") < 95)
      .select(col("doc_id"), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= ContaminationMaxDf)
    evalG.join(trainDf, "gram")
      .groupBy("eval_doc")
      .agg(count(lit(1)).as("n_shared_grams"), sum("df").as("n_train_hits"))
      .orderBy("eval_doc")
  }

  /** The WHOLE curation pipeline as one declared query — the chain a
    * training-data job actually ships, each stage one of this engine's
    * standalone operators:
    *
    *   exact dedup (sha2 survivors) → quality gate (integer
    *   predicates) → deterministic train/eval hash split →
    *   DECONTAMINATE train (drop any train doc sharing a rare
    *   [df ≤ [[ContaminationMaxDf]]] 5-gram with eval — the capped
    *   aggregate keeps the gram join fan-out bounded exactly as in
    *   [[contaminationFrom]]) → per-language MIXTURE sampling
    *   (SampleQueries.pipelineMixture's derived integer thresholds).
    *
    * Output: per-language accounting of every stage (clean-train
    * count, contamination drops, post-mix keeps + id checksum), so the
    * oracle hash pins the whole chain, not just the final counts.
    *
    * Scale: the clean frame feeds FOUR consumers (gram explode,
    * pre-counts, rates, final rollup), so it is materialized once via
    * localCheckpoint — the same lineage cut the iterative loops use;
    * without it every consumer re-runs the scan + dedup join. After
    * that only digests, 8-byte gram hashes, ids and (lang, count)
    * micro-dims shuffle; every stage bound argued for the standalone
    * operators carries over unchanged (no new shuffle shape). */
  def pipelineEndToEnd(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val surv = docs.groupBy(sha2(col("text"), 256).as("sha"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val clean = docs.join(surv, "doc_id")
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) >= 5 &&
        size(array_distinct(col("ws"))) * 2 >= size(col("ws")))
      .withColumn("bkt", SampleQueries.hashBucket(col("doc_id")))
      .select("doc_id", "lang", "bkt", "ws")
      .localCheckpoint(true)
    val g = clean.select(col("doc_id"), col("bkt"),
      explode(grams5Of(col("ws"))).as("gram"))
    val evalG = g.filter(col("bkt") >= 95).select("gram").distinct()
    val trainG = g.filter(col("bkt") < 95)
      .select("doc_id", "gram").distinct()
    val rareDf = trainG.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= ContaminationMaxDf)
    val contam = trainG.join(rareDf, "gram").join(evalG, "gram")
      .select("doc_id").distinct()
    val cleanTrain = clean.filter(col("bkt") < 95)
    val train2 = cleanTrain.join(contam, Seq("doc_id"), "left_anti")
    val rates = train2.groupBy("lang").agg(count(lit(1)).as("c"))
      .withColumn("thr", least(lit(65521L),
        expr(s"(${SampleQueries.MixTargetPerLang} * 65521) div c")))
    val pre = cleanTrain.groupBy("lang")
      .agg(count(lit(1)).as("n_clean_train"))
    train2.join(broadcast(rates), "lang")
      .withColumn("keep",
        ((col("doc_id") * 40503L + 17L) % 65521L) < col("thr"))
      .groupBy("lang")
      .agg(min("c").as("n_after"), min("thr").as("thr"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
      .join(pre, "lang")
      .select(col("lang"), col("n_clean_train"),
        (col("n_clean_train") - col("n_after")).as("n_dropped_contam"),
        col("n_after"), col("thr"), col("n_kept"), col("kept_id_sum"))
      .orderBy("lang")
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction — a standard pre-training scrub pass (emails and
    * phone numbers replaced by typed placeholder tokens). The synthetic
    * corpus carries no natural PII, so the query first ENRICHES each
    * doc with deterministic doc_id-derived PII (some docs get an email,
    * some a phone, some neither — both engines build the identical
    * string), then scrubs it; the match counts and the md5 of the
    * scrubbed text prove the redaction removed exactly what was
    * injected. Regexes use only character classes and bounded
    * quantifiers, where Java regex (Spark) and RE2 (DuckDB) agree.
    * Scale: pure per-row projection — codegen'd regex over the text
    * column, zero shuffle until the final orderBy. */
  def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val email = when(col("doc_id") % 3 =!= 0,
      concat(lit(" contact u"), col("doc_id").cast("string"), lit("@ex.com")))
      .otherwise(lit(""))
    val phone = when(col("doc_id") % 2 === 0,
      concat(lit(" call "), (col("doc_id") % 900 + 100).cast("string"),
        lit("-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit(""))
    t(s, dir, "documents")
      .withColumn("pii_text", concat(col("text"), email, phone))
      .select(col("doc_id"),
        size(regexp_extract_all(col("pii_text"), lit(EmailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("pii_text"), lit(PhoneRe), lit(0)))
          .as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("pii_text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("scrub_md5"))
      .orderBy("doc_id")
  }

  /** Curriculum bucketing: order the corpus by token count and cut it
    * into 10 equal-frequency buckets — the easy→hard schedule a
    * curriculum-training pipeline publishes, with per-bucket
    * composition stats. NO global sort or single-task window: global
    * rank(doc) = (docs with smaller token count, from a cumulative sum
    * over the bounded distinct-token-count frame — same carry-frame
    * trick as win_concurrency) + (row_number within the doc's own
    * count, a per-key distributed window). Bucket =
    * ((rank−1)·10 div N) + 1: exact equal-split quantile assignment —
    * note it distributes remainder docs round-robin, unlike ANSI
    * ntile's first-buckets-get-extras; the oracle replays the same
    * formula over a plain row_number, so semantics are pinned. */
  def pipelineCurriculum(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("tk"))
    // distinct token counts ≈ hundreds at any corpus size: the carry
    // frame is dim-sized, so its global window is safe
    val cum = tok.groupBy("tk").agg(count(lit(1)).as("n"))
      .select(col("tk"), coalesce(
        sum("n").over(W.orderBy("tk").rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)).as("below"))
    val nTotal = tok.agg(count(lit(1)).as("n_total"))
    tok.join(broadcast(cum), "tk")
      .withColumn("rk",
        col("below") + row_number().over(W.partitionBy("tk").orderBy("doc_id")))
      .crossJoin(broadcast(nTotal))
      .withColumn("bucket", expr("((rk - 1) * 10) div n_total") + 1)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("tk").as("min_tok"), max("tk").as("max_tok"),
        sum("tk").as("sum_tok"), sum("doc_id").as("id_sum"))
      .orderBy("bucket")
  }

  val WinnowK = 8 // character k-gram length
  val WinnowW = 4 // winnow window (hashes per selection window)

  /** Winnowing document fingerprints (the MOSS algorithm): hash every
    * character [[WinnowK]]-gram, slide a [[WinnowW]]-hash window, keep
    * the window MINIMUM — guarantees any shared substring of length
    * ≥ k+w−1 (= 11) contributes at least one common fingerprint, while
    * storing ~2/(w+1) of the grams. text_fingerprint keeps every
    * rolling hash; winnowing is the principled sparse selection a
    * plagiarism / near-dup index stores at scale. Gram hash = first 12
    * hex digits of md5, read as a BIGINT on both engines (the
    * dedup_minhash idiom), so the oracle replays hashing, windowing,
    * and selection exactly.
    *
    * Scale: every input the selection needs lives in ONE source row, so
    * the whole hash→window-min→distinct→stats chain runs per row inside
    * whole-stage codegen ([[graft.functions.WinnowStats]], the
    * DotProductI64 pattern) — the only exchange left in the plan is the
    * final presentation orderBy (asserted in PlansSpec). MEASURED
    * alternatives (rejected, SCALE.md):
    *   - explode + partitionBy(doc_id) window + distinct: shuffles
    *     (doc_id, pos, 8-byte hash) triples — ~24 B per corpus
    *     CHARACTER through the exchange, a ~24× amplification that at
    *     100 TB dominates long before CPU;
    *   - per-row array higher-order functions (transform + slice +
    *     array_min): zero shuffle but HOF lambdas evaluate outside
    *     whole-stage codegen per ELEMENT and slice() allocates a
    *     w-array per gram — 2× slower than even the shuffle plan. */
  def textWinnow(s: SparkSession, dir: String): DataFrame = {
    // length ≥ k+w−1 ⟺ gram count ≥ w ⟺ the exploded formulation's
    // `pos >= w` filter leaves rows: the docs WinnowStats would return
    // null for are excluded up front, so no isNotNull filter is needed
    // (which would re-evaluate the kernel once in Filter and once in
    // Project — Spark's CSE does not span the two operators)
    t(s, dir, "documents")
      .filter(length(col("text")) >= WinnowK + WinnowW - 1)
      .select(col("doc_id"),
        graft.functions.Native.winnowStats(col("text"), WinnowK, WinnowW)
          .as("wst"))
      .select(col("doc_id"), col("wst.n_fp").as("n_fp"),
        col("wst.min_fp").as("min_fp"), col("wst.max_fp").as("max_fp"),
        col("wst.fp_sum").as("fp_sum"))
      .orderBy("doc_id")
  }

  /** Repetition quality signals (the Gopher/C4 repetition filters):
    * a document dominated by one word, or with a large fraction of
    * repeated word-3-grams, is boilerplate/spam and gets dropped
    * before training. Both signals need per-document frequency maps —
    * the naive formulation explodes every word and shuffles
    * (doc_id, word) pairs ≈ the whole corpus through an exchange; the
    * [[graft.functions.RepetitionStats]] kernel builds the maps in one
    * per-row pass inside whole-stage codegen instead (the WinnowStats
    * pattern — zero shuffle, asserted in PlansSpec). All outputs are
    * exact integers; the keep/drop flags use cross-multiplied integer
    * thresholds (top word > 20%, duplicated 3-gram positions > 30%)
    * so the oracle replays membership bit-exactly. */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.Native.repetitionStats(col("text")).as("rs"))
      .select(col("doc_id"),
        col("rs.n_words").as("n_words"),
        col("rs.top_word_n").as("top_word_n"),
        col("rs.n_3grams").as("n_3grams"),
        col("rs.dup3_pos").as("dup3_pos"),
        (col("rs.top_word_n") * 10L > col("rs.n_words") * 2L)
          .as("top_word_heavy"),
        (col("rs.dup3_pos") * 10L > col("rs.n_3grams") * 3L)
          .as("repetitive"))
      .orderBy("doc_id")

  /** Character-distribution quality gate — the char-level sibling of
    * text_repetition: one EntropyStats kernel pass per row inside
    * whole-stage codegen (zero shuffle; the naive formulation explodes
    * one row per corpus CHARACTER through a groupBy exchange). Flags
    * are integer cross-multiplications so DuckDB replays them exactly:
    * `char_dominated` (top char > ~17 % of the doc) and
    * `low_diversity` (distinct adjacent pairs < ⅓ of length — the
    * compressibility proxy; both split the driver corpus, measured
    * 467/500 and 253/500 at sf0.01). */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.Native.entropyStats(col("text")).as("es"))
      .select(col("doc_id"),
        col("es.n_chars").as("n_chars"),
        col("es.distinct_chars").as("distinct_chars"),
        col("es.top_char_n").as("top_char_n"),
        col("es.distinct_bigrams").as("distinct_bigrams"),
        (col("es.top_char_n") * 6L > col("es.n_chars")).as("char_dominated"),
        (col("es.distinct_bigrams") * 3L < col("es.n_chars")).as("low_diversity"))
      .orderBy("doc_id")

  /** BPE VOCABULARY TRAINING — [[BpeRounds]] byte-pair-encoding merge
    * rounds over the corpus, the tokenizer-training primitive every
    * LLM data pipeline runs before anything else (Sennrich et al.
    * 2016). Each round: count all adjacent character pairs, merge the
    * globally most frequent pair (tie → lexicographically smallest)
    * into a fresh symbol, repeat on the rewritten corpus. Merge
    * symbols are 'A','B','C'… — uppercase is provably absent from the
    * corpus (FixtureSpec pins the charset), so a merged token can
    * itself participate in later pairs exactly like real BPE.
    *
    * The merge REWRITE is `replace(text, pair, sym)` — both engines
    * scan left-to-right non-overlapping, so the rewritten corpora are
    * bit-identical and the unrolled-CTE oracle replays all rounds
    * (the reported pair_n is the OVERLAPPING gram count — the
    * standard BPE statistic; 'aaa' counts 'aa' twice but merges
    * once, which is why chars_after is reported from the actual
    * rewrite, not derived from pair_n).
    *
    * Scale: per round ONE gram count (2-char keys, map-side combined
    * — the only shuffle), ONE TakeOrdered(1) argmax (the driver
    * holds just the winning pair — the model-state pattern; the
    * vocabulary IS the model), and ONE narrow per-row replace; the
    * rewritten text is localCheckpointed per round so round r's plan
    * starts from materialized partitions, the same lineage
    * discipline as the iterative graph loops. Output: one row per
    * merge rule — the learned vocabulary plus the corpus-compression
    * trajectory. */
  val BpeRounds = 3
  /** The shared merge-round loop: returns the per-round merge records
    * and the final rewritten corpus (with the original length carried
    * as n0) — train publishes the former, apply the latter.
    *
    * No per-round checkpoint, deliberately: the rewritten corpus is
    * only ever a ≤[[BpeRounds]]-deep chain of narrow replace()
    * projections over the base scan, so re-deriving it inside each
    * round's single job is cheaper than materializing the whole text
    * column every round (measured: checkpointing cost ~2× at sf0.1 —
    * the opposite trade from the iterative GRAPH loops, whose
    * per-round state is join-derived, not projection-derived).
    * One aggregation job per round: the ≤|charset|²-key gram count
    * reduces to a SINGLE row carrying both the argmax rule (min over
    * (−count, gram) — most frequent, lexicographic tie-break) and the
    * gram grand total, so corpus size and merge rule come from one
    * shuffle. */
  private def bpeTrainLoop(s: SparkSession, dir: String)
      : (Seq[(Int, String, Long, String, Long, Long)], DataFrame) = {
    // the corpus parquet is one small file at test SFs ⇒ ONE input
    // split, and every round's explode/replace chain would run on a
    // single task; split the scan once (hash on doc_id) and
    // materialize so all rounds inherit the parallel layout — at
    // production scale the scan is already many splits and this
    // repartition collapses to a no-op cost next to the gram counts
    var docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("n0"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .localCheckpoint(true)
    val nDocs = t(s, dir, "documents").count()
    val merges = Seq.newBuilder[(String, Long, String)]
    val chars = Seq.newBuilder[Long] // corpus size entering each round
    for (r <- 1 to BpeRounds) {
      // one job per round: gram histogram (≤ |charset|² ≈ 729 keys,
      // map-side combined) reduced to a SINGLE row carrying both the
      // argmax rule (min over (−count, gram) = most frequent,
      // lexicographic tie-break) and the gram total, whose value + one
      // per doc == Σ length (every doc is ≥ 2 chars) — so the same
      // shuffle also reports the corpus size this round entered
      val top = docs.filter(length(col("text")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(text) - 1)," +
            " i -> substring(text, i, 2))")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
        .agg(min(struct((-col("c")).as("nc"), col("g").as("g"))).as("m"),
          sum("c").as("tot"))
        .select(col("m.g").as("g"), (-col("m.nc")).as("c"),
          col("tot").cast("long").as("tot"))
        .head()
      chars += top.getLong(2) + nDocs
      val pair = top.getString(0)
      val sym = ('A' + (r - 1)).toChar.toString
      merges += ((pair, top.getLong(1), sym))
      // Column-form replace: the corpus-derived pair never transits a
      // SQL literal (a quote/backslash in a future corpus would break
      // an interpolated string; lit() has no escaping surface)
      docs = docs
        .withColumn("text", replace(col("text"), lit(pair), lit(sym)))
    }
    // only the final corpus needs a dedicated length pass
    chars += docs.agg(sum(length(col("text"))).cast("long")).head().getLong(0)
    val cs = chars.result()
    val rows = merges.result().zipWithIndex.map {
      case ((pair, n, sym), i) => (i + 1, pair, n, sym, cs(i), cs(i + 1))
    }
    (rows, docs)
  }

  /** The learned merge table cached per sfDir — the tokenizer MODEL
    * (≤[[BpeRounds]] rows of driver state), exactly the
    * trainedCodebookInt precedent: Verify/Bench invoke the queries
    * repeatedly and must not retrain per call; apply derives its
    * replace chain from the cached rules instead of re-running the
    * per-round argmax jobs. Keyed by (dir, content signature of
    * documents.parquet) — the same staleness contract as the ANN
    * index dir, so an in-place regeneration of the corpus retrains
    * instead of serving stale merges (ADVICE r8). */
  private val bpeModelCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, String, Long, String, Long, Long)]]()
  private def bpeModel(s: SparkSession, dir: String)
      : Seq[(Int, String, Long, String, Long, Long)] = {
    val key = dir + "@" + java.lang.Long.toHexString(
      graft.Tables.contentSig(s"$dir/documents.parquet"))
    // evict superseded models (ADVICE r9): an in-place regeneration of
    // documents.parquet changes the signature, and without eviction
    // every regeneration would retain the prior merge table for the
    // JVM lifetime — drop other signatures of the SAME dir before
    // inserting (distinct dirs keep their models, same as Tables.t)
    bpeModelCache.keySet.removeIf(k => k.startsWith(dir + "@") && k != key)
    bpeModelCache.computeIfAbsent(key, _ => bpeTrainLoop(s, dir)._1)
  }

  def pipelineBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeModel(s, dir).toDF("round", "pair", "pair_n", "merge_sym",
      "chars_before", "chars_after").orderBy("round")
  }

  /** BPE TOKENIZATION APPLY — the downstream half of the tokenizer
    * story: run the [[BpeRounds]] learned merge rules over every
    * document and report its per-doc compression (a merged symbol is
    * one token, so token count = rewritten length when the base vocab
    * is characters). This is the per-document token-budget accounting
    * a curriculum/packing stage consumes. Same loop as training (the
    * rules are derived, then applied corpus-wide — one narrow replace
    * chain per doc); output is per-doc and integer-exact. */
  def pipelineBpeApply(s: SparkSession, dir: String): DataFrame = {
    // one narrow replace chain from the CACHED rules — a single corpus
    // pass, no re-run of the per-round training aggregates (r8)
    val rewritten = bpeModel(s, dir).sortBy(_._1)
      .foldLeft(col("text")) { case (c, (_, pair, _, sym, _, _)) =>
        replace(c, lit(pair), lit(sym))
      }
    t(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("n0"),
        length(rewritten).as("nt"))
      .select(col("doc_id"), col("n0").cast("long").as("n_chars"),
        col("nt").cast("long").as("n_tokens_bpe"),
        expr("(100 * (n0 - nt)) div n0").as("saved_pct"))
      .orderBy("doc_id")
  }

  /** Shared unrolled-CTE replay of [[bpeTrainLoop]], generated from
    * [[BpeRounds]] so the round count cannot drift. */
  private def bpeRoundsCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val sym = ('A' + (r - 1)).toChar
      s"""g$r AS (SELECT substring(text, CAST(i AS INTEGER), 2) AS g
         |  FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
         |        FROM d${r - 1} WHERE length(text) >= 2)),
         |p$r AS (SELECT g, count(*) AS c FROM g$r GROUP BY g
         |  ORDER BY c DESC, g LIMIT 1),
         |d$r AS (SELECT doc_id,
         |  replace(text, (SELECT g FROM p$r), '$sym') AS text FROM d${r - 1}),
         |l$r AS (SELECT CAST(sum(length(text)) AS BIGINT) AS chars FROM d$r)""".stripMargin
    }.mkString(",\n|")
    s"""d0 AS (SELECT doc_id, text FROM documents),
       |l0 AS (SELECT CAST(sum(length(text)) AS BIGINT) AS chars FROM d0),
       |$rounds""".stripMargin
  }
  private def bpeOracle: String = {
    val selects = (1 to BpeRounds).map { r =>
      val sym = ('A' + (r - 1)).toChar
      s"""SELECT $r AS round, (SELECT g FROM p$r) AS pair,
         |  (SELECT CAST(c AS BIGINT) FROM p$r) AS pair_n,
         |  '$sym' AS merge_sym,
         |  (SELECT chars FROM l${r - 1}) AS chars_before,
         |  (SELECT chars FROM l$r) AS chars_after""".stripMargin
    }.mkString("\n|UNION ALL ")
    s"""WITH $bpeRoundsCtes
       |$selects
       |ORDER BY round""".stripMargin
  }
  private def bpeApplyOracle: String =
    s"""WITH $bpeRoundsCtes
       |SELECT d0.doc_id, length(d0.text) AS n_chars,
       |  length(f.text) AS n_tokens_bpe,
       |  (100 * (length(d0.text) - length(f.text))) // length(d0.text)
       |    AS saved_pct
       |FROM d0 JOIN d$BpeRounds f USING (doc_id)
       |ORDER BY d0.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_bpe_train" -> pipelineBpeTrain,
    "pipeline_bpe_apply" -> pipelineBpeApply,
    "text_entropy" -> textEntropy,
    "text_repetition" -> textRepetition,
    "text_winnow" -> textWinnow,
    "pipeline_curriculum" -> pipelineCurriculum,
    "pipeline_end_to_end" -> pipelineEndToEnd,
    "text_pii_scrub" -> textPiiScrub,
    "pipeline_contamination" -> pipelineContamination,
    "text_bigrams" -> textBigrams,
    "text_bigram_lm" -> textBigramLm,
    "text_collocations" -> textCollocations,
    "pipeline_chunk" -> pipelineChunk,
    "udtf_posexplode_outer" -> udtfPosexplodeOuter,
    "pipeline_pack_bins" -> pipelinePackBins,
    "pipeline_pack_sequences" -> pipelinePackSequences,
    "pipeline_dataset_card" -> pipelineDatasetCard,
    "text_bm25" -> textBm25,
    "text_normalize" -> textNormalize,
    "pipeline_clean_corpus" -> pipelineCleanCorpus,
    "text_heavy_hitters" -> textHeavyHitters,
    "text_top_words" -> textTopWords,
    "text_stats" -> textStats,
    "text_tfidf" -> textTfidf,
    "text_langid" -> textLangid,
    "text_quality" -> textQuality,
    "text_tokens" -> textTokens,
    "text_fingerprint" -> textFingerprint)

  private def markerList(ms: Seq[String]): String =
    ms.map(m => s"'$m'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    // both engines' replace() is left-to-right non-overlapping, so
    // the unrolled merge rounds replay bit-exactly
    "pipeline_bpe_train" -> bpeOracle,
    "pipeline_bpe_apply" -> bpeApplyOracle,
    // per-doc char frequency map + adjacent-pair distinct set replayed
    // relationally; regexp '.' char split is the corpus-wide ASCII /
    // newline-free assumption FixtureSpec asserts (same as multimodal)
    "text_entropy" ->
      """WITH cc AS (SELECT doc_id, c, count(*) AS n
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
        |        FROM documents) GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
        |    CAST(count(*) AS BIGINT) AS distinct_chars,
        |    CAST(max(n) AS BIGINT) AS top_char_n
        |  FROM cc GROUP BY doc_id),
        |bg AS (SELECT doc_id,
        |    CAST(count(DISTINCT substr(text, CAST(i AS INTEGER), 2)) AS BIGINT)
        |      AS distinct_bigrams
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text) - 1)) AS i
        |        FROM documents WHERE length(text) >= 2) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(a.n_chars, 0) AS n_chars,
        |  coalesce(a.distinct_chars, 0) AS distinct_chars,
        |  coalesce(a.top_char_n, 0) AS top_char_n,
        |  coalesce(bg.distinct_bigrams, 0) AS distinct_bigrams,
        |  coalesce(a.top_char_n, 0) * 6 > coalesce(a.n_chars, 0)
        |    AS char_dominated,
        |  coalesce(bg.distinct_bigrams, 0) * 3 < coalesce(a.n_chars, 0)
        |    AS low_diversity
        |FROM documents d
        |LEFT JOIN a USING (doc_id) LEFT JOIN bg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // per-doc word/3-gram frequency maps replayed relationally:
    // unnest → group → max / conditional sum, all exact integers
    "text_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |wc AS (SELECT doc_id, max(c) AS top_word_n FROM (
        |    SELECT doc_id, w, count(*) AS c
        |    FROM (SELECT doc_id, unnest(ws) AS w FROM d) GROUP BY 1, 2)
        |  GROUP BY doc_id),
        |gc AS (SELECT doc_id,
        |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
        |      AS dup3_pos
        |  FROM (
        |    SELECT doc_id, gram, count(*) AS c
        |    FROM (SELECT doc_id,
        |        unnest(list_transform(
        |          generate_series(1, greatest(len(ws) - 2, 0)),
        |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
        |      FROM d) GROUP BY 1, 2)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(d.ws) AS BIGINT) AS n_words,
        |  wc.top_word_n,
        |  CAST(greatest(len(d.ws) - 2, 0) AS BIGINT) AS n_3grams,
        |  gc.dup3_pos,
        |  wc.top_word_n * 10 > len(d.ws) * 2 AS top_word_heavy,
        |  gc.dup3_pos * 10 > greatest(len(d.ws) - 2, 0) * 3 AS repetitive
        |FROM d JOIN wc USING (doc_id) JOIN gc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // same md5-derived gram hashes, same w-window min selection
    "text_winnow" ->
      s"""WITH g AS (SELECT doc_id, text,
         |    unnest(generate_series(1, length(text) - ${WinnowK - 1}))
         |      AS pos
         |  FROM documents WHERE length(text) >= $WinnowK),
         |h AS (SELECT doc_id, pos,
         |    ('0x' || substr(md5(substr(text, pos, $WinnowK)), 1, 12))::BIGINT
         |      AS h
         |  FROM g),
         |wm AS (SELECT doc_id, pos,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN ${WinnowW - 1} PRECEDING
         |                   AND CURRENT ROW) AS fp
         |  FROM h),
         |f AS (SELECT DISTINCT doc_id, fp FROM wm WHERE pos >= $WinnowW)
         |SELECT doc_id, count(*) AS n_fp, min(fp) AS min_fp,
         |  max(fp) AS max_fp, CAST(sum(fp) AS BIGINT) AS fp_sum
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // plain global row_number replays the engine's two-level rank
    "pipeline_curriculum" ->
      """WITH tok AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        |  FROM documents),
        |r AS (SELECT doc_id, tk,
        |    row_number() OVER (ORDER BY tk, doc_id) AS rk,
        |    count(*) OVER () AS n_total
        |  FROM tok)
        |SELECT ((rk - 1) * 10) // n_total + 1 AS bucket,
        |  count(*) AS n_docs, min(tk) AS min_tok, max(tk) AS max_tok,
        |  CAST(sum(tk) AS BIGINT) AS sum_tok,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the full curation chain, stage by stage: string grams where
    // Spark joins on xxhash64 longs (identical join semantics absent a
    // collision, which would surface as a hash mismatch)
    "pipeline_end_to_end" ->
      s"""WITH surv AS (SELECT min(doc_id) AS doc_id
         |              FROM documents GROUP BY sha256(text)),
         |q AS (SELECT * FROM (
         |    SELECT d.doc_id, d.lang,
         |      ((d.doc_id * 40503 + 17) % 65521) % 100 AS bkt,
         |      string_split(d.text, ' ') AS ws
         |    FROM documents d JOIN surv USING (doc_id))
         |  WHERE len(ws) >= 5 AND len(list_distinct(ws)) * 2 >= len(ws)),
         |g AS (SELECT doc_id, bkt,
         |    unnest(list_transform(generate_series(1, len(ws) - 4),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
         |           ws[i+3] || ' ' || ws[i+4])) AS gram
         |  FROM q),
         |evalg AS (SELECT DISTINCT gram FROM g WHERE bkt >= 95),
         |traing AS (SELECT DISTINCT doc_id, gram FROM g WHERE bkt < 95),
         |rare AS (SELECT gram FROM traing GROUP BY gram
         |         HAVING count(*) <= $ContaminationMaxDf),
         |contam AS (SELECT DISTINCT t.doc_id
         |  FROM traing t JOIN rare USING (gram) JOIN evalg USING (gram)),
         |train2 AS (SELECT doc_id, lang FROM q
         |  WHERE bkt < 95 AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |r AS (SELECT lang, count(*) AS c,
         |    least(65521, (${graft.operators.SampleQueries.MixTargetPerLang} * 65521) // count(*)) AS thr
         |  FROM train2 GROUP BY lang),
         |pre AS (SELECT lang, count(*) AS n_clean_train FROM q
         |  WHERE bkt < 95 GROUP BY lang),
         |k AS (SELECT t.lang, r.c, r.thr, t.doc_id,
         |    ((t.doc_id * 40503 + 17) % 65521) < r.thr AS keep
         |  FROM train2 t JOIN r USING (lang))
         |SELECT k.lang, CAST(min(pre.n_clean_train) AS BIGINT) AS n_clean_train,
         |  CAST(min(pre.n_clean_train) - min(k.c) AS BIGINT) AS n_dropped_contam,
         |  CAST(min(k.c) AS BIGINT) AS n_after,
         |  CAST(min(k.thr) AS BIGINT) AS thr,
         |  CAST(coalesce(sum(CASE WHEN k.keep THEN 1 END), 0) AS BIGINT)
         |    AS n_kept,
         |  CAST(coalesce(sum(CASE WHEN k.keep THEN k.doc_id END), 0) AS BIGINT)
         |    AS kept_id_sum
         |FROM k JOIN pre USING (lang)
         |GROUP BY k.lang ORDER BY k.lang""".stripMargin,
    // replays the identical deterministic PII injection, then the same
    // class-based regexes (Java and RE2 agree on these) — the md5 of
    // the scrubbed text pins every replacement byte
    "text_pii_scrub" ->
      s"""WITH p AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 != 0
        |         THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN ' call ' || CAST(doc_id % 900 + 100 AS VARCHAR)
        |           || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END AS pii_text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text, '$EmailRe')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(pii_text, '$PhoneRe')) AS INTEGER) AS n_phones,
        |  md5(regexp_replace(regexp_replace(pii_text, '$EmailRe', '<EMAIL>', 'g'),
        |      '$PhoneRe', '<PHONE>', 'g')) AS scrub_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    // exact heavy hitters by definition — the sketch+verify pipeline
    // must produce precisely this set (MG superset guarantee + exact
    // re-count + integer threshold)
    "text_heavy_hitters" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |t AS (SELECT count(*) AS total FROM w)
        |SELECT word, cnt FROM c, t WHERE cnt * 51 > total
        |ORDER BY cnt DESC, word""".stripMargin,
    "text_top_words" ->
      """SELECT word, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents)
        |GROUP BY word ORDER BY df DESC, word LIMIT 25""".stripMargin,
    "pipeline_clean_corpus" ->
      """WITH surv AS (SELECT min(doc_id) AS doc_id
        |              FROM documents GROUP BY sha256(text)),
        |q AS (SELECT d.lang, d.source,
        |        len(string_split(d.text, ' ')) AS n_words,
        |        len(list_distinct(string_split(d.text, ' '))) AS n_distinct
        |      FROM documents d JOIN surv USING (doc_id))
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS sum_words,
        |  floor((avg(CAST(n_distinct AS DOUBLE) / n_words)) * 10000.0 + 0.5)
        |    / 10000.0 AS avg_diversity
        |FROM q WHERE n_words >= 5 AND n_distinct * 2 >= n_words
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  floor((avg(n_chars)) * 10000.0 + 0.5) / 10000.0 AS avg_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // same hash-split as sample_* ; grams via generate_series indexing;
    // train side capped at df <= 10 exactly like the Spark plan
    "pipeline_contamination" ->
      """WITH d AS (SELECT doc_id,
        |    ((doc_id * 40503 + 17) % 65521) % 100 AS bkt,
        |    string_split(text, ' ') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, bkt,
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |           ws[i+3] || ' ' || ws[i+4])) AS gram
        |  FROM d WHERE len(ws) >= 5),
        |ev AS (SELECT DISTINCT doc_id AS eval_doc, gram FROM g WHERE bkt >= 95),
        |tr AS (SELECT gram, count(DISTINCT doc_id) AS df
        |       FROM g WHERE bkt < 95 GROUP BY gram
        |       HAVING count(DISTINCT doc_id) <= 10)
        |SELECT eval_doc, count(*) AS n_shared_grams,
        |  CAST(sum(df) AS BIGINT) AS n_train_hits
        |FROM ev JOIN tr USING (gram)
        |GROUP BY eval_doc ORDER BY eval_doc""".stripMargin,
    // same bigram projection; ctx top-20 and continuation top-3 both
    // tie-break lexicographically, so ranks replay exactly
    "text_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, len(ws)),
        |    i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS b FROM w),
        |bc AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n
        |  FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(n) AS BIGINT) AS ctx_total
        |  FROM bc GROUP BY 1
        |  ORDER BY ctx_total DESC, w1 LIMIT 20),
        |r AS (SELECT bc.w1, bc.w2, bc.n, ctx.ctx_total,
        |    row_number() OVER (PARTITION BY bc.w1
        |      ORDER BY bc.n DESC, bc.w2) AS rank
        |  FROM bc JOIN ctx USING (w1))
        |SELECT w1, CAST(rank AS INTEGER) AS rank, w2, n,
        |  floor((CAST(n AS DOUBLE) / ctx_total) * 10000.0 + 0.5)
        |    / 10000.0 AS p
        |FROM r WHERE rank <= 3 ORDER BY w1, rank""".stripMargin,
    // the same offset ladder via generate_series; substr length caps
    // identically, so coverage and char totals replay exactly
    "pipeline_chunk" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS nc FROM documents),
        |k AS (SELECT doc_id, text, nc,
        |    1 + greatest(0, (nc - 200 + 149) // 150) AS k FROM d),
        |c AS (SELECT doc_id, nc, text,
        |    unnest(generate_series(0, k - 1)) AS i FROM k),
        |ch AS (SELECT doc_id, nc, 1 + i * 150 AS off,
        |    length(substr(text, CAST(1 + i * 150 AS INTEGER), 200)) AS len
        |  FROM c)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(len) AS BIGINT) AS chunk_chars,
        |  max(off + len - 1) = max(nc) AS covered
        |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same single bigram table; marginals and total CAST to BIGINT so
    // DuckDB's HUGEINT sum can't leak into the hashed output
    "text_collocations" ->
      s"""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |bg AS (SELECT unnest(list_transform(range(1, len(ws)),
         |    i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS b FROM w),
         |bc AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n
         |  FROM bg GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM bc GROUP BY 1),
         |r AS (SELECT w2, CAST(sum(n) AS BIGINT) AS c2 FROM bc GROUP BY 1),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM bc)
         |SELECT bc.w1, bc.w2, bc.n, l.c1, r.c2,
         |  CAST((10000 * bc.n * tt.nn) // (l.c1 * r.c2) AS BIGINT) AS lift_bp
         |FROM bc JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tt
         |WHERE bc.n >= $ColMinCount
         |ORDER BY lift_bp DESC, bc.w1, bc.w2 LIMIT $ColTopK""".stripMargin,
    "text_bigrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w)
        |SELECT bigram, count(*) AS n FROM b GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    // LEFT JOIN LATERAL over generate_series emulates posexplode_outer:
    // empty arrays keep their row with (NULL, NULL); pos is 0-based on
    // both sides
    "udtf_posexplode_outer" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 6) AS arr
        |  FROM documents)
        |SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, arr[u.i] AS word
        |FROM w LEFT JOIN LATERAL
        |  (SELECT unnest(generate_series(1, len(arr))) AS i) u ON TRUE
        |ORDER BY doc_id, pos NULLS FIRST""".stripMargin,
    // all-integer packing arithmetic; DuckDB // is integer division on
    // BIGINTs exactly like Spark's div
    "pipeline_pack_bins" ->
      """WITH d AS (SELECT lang, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |o AS (SELECT lang, doc_id, tokens,
        |    CAST(coalesce(sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_off
        |  FROM d)
        |SELECT lang, start_off // 512 AS bin, count(*) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // long-format union of bounded aggregates; sha256 is bit-identical
    // across engines (same digest family as dedup_exact's oracle)
    "pipeline_dataset_card" ->
      """WITH d AS (SELECT lang, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    sha256(text) AS sha FROM documents),
        |tot AS (SELECT count(*) AS docs, sum(toks) AS tokens,
        |    sum(chars) AS nchars, count(DISTINCT sha) AS uniq FROM d)
        |SELECT * FROM (
        |  SELECT 'docs_total' AS metric, '' AS key,
        |    CAST(docs AS BIGINT) AS value FROM tot
        |  UNION ALL SELECT 'tokens_total', '', CAST(tokens AS BIGINT) FROM tot
        |  UNION ALL SELECT 'chars_total', '', CAST(nchars AS BIGINT) FROM tot
        |  UNION ALL SELECT 'dup_docs', '', CAST(docs - uniq AS BIGINT) FROM tot
        |  UNION ALL SELECT 'docs_lang', lang, count(*) FROM d GROUP BY lang
        |  UNION ALL SELECT 'docs_source', source, count(*) FROM d GROUP BY source)
        |ORDER BY metric, key""".stripMargin,
    // ONE global window here where Spark uses the two-level prefix sum —
    // the hash match proves the bucket decomposition computes the same
    // offsets; all-integer, generate_series is inclusive like sequence()
    "pipeline_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM documents),
         |o AS (SELECT doc_id, toks,
         |    CAST(coalesce(sum(toks) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS off FROM d),
         |x AS (SELECT doc_id, toks, off,
         |    unnest(generate_series(off // $PackSeqLen,
         |                           (off + toks - 1) // $PackSeqLen)) AS seq_id
         |  FROM o)
         |SELECT seq_id, count(*) AS n_docs,
         |  CAST(sum(least(off + toks, (seq_id + 1) * $PackSeqLen)
         |         - greatest(off, seq_id * $PackSeqLen)) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // same literal constants and op order as the Spark expression tree:
    // every FP step is one IEEE op, so only ln()'s last ulp could ever
    // differ (same exposure as text_tfidf, green through sf0.1)
    "text_bm25" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |               FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) t GROUP BY term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs,
        |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |scored AS (SELECT tf.doc_id, tf.term,
        |             floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |               * ((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75
        |                   + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))))
        |               * 10000.0 + 0.5) / 10000.0 AS bm25
        |           FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
        |           WHERE tf.doc_id < 100),
        |r AS (SELECT doc_id, term, bm25,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY bm25 DESC, term) AS rn
        |      FROM scored)
        |SELECT doc_id, CAST(rn AS INTEGER) AS rank, term, bm25
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    // DuckDB regexp_replace needs the 'g' flag to match Spark's
    // replace-all; md5 is lowercase hex in both engines
    "text_normalize" ->
      """SELECT event_id,
        |  CAST(length(norm) AS INTEGER) AS n_chars_norm,
        |  md5(norm) AS digest
        |FROM (SELECT event_id, trim(regexp_replace(regexp_replace(
        |        lower(props), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |      FROM events WHERE event_id < 200) t
        |ORDER BY event_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |               FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) t GROUP BY term),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |             floor((tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)) * 10000.0 + 0.5) / 10000.0 AS tfidf
        |           FROM tf JOIN df USING (term), n
        |           WHERE tf.doc_id < 100),
        |r AS (SELECT doc_id, term, tfidf,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY tfidf DESC, term) AS rn
        |      FROM scored)
        |SELECT doc_id, CAST(rn AS INTEGER) AS rank, term, tfidf
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_langid" -> {
      val scoreExprs = langMarkers.map { case (lang, ms) =>
        s"CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${markerList(ms)}, t))) AS INTEGER) AS s_$lang"
      }.mkString(",\n  ")
      val predExpr = langMarkers.reverse.foldLeft("'??'") { case (acc, (lang, _)) =>
        val others = langMarkers.filter(_._1 != lang)
          .map(l => s"s_${l._1}").mkString(", ")
        s"CASE WHEN s_$lang >= greatest($others) THEN '$lang' ELSE $acc END"
      }
      s"""SELECT doc_id, lang, pred_lang,
         |  CAST(lang = pred_lang AS INTEGER) AS is_match
         |FROM (SELECT doc_id, lang, $predExpr AS pred_lang
         |      FROM (SELECT doc_id, lang,
         |  $scoreExprs
         |            FROM documents) sc) p
         |ORDER BY doc_id""".stripMargin
    },
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
        |  floor((CAST(0.3 AS DOUBLE) * least(CAST(1.0 AS DOUBLE),
        |          CAST(n_chars AS DOUBLE) / CAST(500.0 AS DOUBLE))
        |      + CAST(0.4 AS DOUBLE) * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |               / len(string_split(text, ' ')))
        |      + CAST(0.3 AS DOUBLE) * least(CAST(1.0 AS DOUBLE),
        |          (CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |           / len(string_split(text, ' '))) / CAST(10.0 AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
        |    AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, CAST(sum(term_h) % 2147483647 AS BIGINT) AS fingerprint
        |FROM (SELECT doc_id,
        |        generate_subscripts(string_split(text, ' '), 1) * 7919
        |          + length(unnest(string_split(text, ' '))) * 131
        |          + ascii(unnest(string_split(text, ' '))) AS term_h
        |      FROM documents) t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
