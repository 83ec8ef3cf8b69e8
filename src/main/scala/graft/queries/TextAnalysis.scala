package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextHash
import graft.syntax._

/** Text-analysis operators over the `documents` table — the quality /
  * statistics layer of a training-data pipeline (token counting, quality
  * scoring, language ID, fingerprinting). All outputs are exact integers or
  * strings, so every query hash-matches its DuckDB oracle.
  *
  * Scale: every query is scan → narrow projection → (small) aggregation;
  * no joins, no skew risk. Ratios are integer basis points ((x·10⁴) div n)
  * rather than FP divisions, so results are stable at any parallelism.
  */
object TextAnalysis {

  private[queries] val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Language marker words, checked in declared precedence order. The text
    * fixtures are synthetic word soup, so the interesting property is the
    * deterministic scoring pipeline, not linguistic accuracy.
    * (`private[graft]`: the mouth-realistic scale fixture preserves these
    * words when rewriting replica token spaces, so derived replicas still
    * pass the language gate — [[graft.tools.ScaleFixture.buildMouth]].) */
  private[graft] val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "que"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "des"))

  /** Token counting: whitespace tokens, word-regex tokens (a cheap BPE-ish
    * pre-tokenizer: alpha runs and digit runs count separately), chars per
    * token in basis points. */
  def qTxtTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextHash.tokens($"text")
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        size(toks).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+"), lit(0)))
          .cast("long").as("n_word_tokens"),
        floor(length($"text").cast("long") * 10000L / size(toks)).cast("long").as("chars_per_tok_e4"))
  }

  /** Corpus n-gram statistics: top-20 token bigrams by frequency with a
    * total-order tiebreak (count desc, bigram asc). Plan: bind the token
    * array ONCE (the lambda re-evaluation trap — slicing the raw
    * tokenizer expression twice would re-run the regex per slice), zip
    * adjacent slices into bigrams, explode, hash-aggregate, TakeOrdered.
    * Partial aggregation collapses repeats map-side; the shuffle carries
    * one row per distinct bigram, and the top-k never sorts the full
    * dictionary. */
  def qTxtBigrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(TextHash.tokens($"text").as("w"))
      .filter(size($"w") >= 2)
      .select(explode(zip_with(
        slice($"w", lit(1), size($"w") - 1),
        slice($"w", lit(2), size($"w") - 1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram")
      .limit(20)

  /** PMI collocation mining — the phrase-detection pass (word2vec-style
    * phrase joining, index phrase dictionaries): rank adjacent word pairs
    * by pointwise mutual information. log is monotone, so the ranking runs
    * on the exact integer odds ratio c_xy·T/(c_x·c_y) (same log-free trick
    * as q_txt_bm25's idf) — no FP anywhere, both engines agree bit-for-bit.
    * A min-count floor (5) applies the standard PMI rare-pair guard.
    *
    * Scale: unigram and bigram counts are map-side-combining aggregates;
    * the two dictionary joins are equi-joins bounded by |vocab|, never the
    * corpus; the corpus-total is a 1-ROW aggregate of the unigram counts
    * attached by `crossJoin(broadcast(...))` (the [[qTxtStopwords]]
    * pattern) — NEVER an unpartitioned window over the type dictionary,
    * which would move the whole vocab to one task and noisy web-scale
    * text (URLs, numbers, typos) blows a type dictionary past any
    * single-task bound. The unigram aggregation feeds three subplans
    * (x-side, y-side, total) through ONE shuffle — ReuseExchange dedupes
    * identical child exchanges. Top-20 is TakeOrderedAndProject. Counts
    * fit int64 through ~10¹² tokens; past that the product moves to
    * DECIMAL(38,0). */
  def qTxtPmi(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(TextHash.tokens($"text").as("w"))
    val uni = toks.select(explode($"w").as("word"))
      .groupBy($"word").agg(count(lit(1)).as("c"))
    val total = broadcast(uni.agg(sum($"c").as("t_total")))
    val big = toks.filter(size($"w") >= 2)
      .select(explode(zip_with(
        slice($"w", lit(1), size($"w") - 1),
        slice($"w", lit(2), size($"w") - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .select($"p.x".as("x"), $"p.y".as("y"))
      .groupBy($"x", $"y").agg(count(lit(1)).as("c_xy"))
      .filter($"c_xy" >= 5L)
    big
      .join(uni.select($"word".as("x"), $"c".as("c_x")), "x")
      .join(uni.select($"word".as("y"), $"c".as("c_y")), "y")
      .crossJoin(total)
      .select($"x", $"y", $"c_xy", $"c_x", $"c_y",
        expr("c_xy * t_total * 1000 div (c_x * c_y)").as("pmi_e3"))
      .orderBy($"pmi_e3".desc, $"x", $"y")
      .limit(20)
  }

  /** Tokenizer-vocabulary coverage / OOV audit — the "will my tokenizer
    * fragment this corpus?" report: vocab = top-1000 corpus types by
    * frequency (deterministic (count desc, word) tie-break), then per
    * source the occurrence coverage rate and the count of distinct
    * out-of-vocab types. The per-source OOV profile is how corpus drift
    * shows up operationally (a new crawl source tanks coverage first).
    *
    * Scale: the vocab is top-k over the type dictionary
    * (TakeOrderedAndProject, |vocab| bounded) and BROADCASTS to the
    * occurrence stream — the big explode joins against 1000 rows without
    * shuffling; the per-source rollup is one partial-agg pass. */
  def qTxtOov(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(spark, dir)
      .select($"source", explode(TextHash.tokens($"text")).as("word"))
    val vocab = occ.groupBy($"word").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"word").limit(1000)
      .select($"word", lit(1L).as("in_vocab"))
    occ.join(broadcast(vocab), Seq("word"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"),
           sum(coalesce($"in_vocab", lit(0L))).as("n_covered"),
           countDistinct(when($"in_vocab".isNull, $"word")).as("n_oov_types"))
      .withColumn("coverage_e6", expr("n_covered * 1000000 div n_tokens"))
      .orderBy($"source")
  }

  private val ChunkSize = 50
  private val ChunkStride = 40

  /** Overlapping token-window chunking — the split-for-embedding step of a
    * retrieval/training pipeline: fixed-size windows (50 tokens) with a
    * 10-token overlap, each chunk fingerprinted for downstream dedup.
    * Tokens are bound ONCE (lambda re-evaluation trap), chunk starts come
    * from `sequence`, and the explode is the only fan-out (~n/stride rows
    * per doc) — a narrow, shuffle-free projection at any corpus size. */
  def qTxtChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select($"doc_id", TextHash.tokens($"text").as("w"))
      .select($"doc_id", $"w",
        posexplode(sequence(lit(0), greatest(size($"w") - 1, lit(0)),
                            lit(ChunkStride))))
      .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
        slice($"w", $"col" + 1, lit(ChunkSize)).as("chunk"))
      .select($"doc_id", $"chunk_idx",
        size($"chunk").cast("long").as("chunk_tokens"),
        TextHash.h32(array_join($"chunk", " ")).as("chunk_fp"))

  /** Chunk-level (sub-document) dedup manifest — the passage-granularity
    * dedup an embedding/RAG pipeline runs BEFORE paying for embeddings:
    * first occurrence of each chunk fingerprint (by (doc_id, chunk_idx))
    * survives, repeats are dropped, and the per-document manifest reports
    * how many chunks/tokens dedup away. Composes [[qTxtChunks]]' output —
    * a document copied from another document contributes only duplicate
    * chunks and pays zero embedding cost downstream.
    *
    * Scale: one shuffle on the 32-bit chunk fingerprint (the window
    * partitions on chunk_fp — same key profile as exact dedup: near-unique,
    * no skew), then a per-doc hash aggregate. Nothing pairwise. */
  def qTxtChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"chunk_fp").orderBy($"doc_id", $"chunk_idx")
    qTxtChunks(spark, dir)
      .withColumn("kept", row_number().over(w) === 1)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(when(!$"kept", 1L).otherwise(0L)).as("n_dup_chunks"),
           sum(when($"kept", $"chunk_tokens").otherwise(0L)).as("kept_tokens"),
           sum(when(!$"kept", $"chunk_tokens").otherwise(0L)).as("dropped_tokens"))
  }

  /** Packing budget (tokens per training sequence) for [[qTxtPack]]. */
  private[graft] val PackBudget = 2048L

  /** Token-budget sequence packing — the "concatenate and chunk" step that
    * turns a cleaned corpus into fixed-length training sequences: documents
    * are laid end-to-end per source in doc_id order and the stream is cut
    * every [[PackBudget]] tokens. Output per document: token count, start
    * offset in its source's token stream, the first/last training bin it
    * lands in, its offset inside the first bin, and the bins it spans —
    * the manifest a sequence-packing writer consumes.
    *
    * Scale: one window running-sum partitioned by `source` — the ingest
    * shard IS the parallelism unit (packing is inherently sequential
    * within a stream; a production pipeline keys it by (source, shard)
    * exactly like this, so no single task sees more than one shard). No
    * joins, no second pass, integer arithmetic throughout. A zero-token
    * document is treated as width-1 for bin-span purposes (keeps `div`
    * off negative operands, where Spark truncates but DuckDB floors). */
  def qTxtPack(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(TextHash.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("first_bin", expr(s"start_off div $PackBudget"))
      .withColumn("last_bin",
        expr(s"(start_off + greatest(n_tokens, 1L) - 1L) div $PackBudget"))
      .select($"doc_id", $"source", $"n_tokens", $"start_off",
        $"first_bin", $"last_bin",
        ($"start_off" % PackBudget).as("offset_in_bin"),
        ($"last_bin" - $"first_bin" + 1L).as("n_bins"))
  }

  /** Corpus byte-pair statistics — the counting step of the FIRST BPE merge
    * (tokenizer training): frequency of adjacent character pairs inside
    * tokens, weighted by token occurrences, top-20 with a total-order
    * tiebreak. The token string is bound before the pair lambda (the
    * re-evaluation trap), the per-token fan-out is length-1 pairs, and the
    * shuffle carries one row per distinct pair — a tokenizer trainer's
    * inner loop as a pure aggregate. */
  def qTxtBpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextHash.tokens($"text")).as("t"))
      .filter(length($"t") >= 2)
      .select(explode(transform(
        sequence(lit(1), length($"t") - 1),
        i => $"t".substr(i, lit(2)))).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(20)

  /** Sources treated as the held-out eval set by [[qTxtContamination]]. */
  private val EvalSources = Seq("src19")

  /** Train/eval contamination check (the n-gram containment audit run
    * before any benchmark number is trusted): for each eval document, the
    * fraction of its distinct 3-word shingles that appear ANYWHERE in the
    * training corpus. Not a pairwise join — eval shingles semi-join the
    * distinct train-shingle dictionary on the 32-bit hash, so cost scales
    * with |eval| + |train dictionary|, and the dictionary is the same
    * postings index every other shingle query shares. */
  def qTxtContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val postings = Dedup.postingsFor(spark, dir)
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
    val trainDict = postings.filter(!$"source".isin(EvalSources: _*))
      .select($"s").distinct()
    val ev = postings.filter($"source".isin(EvalSources: _*))
    ev.join(trainDict.withColumn("hit", lit(1L)), Seq("s"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           sum(coalesce($"hit", lit(0L))).as("n_matched"))
      .withColumn("contam_e4",
        floor($"n_matched" * 10000L / $"n_shingles").cast("long"))
      .orderBy($"doc_id")
  }

  /** Hashed-feature space for [[qTxtDsir]] (unigrams + bigrams → h32 mod
    * buckets, the DSIR paper's feature extractor) and its selection size. */
  private val DsirBuckets = 1024L
  private val DsirK = 100

  /** DSIR-shaped data selection via importance resampling (Xie et al.
    * 2023): learn per-feature importance from the corpus itself — hashed
    * n-gram (unigram + bigram) distributions of a TARGET set (the
    * [[EvalSources]] docs, standing in for "looks like my downstream
    * domain") vs the RAW pool — then score every raw document by its
    * features' target/raw likelihood ratios and keep the top
    * [[DsirK]]. Two documented integer substitutions keep both engines
    * bit-identical (the [[qTxtBm25]] log-free discipline): (1) the
    * per-feature weight is the add-1-smoothed probability RATIO
    * (t_f+1)(S+B)·10⁴ / ((s_f+1)(T+B)) in e4 rather than its log — the
    * ratio keeps the per-feature ordering; the document score is the
    * ratio MEAN over feature occurrences (the log-sum's monotone cousin
    * under a fixed occurrence count, and the occurrence count is emitted
    * alongside); (2) the Gumbel draw of true importance RESAMPLING
    * becomes a deterministic per-doc hash jitter (≤256 e4 points) added
    * to the mean — it breaks systematic ties and stands in for the
    * stochastic draw; a production run swaps the hash for real Gumbel
    * noise, same plan. Products fit int64 through ~10¹² feature
    * occurrences (the [[qTxtPmi]] bound); past that the ratio moves to
    * DECIMAL(38,0).
    *
    * Scale: feature extraction is a narrow codegen'd projection; the
    * per-feature count table is bounded by [[DsirBuckets]] (1024 rows —
    * hash aggregate, map-side combining), so the corpus total is a 1-row
    * aggregate CROSS-JOINED BROADCAST onto it (the [[qTxtPmi]]
    * bounded-aggregate pattern, whitelisted in RegistryPlanSpec) and the
    * ratio table BROADCASTS to the scoring join — the corpus never
    * shuffles for the model, only for the per-doc score aggregate.
    * Top-K is TakeOrderedAndProject (never a global window). */
  def qTxtDsir(spark: SparkSession, dir: String): DataFrame =
    dsirScoresFrom(
      Tables.documents(spark, dir)
        .withColumn("w", TextHash.tokens($"text"))
        .select($"doc_id", $"source".isin(EvalSources: _*).as("is_target"), $"w"))
      .orderBy($"key_e4".desc, $"doc_id")
      .limit(DsirK)

  /** Frame-parametric DSIR core over a `(doc_id: long, is_target: boolean,
    * w: array<string>)` frame: importance scores for every NON-target doc
    * (target docs define the distribution, they are never candidates).
    * Shared by the registry query and the crafted-corpus spec. Output:
    * (doc_id, n_feats, w_sum_e4, avg_e4, key_e4), unordered. */
  private[graft] def dsirScoresFrom(docs: DataFrame): DataFrame = {
    val feats = docs.select($"doc_id", $"is_target",
      explode(concat(
        transform($"w", t => TextHash.h32(t) % DsirBuckets),
        transform(zip_with(
            slice($"w", lit(1), size($"w") - 1),
            slice($"w", lit(2), size($"w") - 1),
            (x, y) => concat(x, lit(" "), y)),
          g => TextHash.h32(g) % DsirBuckets))).as("f"))
    val perF = feats.groupBy($"f").agg(
      sum(when($"is_target", 1L).otherwise(0L)).as("t_f"),
      sum(when($"is_target", 0L).otherwise(1L)).as("s_f"))
    val totals = broadcast(perF.agg(
      sum($"t_f").as("t_total"), sum($"s_f").as("s_total")))
    val ratios = broadcast(perF.crossJoin(totals)
      .select($"f", expr(s"(t_f + 1) * (s_total + $DsirBuckets) * 10000" +
        s" div ((s_f + 1) * (t_total + $DsirBuckets))").as("r_e4")))
    feats.filter(!$"is_target")
      .join(ratios, Seq("f"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feats"), sum($"r_e4").as("w_sum_e4"))
      .withColumn("avg_e4", expr("w_sum_e4 div n_feats"))
      .withColumn("key_e4", $"avg_e4" +
        TextHash.h32(concat(lit("dsir:"), $"doc_id".cast("string"))) % 256L)
  }

  /** Quality scoring: punctuation density, stopword ratio, uppercase ratio,
    * mean word length — the usual cheap heuristics for corpus filtering,
    * all in integer basis points. */
  def qTxtQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextHash.tokens($"text")
    val nPunct = length($"text") - length(regexp_replace($"text", "[.,!?;:]", ""))
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*)))
    val nUpper = length($"text") - length(regexp_replace($"text", "[A-Z]", ""))
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        nPunct.cast("long").as("n_punct"),
        floor(nPunct.cast("long") * 10000L / length($"text")).cast("long").as("punct_e4"),
        nStop.cast("long").as("n_stop"),
        floor(nStop.cast("long") * 10000L / size(toks)).cast("long").as("stop_e4"),
        nUpper.cast("long").as("n_upper"),
        floor(size(filter(toks, t => length(t) >= 6)).cast("long") * 10000L / size(toks))
          .cast("long").as("long_tok_e4"))
  }

  /** Hashed-feature bucket count and the seeded integer weight table for
    * [[qTxtClassifier]] — fixed literal constants shared by the Spark plan
    * and the generated oracle SQL (the [[graft.queries.Similarity]]
    * hyperplane convention), standing in for trained fasttext-style
    * weights. */
  private val ClfBuckets = 64
  private[queries] val ClfWeights: Seq[Long] = {
    val rnd = new scala.util.Random(17)
    Seq.fill(ClfBuckets)((rnd.nextInt(101) - 50).toLong)
  }

  /** Fasttext-shaped hashed linear quality classifier — the "run a cheap
    * model over the whole crawl" gate every production corpus passes
    * through before expensive processing: each token hashes into one of
    * [[ClfBuckets]] feature buckets, the bucket's weight comes from a
    * LITERAL array baked into the plan, and the document's margin is the
    * weight sum (sign = accept — for a threshold-at-zero classifier the
    * sum's sign equals the mean's, so no division and no floor-direction
    * portability hazard). Emits the margin + verdict per document.
    *
    * Scale: model inference here is a narrow codegen'd projection —
    * tokenize → h32 % buckets → element_at(literal array) — plus one
    * hash aggregate keyed by doc_id. No UDF, no join, no broadcast,
    * embarrassingly parallel; a real trained model swaps the literal
    * array for a broadcast weight-table join (same shape, one extra
    * broadcast) or a bigger literal. The scoring pass is bounded by the
    * tokenize cost, which the corpus pays once per pipeline stage that
    * needs tokens. */
  def qTxtClassifier(spark: SparkSession, dir: String): DataFrame = {
    val wArr = array(ClfWeights.map(lit): _*)
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", TextHash.tokens($"text").as("w"))
      .select($"doc_id", $"source", size($"w").cast("long").as("n_toks"),
        explode($"w").as("token"))
      .withColumn("wgt", element_at(wArr,
        (TextHash.h32($"token") % ClfBuckets).cast("int") + 1))
      .groupBy($"doc_id", $"source", $"n_toks")
      .agg(sum($"wgt").as("margin"))
      .select($"doc_id", $"source", $"n_toks", $"margin",
        ($"margin" >= 0L).as("accept"))
  }

  private def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*))).cast("long")
    }

  /** Marker-vote language prediction over a bound tokens column; foldRight
    * gives earlier languages precedence on ties (the first when(...) wins
    * in the final nested expression). */
  private[graft] def langPred(toks: Column): Column = {
    val scores = langScores(toks)
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lang).otherwise(acc)
    }
  }

  /** Language ID by marker-word voting with fixed precedence; emits the
    * per-language scores, the prediction, and agreement with the labeled
    * `lang` column. */
  def qTxtLangid(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextHash.tokens($"text")
    val scores = langScores(toks)
    val pred = langPred(toks)
    val withScores = scores.foldLeft(Tables.documents(spark, dir)) {
      case (df, (lang, s)) => df.withColumn(s"score_$lang", s)
    }
    withScores
      .withColumn("pred", pred)
      .withColumn("is_match", ($"pred" === $"lang").cast("boolean"))
      .select(Seq($"doc_id", $"lang") ++ LangMarkers.map(m => col(s"score_${m._1}")) ++
        Seq($"pred", $"is_match"): _*)
  }

  /** Corpus composition report — the per-source language matrix a corpus
    * card publishes (and the drift monitor between crawls): for each
    * (source, predicted language) cell, the doc and token mass, plus the
    * per-cell agreement with the labeled `lang` column in e4 — systematic
    * disagreement concentrated in one source is a broken extractor, not a
    * model error. One tokenize+predict projection and one hash aggregate
    * on the ≤|sources|×|langs| domain; no joins, no skew. */
  def qTxtLangMatrix(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextHash.tokens($"text")
    Tables.documents(spark, dir)
      .select($"source", $"lang", size(toks).cast("long").as("nt"),
        langPred(toks).as("pred"))
      .groupBy($"source", $"pred")
      .agg(count(lit(1)).as("n_docs"),
           sum($"nt").as("tokens"),
           sum(when($"pred" === $"lang", 1L).otherwise(0L)).as("n_agree"))
      .withColumn("agree_e4", expr("(n_agree * 10000) div n_docs"))
  }

  /** Document fingerprints: exact (md5 of normalized text), 60-bit numeric,
    * and a content fingerprint (min shingle hash = 1-perm minhash) that
    * survives local edits — the cheap building block for near-dup bucketing. */
  def qTxtFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("w", TextHash.tokens($"text"))
      .withColumn("sh", TextHash.shinglesFromTokens($"w", 3))
      .select(
        $"doc_id",
        md5(TextHash.normText($"text")).as("fp_md5"),
        TextHash.h60(TextHash.normText($"text")).as("fp60"),
        array_min(transform($"sh", s => TextHash.h32(s))).as("fp_content"),
        TextHash.prefixFp8($"w").as("fp_prefix8"))

  /** Template/boilerplate detection by shared document prefix — the cheap
    * structural signal for "these documents came from the same generator"
    * (site templates, form letters, scraper artifacts): documents sharing
    * the 8-token prefix fingerprint group together; groups of ≥2 are
    * emitted with their representative and source spread. One narrow
    * projection (the same fp_prefix8 primitive [[qTxtFingerprint]]
    * exports) + one hash aggregate on a near-unique key — exact-dedup
    * scale shape, no skew, no joins. */
  def qTxtTemplates(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("w", TextHash.tokens($"text"))
      .select($"doc_id", $"source", TextHash.prefixFp8($"w").as("prefix_fp"))
      .groupBy($"prefix_fp")
      .agg(count(lit(1)).as("n_docs"),
           min($"doc_id").as("rep_doc_id"),
           countDistinct($"source").as("n_sources"))
      .filter($"n_docs" >= 2)

  /** HTML EXTRACTION — the FIRST stage of a crawl pipeline (markup →
    * clean text), over deterministic per-row synthesized HTML (the
    * fixtures carry no markup — the `q_mm_*` container-synthesis
    * pattern): the doc text is entity-ESCAPED into a full page (head +
    * title + inline stylesheet, a nav with links, a trailing script and
    * footer), then extracted back by the boilerplate-removal chain a
    * production extractor runs — head/script/nav/footer block removal →
    * tag strip → entity decode. `extract_ok` pins the whole round trip
    * (escape → embed → extract ≡ the original text, byte for byte, with
    * the entity path really exercised), and the emitted stats are the
    * crawl-quality signals real pipelines filter on: markup vs text
    * length, the text-to-markup ratio (boilerplate-heavy pages score
    * low — the trafilatura/jusText-style density signal), and the link
    * count.
    *
    * Scale: pure per-row projection — a chain of codegen'd
    * `regexp_replace`s, no UDF, no join, no shuffle before the cosmetic
    * sort; extraction over 100 TB of crawl HTML is a map. (Lazy `.*?`
    * quantifiers and the inline `(?s)` DOTALL flag evaluate identically
    * under Java regex and DuckDB's RE2 — so multiline head/script/nav/
    * footer blocks in real crawl markup are stripped by both engines.) */
  /** The synthesized page around an (escaped) text column — shared by
    * the registry query and the entity-path spec. */
  private[graft] def htmlOf(text: Column, id: Column): Column = {
    val esc = regexp_replace(regexp_replace(regexp_replace(text,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    concat(
      lit("<html><head><title>doc-"), id.cast("string"),
      lit("</title><style>body{margin:0;font:14px sans}</style></head>" +
        "<body><nav><a href=\"/\">home</a><a href=\"/crawl\">index</a>" +
        "</nav><main><p>"),
      esc,
      lit("</p></main><script>var page=1;</script>" +
        "<footer>(c) example.org</footer></body></html>"))
  }

  /** The boilerplate-removal chain: head/script/nav/footer block
    * removal → tag strip → entity decode. Each block pattern carries
    * `(?s)` (DOTALL) so real crawl markup with newlines inside
    * head/script/nav/footer is still stripped, and each tag gets its
    * OWN lazy pattern (one `regexp_replace` per tag) so an open tag can
    * only pair with its own close tag — `<script>…</nav>` cannot span.
    * Per-tag patterns instead of a `</\1>` backreference because the
    * DuckDB oracle twin runs on RE2, which has no backreferences; both
    * engines honour the inline `(?s)` flag identically. */
  private[graft] def extractedOf(html: Column): Column = {
    val noHead = regexp_replace(html, "(?s)<head>.*?</head>", "")
    val noBlocks = Seq("script", "nav", "footer").foldLeft(noHead) { (c, t) =>
      regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", "")
    }
    val noTags = regexp_replace(noBlocks, "<[^>]*>", "")
    regexp_replace(regexp_replace(regexp_replace(noTags,
      "&lt;", "<"), "&gt;", ">"), "&amp;", "&")
  }

  def qTxtExtract(spark: SparkSession, dir: String): DataFrame = {
    val html = htmlOf($"text", $"doc_id")
    val extracted = extractedOf(html)
    Tables.documents(spark, dir)
      .select($"doc_id",
        length(html).cast("long").as("markup_len"),
        length($"text").cast("long").as("text_len"),
        ((length(html) - length(regexp_replace(html, "<a ", "")))
          .cast("long") / 3L).cast("long").as("n_links"),
        expr("CAST(length(text) AS BIGINT) * 10000").as("tl4"),
        (extracted === $"text").as("extract_ok"))
      .withColumn("text_ratio_e4", expr("tl4 div markup_len"))
      .select($"doc_id", $"markup_len", $"text_len", $"n_links",
        $"text_ratio_e4", $"extract_ok")
      .orderBy($"doc_id")
  }

  /** Corpus-driven stopword list generation: tokens present in ≥50% of
    * documents, with their document frequency — the export a production
    * pipeline would feed into stop-token filtering (this engine's sibling
    * mechanisms — the shingle DF cap and [[qTxtQuality]]'s static
    * [[Stopwords]] list — are deliberately self-contained so their
    * oracles stay fixed; this query produces the corpus-derived artifact,
    * it is not wired into them). Plan: per-doc distinct tokens (explode +
    * distinct collapses map-side), DF hash aggregate, corpus size as one
    * broadcast scalar — the exact-dedup scale shape; the output is by
    * construction a bounded set (≤ corpus_tokens/df_floor). */
  def qTxtStopwords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    docs.select($"doc_id", explode(array_distinct(TextHash.tokens($"text"))).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .withColumn("df_e4", expr("df * 10000 div n_docs"))
      .filter($"df_e4" >= 5000L)
      .select($"token", $"df", $"df_e4")
      .orderBy($"df".desc, $"token")
  }

  /** Keyword query for [[qTxtBm25]] — a fixed conjunctive bag of terms, the
    * stand-in for a search/retrieval request. */
  private val Bm25Terms = Seq("hash", "join", "stream")
  private val Bm25TopK = 10

  /** BM25-shaped keyword retrieval over the documents table — the sparse
    * (lexical) half of a retrieval pipeline, next to the dense cosine path
    * in [[Similarity]]. Okapi BM25 with k1 = 1.2, b = 0.75, both folded
    * into EXACT integer rationals: with T = corpus tokens, N = docs,
    * avgdl = T/N, the per-term tf component tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    * multiplies out to (22·tf·T) / (10·tf·T + 3·T + 9·dl·N) — floored to
    * e4 — and the idf is the Robertson odds RATIO (N−df+1)/(df+1) in e4
    * WITHOUT the log: the logarithm is transcendental, and matching its
    * last ulp across two engines' libm builds is exactly the FP-portability
    * trap the repo's integer discipline exists to avoid. The ratio keeps
    * idf's df-monotonicity (the ranking property); the absolute inter-term
    * weighting is flatter than log-idf, which is the documented trade for
    * a bit-exact cross-engine gate.
    *
    * Plan: ONE tokenize pass emits (doc, dl, token); the explode filters to
    * the query terms (partial agg collapses map-side), tf is a (doc, term)
    * hash aggregate, df a |terms|-row aggregate joined back by broadcast.
    * N and T are one bounded scalar aggregate (2 longs to the driver,
    * embedded as literals). Top-k is TakeOrderedAndProject — no global
    * sort, no corpus-wide window. */
  def qTxtBm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val Array(corp) = docs
      .select(size(TextHash.tokens($"text")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum($"dl").as("t")).collect()
    val (nDocs, totTok) = (corp.getLong(0), corp.getLong(1))
    val tf = docs
      .select($"doc_id", TextHash.tokens($"text").as("w"))
      .select($"doc_id", size($"w").cast("long").as("dl"), explode($"w").as("t"))
      .filter($"t".isin(Bm25Terms: _*))
      .groupBy($"doc_id", $"t")
      .agg(count(lit(1)).as("tf"), max($"dl").as("dl"))
    val df = tf.groupBy($"t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("t"))
      .withColumn("idf_e4", expr(s"((${nDocs}L - df + 1) * 10000) div (df + 1)"))
      .withColumn("tfn_e4", expr(
        s"(22 * tf * ${totTok}L * 10000) div " +
          s"(10 * tf * ${totTok}L + 3 * ${totTok}L + 9 * dl * ${nDocs}L)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit_terms"),
           sum(expr("(idf_e4 * tfn_e4) div 10000")).as("bm25_e4"))
      .orderBy($"bm25_e4".desc, $"doc_id")
      .limit(Bm25TopK)
  }

  /** Token budget for [[qTxtBudget]]'s greedy selection. */
  private val SelectBudget = 30000L

  /** Quality-ranked selection under a token budget — the "keep the best
    * documents until the budget is spent" step of corpus curation: rank
    * documents by a deterministic integer quality score (stopword ratio
    * here — higher reads as more natural text; any integer score slots
    * in), take them greedily in (score desc, doc_id) order, and keep every
    * document whose cumulative token count fits the budget. Emits the full
    * audit row (score, tokens, cumulative position, verdict).
    *
    * Scale: the naive form is a running sum over ONE global sort — a
    * single-task window funnel at corpus scale. This implementation is the
    * banded two-pass prefix sum: scores bucket into ≤101 bands (score div
    * 100), per-band token sums roll up once (a ≤101-row frame), each
    * band's offset is the running sum over that TINY frame, and the
    * within-band running sum partitions by band — so no task ever sees
    * more than one band's documents, and cum = band_offset + in-band
    * prefix is exactly the global prefix sum. The oracle computes the
    * plain global running sum, so the hash-match PROVES banded ≡ global. */
  def qTxtBudget(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextHash.tokens($"text")
    // Persisted: the band-offset aggregate AND the main frame both read
    // this projection, and it is NARROW (4 longs/doc — the text never
    // enters the cache), so one in-memory copy beats tokenizing the corpus
    // twice. Identical plan per (session, dir) → the cache manager serves
    // a single copy, like the postings index.
    val scored = Tables.documents(spark, dir)
      .select($"doc_id",
        size(toks).cast("long").as("n_tokens"),
        floor(size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")
          * 10000L / size(toks)).cast("long").as("score"))
      .withColumn("band", expr("score div 100"))
      .persist()
    scored.count() // materialize before both consumers read it
    val wBands = Window.orderBy($"band".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = scored.groupBy($"band")
      .agg(sum($"n_tokens").as("band_tokens"))
      .withColumn("band_offset",
        coalesce(sum($"band_tokens").over(wBands), lit(0L)))
      .select($"band", $"band_offset")
    val wInBand = Window.partitionBy($"band").orderBy($"score".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(broadcast(offsets), Seq("band"))
      .withColumn("cum_tokens", $"band_offset" + sum($"n_tokens").over(wInBand))
      .select($"doc_id", $"score", $"n_tokens", $"cum_tokens",
        ($"cum_tokens" <= SelectBudget).as("kept"))
  }

  /** Source mixture weighting — the data-mixing step of training-corpus
    * assembly (how hard to up/down-sample each source so the mixture hits
    * a target distribution; uniform-over-sources here): per-source doc and
    * token mass, the actual share (e4), and the resampling weight
    * weight = target_share / actual_share = T / (k·tokens_s), in e4 —
    * weight > 1e4 means up-sample, < 1e4 down-sample. A non-uniform target
    * is the same expression with the target vector joined in.
    *
    * Plan: one tokenize pass → per-source hash aggregate (≤|sources| rows);
    * the corpus totals are unpartitioned window sums over that TINY frame
    * (≤|sources| rows in one task — bounded by the source-domain size, not
    * the corpus), so no scalar cross join and no second scan. */
  def qTxtMixture(spark: SparkSession, dir: String): DataFrame = {
    val whole = Window.partitionBy()
    Tables.documents(spark, dir)
      .select($"source", size(TextHash.tokens($"text")).cast("long").as("nt"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("tokens"))
      .withColumn("total_tokens", sum($"tokens").over(whole))
      .withColumn("n_sources", count(lit(1)).over(whole))
      .select($"source", $"n_docs", $"tokens",
        expr("(tokens * 10000) div total_tokens").as("share_e4"),
        expr("(total_tokens * 10000) div (n_sources * tokens)").as("weight_e4"))
  }

  /** Temperature-scaled source mixture (τ = 2, i.e. exponent 1/2) — the
    * standard multilingual/multi-source rebalancing dial (sampling
    * p_s ∝ share_s^(1/τ) — XLM-R-style temperature sampling; see
    * PAPERS.md): high-resource sources are damped, low-resource boosted,
    * WITHOUT the full inversion [[qTxtMixture]]'s uniform target applies.
    * Exponent 1/2 is computed as floor(sqrt(tokens·10⁶)) — IEEE-754 sqrt
    * is correctly rounded in both engines, so the floored milli-sqrt is
    * bit-identical (the general-τ pow() is NOT correctly rounded, which
    * is why the exported dial pins τ = 2; the plan shape is τ-independent).
    * Emits per source: token mass, raw share, temperature share, and the
    * resulting up/down-sampling factor in e4.
    *
    * Plan: identical to [[qTxtMixture]] — one tokenize pass, ≤|sources|-row
    * aggregate, window sums over that tiny frame. */
  def qTxtTemperature(spark: SparkSession, dir: String): DataFrame = {
    val whole = Window.partitionBy()
    Tables.documents(spark, dir)
      .select($"source", size(TextHash.tokens($"text")).cast("long").as("nt"))
      .groupBy($"source")
      .agg(sum($"nt").as("tokens"))
      // milli-sqrt as 1000·sqrt(t), multiplied AFTER the sqrt so the
      // radicand stays a 53-bit-exact double through 9·10¹⁵ tokens/source;
      // the factor expression then needs sq·total·10⁴ < 2⁶³ — past ~10¹²
      // tokens/source switch the two window products to DECIMAL(38,0)
      .withColumn("sq", floor(sqrt($"tokens") * 1000d).cast("long"))
      .withColumn("total_tokens", sum($"tokens").over(whole))
      .withColumn("total_sq", sum($"sq").over(whole))
      .select($"source", $"tokens",
        expr("(tokens * 10000) div total_tokens").as("share_e4"),
        expr("(sq * 10000) div total_sq").as("temp_share_e4"),
        expr("(sq * total_tokens * 10000) div (total_sq * tokens)").as("factor_e4"))
  }

  /** APPLY the mixture weights [[qTxtMixture]] computes — the resampling
    * manifest that actually rebalances the corpus toward the uniform
    * target: each document replicates `weight div 10⁴` times plus one
    * more with probability (weight mod 10⁴)/10⁴, decided by a portable
    * hash of the doc id — so up-sampling (weight > 1e4) emits extra
    * copies and down-sampling (weight < 1e4) drops deterministically,
    * and the expected token mass per source lands exactly on target.
    * Reproducible across engines/runs/partitionings (same determinism
    * contract as the hash/stratified samplers); emits only rows with
    * n_copies > 0 — the manifest a sequence-packing writer consumes.
    *
    * Plan: the per-source weight table (≤|sources| rows, from the same
    * aggregate as [[qTxtMixture]]) broadcasts onto the corpus scan; the
    * verdict is a narrow projection + filter. No extra shuffle beyond
    * the weight aggregate itself. */
  def qTxtResample(spark: SparkSession, dir: String): DataFrame = {
    val weights = qTxtMixture(spark, dir).select($"source", $"weight_e4")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(TextHash.tokens($"text")).cast("long").as("n_tokens"))
      .join(broadcast(weights), Seq("source"))
      .withColumn("h", TextHash.h60(concat($"doc_id".cast("string"), lit("-mix"))) % 10000L)
      .select($"doc_id", $"source", $"n_tokens", $"weight_e4",
        (expr("weight_e4 div 10000") +
          when($"h" < $"weight_e4" % 10000L, 1L).otherwise(0L)).as("n_copies"))
      .filter($"n_copies" > 0)
  }

  /** The composed training-data cleaning pipeline — the queries above run
    * as ONE plan, the way a production corpus job chains them:
    * language-ID → quality filter (length + punctuation density) → exact
    * dedup (first doc per content fingerprint) → per-language corpus stats.
    *
    * Scale shape: one narrow projection pass computes fingerprint, tokens,
    * language and quality per document (no joins); dedup is one shuffle on
    * the 128-bit fingerprint; the final aggregate groups on ~5 languages
    * with map-side partial aggregation. Nothing in the pipeline is
    * quadratic and the only wide exchange carries one row per document. */
  def qPipelineClean(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("w", TextHash.tokens($"text"))
      .withColumn("fp", md5(TextHash.normText($"text")))
      .withColumn("pred", langPred($"w"))
      .withColumn("n_toks", size($"w").cast("long"))
      .withColumn("punct_e4",
        floor((length($"text") - length(regexp_replace($"text", "[.,!?;:]", "")))
          .cast("long") * 10000L / length($"text")).cast("long"))
    val filtered = docs.filter($"n_toks" >= 20 && $"punct_e4" < 500)
    val deduped = filtered
      .withColumn("rn",
        row_number().over(Window.partitionBy($"fp").orderBy($"doc_id")))
      .filter($"rn" === 1)
    deduped.groupBy($"pred")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_toks").as("total_toks"),
           sum(length($"text").cast("long")).as("total_chars"))
      .orderBy($"pred")
  }

  /** Gopher-style repetition/quality rules (Rae et al. 2021, "Scaling
    * Language Models" §A1.1 — public paper; see PAPERS.md) — the
    * repetition-based document filter every large corpus pipeline runs:
    *
    *  - `dup_word_e4`   fraction of token OCCURRENCES whose token appears
    *                    more than once in the document (duplicate-word mass)
    *  - `top_word_e4`   fraction taken by the single most frequent token
    *  - `dup_bigram_e4` fraction of bigram occurrences that are repeats
    *                    (occurrences − distinct, over occurrences)
    *  - `mean_word_len_e2` mean token length in centi-chars
    *  - `keep`          the composed Gopher verdict at the standard-ish
    *                    thresholds (dup-word < 30%, top-word < 20%,
    *                    dup-bigram < 20%, mean length in [3, 10])
    *
    * All ratios are integer basis points so the verdict hash-matches the
    * oracle bit-for-bit. Plan shape: token explode → (doc, token) hash
    * aggregate → per-doc aggregate; bigrams the same with a zip_with —
    * two narrow explode→agg pipelines joined on doc_id, partial
    * aggregation collapsing repeats map-side. No corpus-wide key appears
    * anywhere (every group key contains doc_id), so there is no skew and
    * the shuffles carry one row per distinct (doc, gram) — this filter
    * runs embarrassingly parallel at any corpus size. */
  def qTxtGopher(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", TextHash.tokens($"text").as("w"))
      .filter(size($"w") >= 1)
    // length stats ride the word aggregate (Σ len = Σ tf·len(token)), so
    // the corpus is tokenized twice (words, bigrams), not three times —
    // and at scale recomputing the tokens beats caching the tokenized
    // corpus, which is why there is no persist here.
    val wordStats = docs
      .select($"doc_id", explode($"w").as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_tok"),
           max($"tf").as("top_tf"),
           sum(when($"tf" > 1, $"tf").otherwise(0L)).as("dup_tok"),
           sum($"tf" * length($"t")).as("sum_len"))
    val bigramStats = docs
      .filter(size($"w") >= 2)
      .select($"doc_id", explode(zip_with(
        slice($"w", lit(1), size($"w") - 1),
        slice($"w", lit(2), size($"w") - 1),
        (a, b) => concat(a, lit(" "), b))).as("b"))
      .groupBy($"doc_id", $"b").agg(count(lit(1)).as("bf"))
      .groupBy($"doc_id")
      .agg(sum($"bf").as("n_bi"), count(lit(1)).as("n_bi_distinct"))
    wordStats
      .join(bigramStats, Seq("doc_id"), "left")
      .select(
        $"doc_id",
        $"n_tok",
        floor($"dup_tok" * 10000L / $"n_tok").cast("long").as("dup_word_e4"),
        floor($"top_tf" * 10000L / $"n_tok").cast("long").as("top_word_e4"),
        coalesce(floor(($"n_bi" - $"n_bi_distinct") * 10000L / $"n_bi"), lit(0L))
          .cast("long").as("dup_bigram_e4"),
        floor($"sum_len" * 100L / $"n_tok").cast("long").as("mean_word_len_e2"))
      .withColumn("keep",
        $"dup_word_e4" < 3000L && $"top_word_e4" < 2000L &&
        $"dup_bigram_e4" < 2000L &&
        $"mean_word_len_e2".between(300L, 1000L))
  }

  /** Winnowing parameters: k-gram size, window width (Schleimer et al.
    * 2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    * public paper, see PAPERS.md) and the position-packing radix for the
    * rightmost-min argmin trick (positions must stay < 2^20 ≈ 1M grams
    * per document — far above any real document; the packed value
    * h·2^20 + (2^20 − pos) stays < 2^52, safe in a signed long). */
  private val WinnowK = 3
  private val WinnowW = 4
  private val PosPack = 1L << 20

  /** Winnowing fingerprint selection — the MOSS-style local fingerprinting
    * guarantee ([[qTxtFingerprint]]'s min-hash content fingerprint is
    * global; winnowing is its LOCAL sibling): from the positional k-gram
    * hash sequence, every window of [[WinnowW]] consecutive grams selects
    * its minimum hash (ties → rightmost, "robust winnowing"), and the
    * distinct selected (position, hash) pairs are the document's
    * fingerprint set. Guarantees: any shared substring of ≥ k+w−1 tokens
    * yields a shared fingerprint, and selected density ≈ 2/(w+1) — the
    * property that makes plagiarism/near-dup detection by fingerprint
    * intersection sound. Documents shorter than one full window winnow
    * their single truncated window (the global min), so no document
    * vanishes.
    *
    * Plan: positional gram hashes (one narrow projection; NOT the distinct
    * shingle set — order matters here), a w-wide explode assigns each gram
    * to the ≤w windows containing it, and the rightmost-min per window is
    * ONE min() over the packed (hash, −pos) integer — no window functions,
    * no per-window sort. Everything keys on (doc_id, window), so the
    * shuffle is skew-free and corpus-size-proportional with a small
    * constant (w=4 fan-out of an int column). */
  def qTxtWinnow(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select($"doc_id", TextHash.tokens($"text").as("w"))
      .select($"doc_id", transform(
        sequence(lit(0), greatest(size($"w") - WinnowK, lit(0))),
        i => TextHash.h32(concat_ws(" ",
          (0 until WinnowK).map(j => try_element_at($"w", i + j + 1)): _*)))
        .as("hs"))
      .select($"doc_id", size($"hs").cast("long").as("n"), posexplode($"hs"))
      .select($"doc_id", $"n", ($"pos" + 1).cast("long").as("p"), $"col".as("h"))
      .select($"doc_id", $"n", $"p", $"h",
        explode(sequence(lit(0L), lit((WinnowW - 1).toLong))).as("off"))
      .withColumn("j", $"p" + $"off")
      .filter($"j" <= $"n" && $"j" >= least(lit(WinnowW.toLong), $"n"))
      .groupBy($"doc_id", $"j")
      .agg(min($"h" * PosPack + (lit(PosPack) - $"p")).as("packed"))
      .select($"doc_id",
        (lit(PosPack) - $"packed" % PosPack).as("sel_pos"),
        expr(s"packed div $PosPack").as("fp"))
      .distinct()

  /** Bigram-LM corpus scoring — the KenLM/CCNet-style "how plausible is
    * this document under a corpus language model" quality signal, reduced
    * to its exactly-computable core: corpus bigram conditional
    * probabilities P(w₂|w₁) = c(w₁w₂)/c(w₁·) in e6 integer fixed point,
    * scored per document as the occurrence-weighted mean and the minimum
    * transition probability. A production pipeline plugs a trained KenLM
    * here; the transcendental log-perplexity and Kneser-Ney smoothing are
    * exactly the FP-portability trap the repo's integer discipline exists
    * to avoid, and the ranking signal is the same — documents made of
    * corpus-frequent transitions score high, garbled ones low.
    *
    * Plan: ONE bigram tally (doc_id, bigram, tf) feeds both the corpus
    * dictionary (bigram → count; first-token context totals are a second
    * tiny aggregate over the dictionary, not the corpus) and the per-doc
    * transition rows — persisted because it is narrow (no text) and read
    * three times. The dictionary join keys on the bigram string: the same
    * skew profile as the tf-idf token join (AQE skew-split; a production
    * run drops stop-bigrams with the shingle path's DF cap). Domain bound:
    * c2·10⁶ needs c2 < 9.2e12 — past ~10¹³ bigram occurrences switch the
    * score expression to DECIMAL(38,0) on both engines, like tf-idf. */
  def qTxtLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docBigrams = Tables.documents(spark, dir)
      .select($"doc_id", TextHash.tokens($"text").as("w"))
      .filter(size($"w") >= 2)
      .select($"doc_id", explode(zip_with(
        slice($"w", lit(1), size($"w") - 1),
        slice($"w", lit(2), size($"w") - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("tf"))
      .persist()
    docBigrams.count() // materialize once for the three readers
    val dict = docBigrams.groupBy($"bg").agg(sum($"tf").as("c2"))
      .withColumn("w1", split($"bg", " ").getItem(0))
    val ctx = dict.groupBy($"w1").agg(sum($"c2").as("c1"))
    val res = docBigrams
      .join(dict, Seq("bg"))
      .join(ctx, Seq("w1"))
      .withColumn("p_e6", expr("(c2 * 1000000) div c1"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_transitions"),
           expr("sum(tf * p_e6) div sum(tf)").as("lm_mean_e6"),
           min($"p_e6").as("lm_min_e6"))
    Dedup.freeing(res, docBigrams)
  }

  /** Number of BPE merge rounds [[qTxtBpeMerges]] learns. */
  private[graft] val BpeMerges = 3

  /** The BPE tokenizer-training LOOP ([[qTxtBpePairs]] is its first
    * iteration's counting step): [[BpeMerges]] rounds of count adjacent
    * symbol pairs over the word histogram → pick the most frequent pair
    * (count desc, pair asc — a total order) → merge its occurrences
    * left-to-right non-overlapping. Emits the learned merge table — the
    * artifact a BPE tokenizer ships.
    *
    * The subtle step is the MERGE application: "left-to-right
    * non-overlapping" is sequential on paper ("aaa" + (a,a) → [aa, a]),
    * but within a run of consecutive match positions the kept matches are
    * exactly the even offsets — so gaps-and-islands over the match
    * positions (one row_number + one per-island min) decides every merge
    * in parallel, with no fold and no UDF; both engines run the identical
    * window logic.
    *
    * Scale: BPE trains on the (word, freq) HISTOGRAM, not the token
    * stream — the heavy aggregation is the one corpus tokenize+count;
    * every round then works on vocab-sized frames (pair counting via a
    * narrow explode; application via per-word windows bounded by word
    * length). The per-round argmax is ONE collected row (bounded driver
    * scalar, the same convention as the centroid constants). */
  def qTxtBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeTrainFor(spark, dir)._1
      .toDF("merge_idx", "left_sym", "right_sym", "merged", "n_occurrences")
  }

  /** The trained BPE artifacts (merge table + encoded vocabulary),
    * memoized per (session, fixture): the train half
    * ([[qTxtBpeMerges]]) and the encode half ([[qTxtBpeEncode]]) of the
    * tokenizer round trip both need them, and the training loop is
    * deterministic — re-running it per consumer re-derived the identical
    * table. The vocabulary is lineage-cut (the loop's last round is
    * already a checkpoint-shaped persisted frame; the memo pins a
    * LogicalRDD leaf) — same shared-artifact discipline as the dedup/ANN
    * index memos. */
  private val bpeMemo = new graft.SessionMemo[
    (Seq[(Long, String, String, String, Long)], DataFrame)]()
  private def bpeTrainFor(spark: SparkSession, dir: String)
      : (Seq[(Long, String, String, String, Long)], DataFrame) =
    bpeMemo.getOrElseUpdate(spark, dir + ":bpe") {
      val (merges, vocab) = bpeTrain(Tables.documents(spark, dir))
      val v = vocab.localCheckpoint(true)
      vocab.unpersist(false)
      (merges, v)
    }

  /** Frame-parametric core of [[qTxtBpeMerges]] over any frame with a
    * `text` column — split out so the spec can prove the left-to-right
    * non-overlap semantics ("aaa" + (a,a) → [aa, a]) on a crafted corpus
    * where the interesting runs are known by construction. */
  /** The BPE training loop core: returns the learned merge table AND the
    * final encoded vocabulary (wid → post-merge symbol list, freq) —
    * PERSISTED; the caller owns the release. [[bpeMergesFrom]] emits the
    * merge table; [[qTxtBpeEncode]] applies the vocabulary back to the
    * corpus (the tokenizer train → encode round trip). */
  private[graft] def bpeTrain(docs: DataFrame)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val wOrd = Window.partitionBy($"wid").orderBy($"p")
    var words = docs
      .select(explode(TextHash.tokens($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("freq"))
      .select($"t".as("wid"),
        expr("transform(sequence(1, length(t)), i -> substr(t, i, 1))").as("syms"),
        $"freq")
      .persist()
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    for (r <- 1 to BpeMerges) {
      val best = words.filter(size($"syms") >= 2)
        .select($"freq", explode(zip_with(
          slice($"syms", lit(1), size($"syms") - 1),
          slice($"syms", lit(2), size($"syms") - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
        .groupBy($"pr.l".as("l"), $"pr.r".as("r")).agg(sum($"freq").as("n"))
        .orderBy($"n".desc, $"l", $"r").limit(1).head()
      val (bl, br, bn) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((r.toLong, bl, br, bl + br, bn))
      val applied = words
        .select($"wid", $"freq", posexplode($"syms"))
        .select($"wid", $"freq", ($"pos" + 1).as("p"), $"col".as("sym"))
        .withColumn("nxt", lead($"sym", 1).over(wOrd))
        .withColumn("mtc", $"sym" === bl && $"nxt" === br)
        .withColumn("mrn", when($"mtc",
          row_number().over(Window.partitionBy($"wid", $"mtc").orderBy($"p"))))
        .withColumn("grp", $"p" - $"mrn")
        .withColumn("valid", coalesce($"mtc" &&
          ($"p" - min($"p").over(Window.partitionBy($"wid", $"grp"))) % 2 === 0,
          lit(false)))
        .withColumn("drp", coalesce(lag($"valid", 1).over(wOrd), lit(false)))
        .filter(!$"drp")
        .withColumn("osym", when($"valid", lit(bl + br)).otherwise($"sym"))
        .groupBy($"wid")
        .agg(max($"freq").as("freq"),
             sort_array(collect_list(struct($"p", $"osym"))).as("ps"))
        .select($"wid", transform($"ps", x => x.getField("osym")).as("syms"), $"freq")
        .persist()
      applied.count()
      words.unpersist(false)
      words = applied
    }
    (merges.toSeq, words)
  }

  private[graft] def bpeMergesFrom(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val (merges, vocab) = bpeTrain(docs)
    vocab.unpersist(false)
    import spark.implicits._
    merges.toDF("merge_idx", "left_sym", "right_sym", "merged", "n_occurrences")
  }

  /** Apply the learned BPE vocabulary back to the corpus — the ENCODE half
    * of the tokenizer round trip ([[qTxtBpeMerges]] is the train half).
    * Per document: whitespace token count, total BPE symbol count after
    * the [[BpeMerges]] learned merges, token characters, and the
    * chars-per-symbol compression ratio in e4 fixed point (the number a
    * tokenizer team watches when choosing merge count).
    *
    * Scale shape: encoding joins the token stream against the VOCAB-sized
    * (wid → symbol count) table — the corpus is tokenized once and never
    * re-windowed; all the per-character merge work happened on the word
    * histogram during training. */
  def qTxtBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, vocab) = bpeTrainFor(spark, dir)
    val wl = vocab.select($"wid".as("t"), size($"syms").cast("long").as("n_sym"))
    val res = docs
      .select($"doc_id", explode(TextHash.tokens($"text")).as("t"))
      .join(wl, Seq("t"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           sum($"n_sym").as("n_bpe_symbols"),
           sum(length($"t")).cast("long").as("n_token_chars"))
      .withColumn("chars_per_symbol_e4",
        expr("n_token_chars * 10000 div n_bpe_symbols"))
      .orderBy($"doc_id")
    Dedup.freeing(res) // vocab is the shared memo's checkpoint — kept
  }

  /** PII patterns shared VERBATIM with the DuckDB oracle (the subset of
    * regex syntax where Java's engine and RE2 agree: no lookaround, no
    * backrefs): email, NANP-style phone, dotted-quad IPv4. Counts are
    * per-pattern over the ORIGINAL text; redaction applies sequentially
    * in declaration order. */
  private[graft] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Frame-parametric core of [[qTxtRedact]] over any (doc_id, text)
    * frame — split out so the spec can prove the regex behavior on an
    * inline fixture that actually CONTAINS PII (the synthetic corpus has
    * none, so the registry run exercises the zero-match path plus the
    * redacted-text fingerprint). */
  private[graft] def redactFrom(docs: DataFrame): DataFrame = {
    val counts = PiiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all($"text", lit(pat), lit(0))).cast("long")
        .as(s"n_$name")
    }
    val redacted = PiiPatterns.foldLeft($"text") {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    docs
      .select(Seq($"doc_id") ++ counts ++ Seq(redacted.as("red")): _*)
      .withColumn("n_pii",
        PiiPatterns.map(p => col(s"n_${p._1}")).reduce(_ + _))
      .select(Seq($"doc_id") ++
        Seq("email", "phone", "ip").map(n => col(s"n_$n")) ++
        Seq($"n_pii", ($"n_pii" === 0L).as("is_clean"),
            TextHash.h32($"red").as("redacted_fp")): _*)
  }

  /** PII detection + redaction manifest — the privacy-scrub pass a
    * training-data pipeline runs before anything ships: per-document match
    * counts by PII type, the total, the clean verdict, and the fingerprint
    * of the REDACTED text (so a downstream exact-dedup can run on
    * post-redaction content — two documents differing only in the PII they
    * leak dedup together). One narrow codegen'd projection per document;
    * no joins, no aggregation, no skew — embarrassingly parallel at any
    * corpus size. */
  def qTxtRedact(spark: SparkSession, dir: String): DataFrame =
    redactFrom(Tables.documents(spark, dir))

  /** Per-document top-3 characteristic terms by an integer TF-IDF proxy —
    * the keyword-extraction / feature-selection step of an indexing
    * pipeline. Score = (tf × N × 10⁴) div df: monotone in tf·(N/df) per
    * document, all-integer so the ranking (and its deterministic
    * (score, token) tie-break) hash-matches exactly — a floating log-idf
    * would differ in final ulps between engines.
    *
    * Scale: tf is one hash aggregate over the token explode (partial agg
    * collapses repeats map-side); df is one aggregate over tf's distinct
    * (doc, token) rows; the tf⋈df equi-join shuffles on the token — the
    * same key-skew profile as the shingle postings joins (a stop-token's
    * rows all share a key; AQE skew-split handles it, and a production run
    * would drop stopword tokens with the same DF cap the shingle path
    * uses). The per-doc window partitions on doc_id — bounded by distinct
    * tokens per document, never by corpus size. N (one scalar) is the only
    * driver value.
    *
    * Domain bound: the score stays inside a signed 64-bit long while
    * tf·N < ~9.2e14 — comfortably true through billion-document corpora
    * with 100k-token documents. Past that (≥10¹¹ docs), switch the score
    * expression to DECIMAL(38,0) on both engines; Spark's non-ANSI long
    * wrap would otherwise silently demote a document's top term while
    * DuckDB's HUGEINT keeps going. */
  def qTxtTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val tf = docs
      .select($"doc_id", explode(TextHash.tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"token")
    tf.join(df, Seq("token"))
      .withColumn("score", expr(s"(tf * $nDocs * 10000) div df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"rnk", $"token", $"tf", $"df", $"score")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_txt_tokens"      -> qTxtTokens _,
    "q_txt_bigrams"     -> qTxtBigrams _,
    "q_txt_pmi"         -> qTxtPmi _,
    "q_txt_oov"         -> qTxtOov _,
    "q_txt_chunks"      -> qTxtChunks _,
    "q_txt_chunk_dedup" -> qTxtChunkDedup _,
    "q_txt_pack"        -> qTxtPack _,
    "q_txt_bpe_pairs"   -> qTxtBpePairs _,
    "q_txt_contamination" -> qTxtContamination _,
    "q_txt_dsir"        -> qTxtDsir _,
    "q_txt_quality"     -> qTxtQuality _,
    "q_txt_classifier"  -> qTxtClassifier _,
    "q_txt_langid"      -> qTxtLangid _,
    "q_txt_langmatrix"  -> qTxtLangMatrix _,
    "q_txt_fingerprint" -> qTxtFingerprint _,
    "q_txt_gopher"      -> qTxtGopher _,
    "q_txt_templates"   -> qTxtTemplates _,
    "q_txt_extract"     -> qTxtExtract _,
    "q_txt_stopwords"   -> qTxtStopwords _,
    "q_txt_tfidf"       -> qTxtTfidf _,
    "q_txt_bm25"        -> qTxtBm25 _,
    "q_txt_winnow"      -> qTxtWinnow _,
    "q_txt_bpe_merges"  -> qTxtBpeMerges _,
    "q_txt_bpe_encode"  -> qTxtBpeEncode _,
    "q_txt_lm_score"    -> qTxtLmScore _,
    "q_txt_redact"      -> qTxtRedact _,
    "q_mix_weights"     -> qTxtMixture _,
    "q_mix_temperature" -> qTxtTemperature _,
    "q_mix_resample"    -> qTxtResample _,
    "q_txt_budget"      -> qTxtBudget _,
    "q_pipeline_clean"  -> qPipelineClean _,
  )

  // ---- DuckDB oracles ------------------------------------------------------

  private val W = s"${TextHash.sqlTokens("text")}"

  /** SQL twin of [[langPred]] over a tokens-list alias. */
  private def sqlPredCase(w: String): String = {
    val scoreFor = LangMarkers.map { case (lang, words) =>
      val list = words.map(x => s"'$x'").mkString(",")
      lang -> s"len(list_filter($w, t -> t IN ($list)))"
    }
    val best = s"greatest(${scoreFor.map(_._2).mkString(", ")})"
    val whens = scoreFor
      .map { case (lang, e) => s"WHEN $best > 0 AND $e = $best THEN '$lang'" }
      .mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  private def bpeRoundSql(r: Int): String = {
        val w = s"w${r - 1}"
        s"""p$r AS (
              SELECT sy[i] AS l, sy[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS n
              FROM (SELECT freq, sy, unnest(generate_series(1, len(sy) - 1)) AS i
                    FROM $w WHERE len(sy) >= 2)
              GROUP BY 1, 2),
            b$r AS MATERIALIZED (
              SELECT l, r, n FROM p$r ORDER BY n DESC, l, r LIMIT 1),
            e$r AS (SELECT wid, freq, sy, unnest(generate_series(1, len(sy))) AS p FROM $w),
            s$r AS (SELECT wid, freq, p, sy[p] AS sym FROM e$r),
            m$r AS (SELECT *, lead(sym) OVER (PARTITION BY wid ORDER BY p) AS nxt FROM s$r),
            t$r AS (SELECT *, (sym = (SELECT l FROM b$r) AND nxt = (SELECT r FROM b$r)) AS mtc FROM m$r),
            r$r AS (SELECT *, CASE WHEN mtc THEN row_number() OVER (PARTITION BY wid, mtc ORDER BY p) END AS mrn FROM t$r),
            g$r AS (SELECT *, p - mrn AS grp FROM r$r),
            v$r AS (SELECT *, coalesce(mtc AND (p - min(p) OVER (PARTITION BY wid, grp)) % 2 = 0, false) AS valid FROM g$r),
            d$r AS (SELECT *, coalesce(lag(valid) OVER (PARTITION BY wid ORDER BY p), false) AS drp FROM v$r),
            w$r AS MATERIALIZED (
              SELECT wid, max(freq) AS freq,
                list(CASE WHEN valid THEN (SELECT l FROM b$r) || (SELECT r FROM b$r)
                          ELSE sym END ORDER BY p) AS sy
              FROM d$r WHERE NOT drp GROUP BY wid)"""
      }

  /** The `w0` CTE both BPE oracles start from: the (word, freq) histogram
    * exploded to single-character symbol lists. */
  private def bpeW0Sql: String =
    s"""w0 AS MATERIALIZED (
            SELECT t AS wid,
              list_transform(generate_series(1, length(t)), i -> substr(t, i, 1)) AS sy,
              CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest($W) AS t FROM documents)
            GROUP BY t)"""

  val oracles: Map[String, String] = Map(
    "q_txt_pmi" ->
      s"""WITH t AS (SELECT $W AS w FROM documents),
          uni AS (SELECT word, count(*) AS c
                  FROM (SELECT unnest(w) AS word FROM t) GROUP BY 1),
          tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_total FROM uni),
          b AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i + 1])) AS bigram
                FROM t WHERE len(w) >= 2),
          bc AS (SELECT split_part(bigram, ' ', 1) AS x,
                   split_part(bigram, ' ', 2) AS y, count(*) AS c_xy
                 FROM b GROUP BY 1, 2 HAVING count(*) >= 5)
          SELECT x, y, CAST(c_xy AS BIGINT) AS c_xy,
            CAST(ux.c AS BIGINT) AS c_x, CAST(uy.c AS BIGINT) AS c_y,
            CAST(c_xy * t_total * 1000 // (ux.c * uy.c) AS BIGINT) AS pmi_e3
          FROM bc JOIN uni ux ON bc.x = ux.word
                  JOIN uni uy ON bc.y = uy.word, tot
          ORDER BY pmi_e3 DESC, x, y LIMIT 20""",
    "q_txt_oov" ->
      s"""WITH occ AS (SELECT source, unnest($W) AS word FROM documents),
          cnt AS (SELECT word, count(*) AS c FROM occ GROUP BY 1),
          vocab AS (SELECT word FROM cnt ORDER BY c DESC, word LIMIT 1000)
          SELECT source, count(*) AS n_tokens,
            CAST(sum(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_covered,
            CAST(count(DISTINCT CASE WHEN v.word IS NULL THEN occ.word END)
              AS BIGINT) AS n_oov_types,
            CAST(sum(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END)
              * 1000000 // count(*) AS BIGINT) AS coverage_e6
          FROM occ LEFT JOIN vocab v ON occ.word = v.word
          GROUP BY source ORDER BY source""",
    "q_txt_classifier" -> {
      val wList = ClfWeights.mkString("list_value(", ", ", ")")
      s"""WITH d AS (SELECT doc_id, source, $W AS w FROM documents),
          t AS (SELECT doc_id, source, len(w) AS n_toks, unnest(w) AS token
                FROM d),
          s AS (SELECT doc_id, source, n_toks,
                  CAST(sum($wList[
                    CAST(${TextHash.sqlH32("token")} % 64 AS INTEGER) + 1])
                    AS BIGINT) AS margin
                FROM t GROUP BY 1, 2, 3)
          SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks, margin,
            margin >= 0 AS accept
          FROM s"""
    },
    "q_txt_gopher" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents WHERE len($W) >= 1),
          tf AS (SELECT doc_id, unnest(w) AS tok FROM t),
          tfc AS (SELECT doc_id, tok, count(*) AS tf FROM tf GROUP BY 1, 2),
          ws AS (SELECT doc_id, sum(tf) AS n_tok, max(tf) AS top_tf,
                   sum(CASE WHEN tf > 1 THEN tf ELSE 0 END) AS dup_tok
                 FROM tfc GROUP BY 1),
          bg AS (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i + 1])) AS b
                 FROM t WHERE len(w) >= 2),
          bgc AS (SELECT doc_id, b, count(*) AS bf FROM bg GROUP BY 1, 2),
          bs AS (SELECT doc_id, sum(bf) AS n_bi, count(*) AS n_bi_distinct
                 FROM bgc GROUP BY 1),
          ls AS (SELECT doc_id,
                   list_sum(list_transform(w, x -> length(x))) AS sum_len,
                   len(w) AS n_w
                 FROM t),
          m AS (
            SELECT ws.doc_id, CAST(n_tok AS BIGINT) AS n_tok,
              CAST(dup_tok * 10000 // n_tok AS BIGINT) AS dup_word_e4,
              CAST(top_tf * 10000 // n_tok AS BIGINT) AS top_word_e4,
              CAST(coalesce((n_bi - n_bi_distinct) * 10000 // n_bi, 0)
                AS BIGINT) AS dup_bigram_e4,
              CAST(sum_len * 100 // n_w AS BIGINT) AS mean_word_len_e2
            FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
            JOIN ls ON ws.doc_id = ls.doc_id)
          SELECT *,
            (dup_word_e4 < 3000 AND top_word_e4 < 2000 AND
             dup_bigram_e4 < 2000 AND
             mean_word_len_e2 BETWEEN 300 AND 1000) AS keep
          FROM m ORDER BY doc_id""",
    "q_txt_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($W) AS token FROM documents),
          tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
          dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
          nd AS (SELECT count(*) AS n FROM documents),
          scored AS (
            SELECT doc_id, token, tf, df,
              (tf * (SELECT n FROM nd) * 10000) // df AS score
            FROM tf JOIN dfx USING (token)),
          ranked AS (
            SELECT *, CAST(row_number() OVER (
              PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rnk
            FROM scored)
          SELECT doc_id, rnk, token, tf, df, CAST(score AS BIGINT) AS score
          FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q_txt_bm25" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH corp AS (
            SELECT count(*) AS n, CAST(sum(len($W)) AS BIGINT) AS t
            FROM documents),
          tf AS (
            SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
            FROM (SELECT doc_id, CAST(len($W) AS BIGINT) AS dl,
                         unnest($W) AS tok
                  FROM documents)
            WHERE tok IN ($termList)
            GROUP BY 1, 2),
          dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
          scored AS (
            SELECT doc_id,
              ((corp.n - df + 1) * 10000) // (df + 1) AS idf_e4,
              (22 * tf * corp.t * 10000) //
                (10 * tf * corp.t + 3 * corp.t + 9 * dl * corp.n) AS tfn_e4
            FROM tf JOIN dfx USING (tok), corp)
          SELECT doc_id, count(*) AS n_hit_terms,
            CAST(sum((idf_e4 * tfn_e4) // 10000) AS BIGINT) AS bm25_e4
          FROM scored
          GROUP BY doc_id
          ORDER BY bm25_e4 DESC, doc_id
          LIMIT $Bm25TopK""" },
    "q_txt_budget" ->
      // The plain GLOBAL running sum — hash-matching it proves the Spark
      // side's banded two-pass prefix decomposition is exactly equivalent.
      s"""WITH t AS (
            SELECT doc_id, CAST(len($W) AS BIGINT) AS n_tokens,
              CAST(len(list_filter($W,
                t -> t IN ('the','a','of','and','to','in','is')))
                * 10000 // len($W) AS BIGINT) AS score
            FROM documents),
          c AS (
            SELECT doc_id, score, n_tokens,
              CAST(sum(n_tokens) OVER (
                ORDER BY score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_tokens
            FROM t)
          SELECT doc_id, score, n_tokens, cum_tokens,
            cum_tokens <= $SelectBudget AS kept
          FROM c ORDER BY doc_id""",
    "q_mix_resample" ->
      s"""WITH ps AS (
            SELECT source, CAST(sum(len($W)) AS BIGINT) AS tokens
            FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                       count(*) AS n_sources FROM ps),
          wts AS (
            SELECT source,
              CAST(total_tokens * 10000 // (n_sources * tokens) AS BIGINT)
                AS weight_e4
            FROM ps, t),
          d AS (
            SELECT doc_id, source, CAST(len($W) AS BIGINT) AS n_tokens
            FROM documents),
          m AS (
            SELECT d.doc_id, d.source, d.n_tokens, w.weight_e4,
              weight_e4 // 10000
                + CASE WHEN ${TextHash.sqlH60("doc_id || '-mix'")} % 10000
                       < weight_e4 % 10000 THEN 1 ELSE 0 END AS n_copies
            FROM d JOIN wts w ON d.source = w.source)
          SELECT doc_id, source, n_tokens, weight_e4,
            CAST(n_copies AS BIGINT) AS n_copies
          FROM m WHERE n_copies > 0 ORDER BY doc_id""",
    "q_mix_temperature" ->
      s"""WITH ps AS (
            SELECT source, CAST(sum(len($W)) AS BIGINT) AS tokens
            FROM documents GROUP BY 1),
          sq AS (SELECT source, tokens,
                   CAST(floor(sqrt(tokens) * 1000) AS BIGINT) AS sq
                 FROM ps),
          t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                       CAST(sum(sq) AS BIGINT) AS total_sq FROM sq)
          SELECT source, tokens,
            CAST(tokens * 10000 // total_tokens AS BIGINT) AS share_e4,
            CAST(sq * 10000 // total_sq AS BIGINT) AS temp_share_e4,
            CAST((sq * total_tokens * 10000) // (total_sq * tokens) AS BIGINT)
              AS factor_e4
          FROM sq, t ORDER BY source""",
    "q_mix_weights" ->
      s"""WITH ps AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len($W)) AS BIGINT) AS tokens
            FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                       count(*) AS n_sources FROM ps)
          SELECT source, n_docs, tokens,
            CAST(tokens * 10000 // total_tokens AS BIGINT) AS share_e4,
            CAST(total_tokens * 10000 // (n_sources * tokens) AS BIGINT)
              AS weight_e4
          FROM ps, t ORDER BY source""",
    "q_txt_bpe_pairs" ->
      s"""WITH tok AS (SELECT unnest($W) AS t FROM documents),
          p AS (SELECT unnest(list_transform(generate_series(1, length(t) - 1),
                  i -> substr(t, i, 2))) AS pair
                FROM tok WHERE length(t) >= 2)
          SELECT pair, count(*) AS n FROM p
          GROUP BY pair ORDER BY n DESC, pair LIMIT 20""",
    "q_txt_chunks" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
          st AS (SELECT doc_id, w,
                   unnest(generate_series(0, greatest(len(w) - 1, 0), $ChunkStride)) AS s
                 FROM t),
          ch AS (SELECT doc_id, CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
                   list_slice(w, s + 1, s + $ChunkSize) AS chunk FROM st)
          SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS chunk_tokens,
            ${TextHash.sqlH32("array_to_string(chunk, ' ')")} AS chunk_fp
          FROM ch ORDER BY doc_id, chunk_idx""",
    "q_txt_stopwords" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
          tok AS (SELECT DISTINCT doc_id, unnest(w) AS token FROM t),
          dfx AS (SELECT token, count(*) AS df FROM tok GROUP BY 1),
          n AS (SELECT count(*) AS n_docs FROM documents)
          SELECT token, df,
            CAST(df * 10000 // n_docs AS BIGINT) AS df_e4
          FROM dfx, n
          WHERE df * 10000 // n_docs >= 5000
          ORDER BY df DESC, token""",
    "q_txt_templates" ->
      s"""WITH t AS (SELECT doc_id, source, $W AS w FROM documents),
          f AS (SELECT doc_id, source,
                  ${TextHash.sqlPrefixFp8("w")} AS prefix_fp
                FROM t)
          SELECT prefix_fp, count(*) AS n_docs,
            min(doc_id) AS rep_doc_id,
            count(DISTINCT source) AS n_sources
          FROM f GROUP BY 1 HAVING count(*) >= 2 ORDER BY prefix_fp""",
    "q_txt_extract" ->
      """WITH h AS (
            SELECT doc_id, text,
              '<html><head><title>doc-' || doc_id ||
              '</title><style>body{margin:0;font:14px sans}</style></head>' ||
              '<body><nav><a href="/">home</a><a href="/crawl">index</a>' ||
              '</nav><main><p>' ||
              replace(replace(replace(text,
                '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
              '</p></main><script>var page=1;</script>' ||
              '<footer>(c) example.org</footer></body></html>' AS html
            FROM documents),
          x AS (
            SELECT doc_id, text, html,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
                '(?s)<head>.*?</head>', '', 'g'),
                '(?s)<script[^>]*>.*?</script>', '', 'g'),
                '(?s)<nav[^>]*>.*?</nav>', '', 'g'),
                '(?s)<footer[^>]*>.*?</footer>', '', 'g'),
                '<[^>]*>', '', 'g') AS stripped
            FROM h)
          SELECT doc_id,
            CAST(length(html) AS BIGINT) AS markup_len,
            CAST(length(text) AS BIGINT) AS text_len,
            CAST((length(html) - length(replace(html, '<a ', ''))) // 3
              AS BIGINT) AS n_links,
            CAST(CAST(length(text) AS BIGINT) * 10000 // length(html)
              AS BIGINT) AS text_ratio_e4,
            (replace(replace(replace(stripped,
              '&lt;', '<'), '&gt;', '>'), '&amp;', '&') = text) AS extract_ok
          FROM x ORDER BY doc_id""",
    "q_txt_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
          st AS (SELECT doc_id, w,
                   unnest(generate_series(0, greatest(len(w) - 1, 0), $ChunkStride)) AS s
                 FROM t),
          ch AS (SELECT doc_id, CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
                   list_slice(w, s + 1, s + $ChunkSize) AS chunk FROM st),
          fp AS (SELECT doc_id, chunk_idx,
                   CAST(len(chunk) AS BIGINT) AS chunk_tokens,
                   ${TextHash.sqlH32("array_to_string(chunk, ' ')")} AS chunk_fp
                 FROM ch),
          k AS (SELECT doc_id, chunk_tokens,
                  row_number() OVER (PARTITION BY chunk_fp
                                     ORDER BY doc_id, chunk_idx) = 1 AS kept
                FROM fp)
          SELECT doc_id, count(*) AS n_chunks,
            CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
            CAST(sum(CASE WHEN kept THEN chunk_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
            CAST(sum(CASE WHEN NOT kept THEN chunk_tokens ELSE 0 END) AS BIGINT) AS dropped_tokens
          FROM k GROUP BY doc_id ORDER BY doc_id""",
    "q_txt_dsir" -> {
      val evalList = EvalSources.map(s => s"'$s'").mkString(", ")
      val B = DsirBuckets
      s"""WITH t AS (SELECT doc_id, source, $W AS w FROM documents),
          u AS (SELECT doc_id, source,
                  unnest(list_transform(w, tk -> ${TextHash.sqlH32("tk")} % $B)) AS f
                FROM t),
          b AS (SELECT doc_id, source,
                  unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> ${TextHash.sqlH32("w[i] || ' ' || w[i + 1]")} % $B)) AS f
                FROM t WHERE len(w) >= 2),
          feats AS (SELECT * FROM u UNION ALL SELECT * FROM b),
          perf AS (SELECT f,
              sum(CASE WHEN source IN ($evalList) THEN 1 ELSE 0 END) AS t_f,
              sum(CASE WHEN source IN ($evalList) THEN 0 ELSE 1 END) AS s_f
            FROM feats GROUP BY f),
          tot AS (SELECT CAST(sum(t_f) AS BIGINT) AS t_total,
                         CAST(sum(s_f) AS BIGINT) AS s_total FROM perf),
          r AS (SELECT f, (t_f + 1) * (s_total + $B) * 10000
                         // ((s_f + 1) * (t_total + $B)) AS r_e4
                FROM perf, tot),
          sc AS (SELECT doc_id, count(*) AS n_feats, sum(r_e4) AS w_sum_e4
                 FROM feats JOIN r USING (f)
                 WHERE source NOT IN ($evalList) GROUP BY doc_id)
          SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
            CAST(w_sum_e4 AS BIGINT) AS w_sum_e4,
            CAST(w_sum_e4 // n_feats AS BIGINT) AS avg_e4,
            CAST(w_sum_e4 // n_feats
                 + ${TextHash.sqlH32("'dsir:' || CAST(doc_id AS VARCHAR)")} % 256
                 AS BIGINT) AS key_e4
          FROM sc ORDER BY key_e4 DESC, doc_id LIMIT $DsirK"""
    },
    "q_txt_contamination" -> {
      val evalList = "'src19'"
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
          d AS (SELECT doc_id, ${TextHash.sqlShingles("w", 3)} AS sh FROM t),
          exh AS (SELECT doc_id, ${TextHash.sqlH32("s0")} AS s
                  FROM (SELECT doc_id, unnest(sh) AS s0 FROM d)),
          ex AS (SELECT e.doc_id, e.s, doc.source
                 FROM exh e JOIN documents doc ON e.doc_id = doc.doc_id),
          dict AS (SELECT DISTINCT s FROM ex WHERE source NOT IN ($evalList)),
          ev AS (SELECT doc_id, s FROM ex WHERE source IN ($evalList))
          SELECT ev.doc_id, count(*) AS n_shingles,
            CAST(sum(CASE WHEN dict.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_matched,
            CAST(sum(CASE WHEN dict.s IS NOT NULL THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS contam_e4
          FROM ev LEFT JOIN dict ON ev.s = dict.s
          GROUP BY 1 ORDER BY 1"""
    },
    "q_txt_bigrams" ->
      s"""WITH t AS (SELECT $W AS w FROM documents),
          b AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i + 1])) AS bigram
                FROM t WHERE len(w) >= 2)
          SELECT bigram, count(*) AS n FROM b
          GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
    "q_txt_tokens" ->
      s"""WITH t AS (SELECT doc_id, text, $W AS w FROM documents)
          SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars,
            CAST(len(w) AS BIGINT) AS n_ws_tokens,
            CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS BIGINT) AS n_word_tokens,
            CAST(length(text) * 10000 // len(w) AS BIGINT) AS chars_per_tok_e4
          FROM t ORDER BY doc_id""",
    "q_txt_pack" ->
      s"""WITH t AS (
            SELECT doc_id, source, len($W) AS n_tokens FROM documents),
          c AS (
            SELECT doc_id, source, n_tokens,
              CAST(coalesce(sum(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_off
            FROM t)
          SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
            start_off,
            start_off // $PackBudget AS first_bin,
            (start_off + greatest(n_tokens, 1) - 1) // $PackBudget AS last_bin,
            start_off % $PackBudget AS offset_in_bin,
            (start_off + greatest(n_tokens, 1) - 1) // $PackBudget
              - start_off // $PackBudget + 1 AS n_bins
          FROM c ORDER BY doc_id""",
    "q_txt_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $W AS w,
            length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS np,
            len(list_filter($W, t -> t IN ('the','a','of','and','to','in','is'))) AS ns,
            length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS nu
          FROM documents)
          SELECT doc_id,
            CAST(np AS BIGINT) AS n_punct,
            CAST(np * 10000 // length(text) AS BIGINT) AS punct_e4,
            CAST(ns AS BIGINT) AS n_stop,
            CAST(ns * 10000 // len(w) AS BIGINT) AS stop_e4,
            CAST(nu AS BIGINT) AS n_upper,
            CAST(len(list_filter(w, t -> length(t) >= 6)) * 10000 // len(w) AS BIGINT) AS long_tok_e4
          FROM t ORDER BY doc_id""",
    "q_txt_langmatrix" ->
      s"""WITH t AS (SELECT source, lang, $W AS w FROM documents),
          p AS (SELECT source, lang, CAST(len(w) AS BIGINT) AS nt,
                  ${sqlPredCase("w")} AS pred
                FROM t)
          SELECT source, pred, count(*) AS n_docs,
            CAST(sum(nt) AS BIGINT) AS tokens,
            CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
              AS n_agree,
            CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS agree_e4
          FROM p GROUP BY 1, 2 ORDER BY source, pred""",
    "q_txt_langid" -> {
      val scoreExprs = LangMarkers.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(",")
        s"CAST(len(list_filter(w, t -> t IN ($list))) AS BIGINT) AS score_$lang"
      }.mkString(",\n            ")
      val scoreCols = LangMarkers.map(m => s"score_${m._1}")
      val best = s"greatest(${scoreCols.mkString(", ")})"
      val predCase = LangMarkers.map { case (lang, _) =>
        s"WHEN $best > 0 AND score_$lang = $best THEN '$lang'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, $W AS w FROM documents),
          s AS (SELECT doc_id, lang,
            $scoreExprs
          FROM t)
          SELECT doc_id, lang, ${scoreCols.mkString(", ")},
            CASE $predCase ELSE 'und' END AS pred,
            (CASE $predCase ELSE 'und' END = lang) AS is_match
          FROM s ORDER BY doc_id"""
    },
    "q_pipeline_clean" ->
      s"""WITH t AS (SELECT doc_id, text, $W AS w FROM documents),
          s AS (SELECT doc_id, text,
            md5(${TextHash.sqlNormText("text")}) AS fp,
            ${sqlPredCase("w")} AS pred,
            CAST(len(w) AS BIGINT) AS n_toks,
            (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 10000 // length(text) AS punct_e4
          FROM t),
          f AS (SELECT * FROM s WHERE n_toks >= 20 AND punct_e4 < 500),
          d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f)
          SELECT pred, count(*) AS n_docs,
            CAST(sum(n_toks) AS BIGINT) AS total_toks,
            CAST(sum(length(text)) AS BIGINT) AS total_chars
          FROM d WHERE rn = 1 GROUP BY pred ORDER BY pred""",
    "q_txt_winnow" -> {
      val gram = TextHash.sqlH32(
        s"concat_ws(' ', ${(0 until WinnowK).map(j => s"w[i+$j]").mkString(", ")})")
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
          g AS (SELECT doc_id,
                  list_transform(generate_series(1, greatest(len(w) - ${WinnowK - 1}, 1)),
                    i -> $gram) AS hs
                FROM t),
          r AS (SELECT doc_id, len(hs) AS n, hs,
                  unnest(generate_series(1, len(hs))) AS p
                FROM g),
          rh AS (SELECT doc_id, n, p, hs[p] AS h FROM r),
          wd AS (SELECT doc_id, n, p, h,
                   unnest(generate_series(0, ${WinnowW - 1})) AS off
                 FROM rh),
          wj AS (SELECT doc_id, p + off AS j, h, p FROM wd
                 WHERE p + off <= n AND p + off >= least($WinnowW, n)),
          sel AS (SELECT doc_id, j,
                    min(h * $PosPack + ($PosPack - p)) AS packed
                  FROM wj GROUP BY 1, 2)
          SELECT DISTINCT doc_id,
            CAST($PosPack - packed % $PosPack AS BIGINT) AS sel_pos,
            CAST(packed // $PosPack AS BIGINT) AS fp
          FROM sel ORDER BY doc_id, sel_pos""" },
    "q_txt_bpe_merges" -> {
      // The merge loop unrolled: per round, pair counts → 1-row argmax CTE
      // → windowed left-to-right merge application (the same
      // gaps-and-islands logic as the Spark side, see [[qTxtBpeMerges]]).
      // AS MATERIALIZED on every multiply-referenced CTE — an inlining
      // planner would otherwise duplicate the whole chain per reference.
      // `bpeRoundSql`/`bpeW0Sql` are shared with the encode oracle so the
      // two cannot drift.
      def round(r: Int) = bpeRoundSql(r)
      val rounds = (1 to BpeMerges).map(round).mkString(",\n            ")
      val rows = (1 to BpeMerges).map { r =>
        s"""SELECT CAST($r AS BIGINT) AS merge_idx, l AS left_sym, r AS right_sym,
              l || r AS merged, n AS n_occurrences FROM b$r"""
      }.mkString("\nUNION ALL\n")
      s"""WITH $bpeW0Sql,
          $rounds
          $rows
          ORDER BY merge_idx""" },
    "q_txt_bpe_encode" -> {
      val rounds = (1 to BpeMerges).map(bpeRoundSql).mkString(",\n            ")
      s"""WITH $bpeW0Sql,
          $rounds,
          wl AS (SELECT wid, CAST(len(sy) AS BIGINT) AS n_sym FROM w$BpeMerges),
          tok AS (SELECT doc_id, unnest($W) AS t FROM documents)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(n_sym) AS BIGINT) AS n_bpe_symbols,
            CAST(sum(length(t)) AS BIGINT) AS n_token_chars,
            CAST(sum(length(t)) * 10000 // sum(n_sym) AS BIGINT)
              AS chars_per_symbol_e4
          FROM tok JOIN wl ON tok.t = wl.wid
          GROUP BY doc_id ORDER BY doc_id""" },
    "q_txt_lm_score" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents WHERE len($W) >= 2),
          bgr AS (SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i + 1])) AS bg
                  FROM t),
          db AS (SELECT doc_id, bg, count(*) AS tf FROM bgr GROUP BY 1, 2),
          dict AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c2,
                     string_split(bg, ' ')[1] AS w1
                   FROM db GROUP BY 1),
          ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM dict GROUP BY 1),
          s AS (SELECT doc_id, tf, (c2 * 1000000) // c1 AS p_e6
                FROM db JOIN dict USING (bg) JOIN ctx USING (w1))
          SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_transitions,
            CAST(sum(tf * p_e6) // sum(tf) AS BIGINT) AS lm_mean_e6,
            CAST(min(p_e6) AS BIGINT) AS lm_min_e6
          FROM s GROUP BY doc_id ORDER BY doc_id""",
    "q_txt_redact" -> {
      val redacted = PiiPatterns.foldLeft("text") {
        case (e, (_, pat, repl)) => s"regexp_replace($e, '$pat', '$repl', 'g')"
      }
      val counts = PiiPatterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n            ")
      s"""WITH c AS (SELECT doc_id,
            $counts,
            ${TextHash.sqlH32(redacted)} AS redacted_fp
          FROM documents)
          SELECT doc_id, n_email, n_phone, n_ip,
            n_email + n_phone + n_ip AS n_pii,
            (n_email + n_phone + n_ip) = 0 AS is_clean,
            redacted_fp
          FROM c ORDER BY doc_id""" },
    "q_txt_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, $W AS w FROM documents),
          s AS (SELECT doc_id, text, w, ${TextHash.sqlShingles("w", 3)} AS sh FROM t)
          SELECT doc_id,
            md5(${TextHash.sqlNormText("text")}) AS fp_md5,
            ${TextHash.sqlH60(TextHash.sqlNormText("text"))} AS fp60,
            list_min(list_transform(sh, s -> ${TextHash.sqlH32("s")})) AS fp_content,
            ${TextHash.sqlPrefixFp8("w")} AS fp_prefix8
          FROM s ORDER BY doc_id""",
  )
}
