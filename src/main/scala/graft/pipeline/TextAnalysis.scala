package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID (n-gram/stopword heuristic), and document
  * fingerprinting. All pure `functions._` — codegen'd, shuffle-free
  * (per-row projections). */
object TextAnalysis {

  /** Whitespace token count (empty string ⇒ 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token count: word pieces + isolated punctuation. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]"))

  /** Normalized form used for fingerprinting: lowercase, non-alphanumerics
    * collapsed to single spaces. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** Content fingerprint over the normalized text (near-identical docs that
    * differ only in case/punctuation/whitespace collide). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Canonical text normalization — the pre-tokenization cleanup pass a
    * crawled corpus needs before any dedup/count is comparable across
    * sources: typographic ("curly") quotes and en/em-dashes fold to their
    * ASCII forms, NBSP becomes a regular space, whitespace runs collapse
    * to one space, the result is trimmed and lowercased. Unlike
    * [[normalized]] (a destructive fingerprint key), this KEEPS
    * punctuation — it is a display/training form, not a hash key.
    *
    * One codegen'd projection, shuffle-free. The whitespace class is the
    * EXPLICIT `[ \t\n\r]` (not `\s`): Java regex counts U+000B in `\s`,
    * RE2-based engines do not, so the explicit class is the portable
    * subset — and after the translate step all exotic blanks this pass
    * handles are already plain spaces. */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(
      // from: curly quotes, en/em dash, NBSP -> ASCII quotes/dash/space
      translate(text, "\u201C\u201D\u2018\u2019\u2013\u2014\u00A0",
        "\"\"''-- "), "[ \t\n\r]+", " ")))

  /** Tiny per-language stopword lists (public knowledge) for the heuristic
    * language scorer. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "que", "una", "por", "con"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"))

  /** Fraction of tokens that belong to `words` (0 when empty text). Hit
    * counting runs in the codegen'd [[graft.functions.TokenSetHits]]
    * kernel — the `aggregate` HOF alternative evaluates interpreted
    * (CodegenFallback) and is both ~10× slower steady-state and exposed to
    * the warm-session deopt collapse (see [[graft.functions.TextKernels]]). */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hitCount =
      element_at(graft.functions.TextFunctions.token_set_hits(text, Seq(words)), 1)
    when(size(toks) > 0, hitCount.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Heuristic language ID: the language whose stopword list scores the
    * most token hits (argmax over hit counts ≡ argmax over ratios — the
    * denominator is the same token count for every language); "und"
    * (undetermined) when no list hits. Ties break toward the
    * lexicographically greatest language code, like the ratio version.
    *
    * ONE traversal of ONE tokenization inside the codegen'd
    * [[graft.functions.TokenSetHits]] kernel (all five language counts
    * accumulate in a single pass); the argmax over the count array is
    * plain codegen'd `struct`/`array_max` — no interpreted lambda
    * anywhere in the projection. */
  def langId(text: Column): Column = {
    val langs = Stopwords.toSeq.sortBy(_._1)
    val hits = graft.functions.TextFunctions.token_set_hits(text, langs.map(_._2))
    val best = array_max(array(langs.zipWithIndex.map { case ((lang, _), i) =>
      struct(element_at(hits, i + 1).as("score"), lit(lang).as("lang"))
    }: _*))
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality features per document: char/token counts, mean token length,
    * alpha & punctuation ratios, and a [0,1] composite score. Deterministic
    * and SQL-expressible (oracle-checkable). */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("mean_token_len",
        when(col("n_tokens") > 0,
          (length(t) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
        .otherwise(lit(0.0)))
      .withColumn("alpha_ratio",
        when(length(t) > 0,
          (length(t) - length(regexp_replace(t, "[A-Za-z]", ""))).cast("double") / length(t))
        .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(length(t) > 0,
          length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") / length(t))
        .otherwise(lit(0.0)))
      // [0,1] composite: enough tokens × mostly-alphabetic content
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens") / lit(100.0)) * col("alpha_ratio"))
  }

  /** Single-pass per-document token statistics
    * `array<long>[total, distinct, topCount]` (codegen'd
    * [[graft.functions.TokenStats]] kernel, single-space tokens). The
    * Gopher/C4-style repetition gates — unique-token ratio
    * (distinct/total), top-token dominance (top/total) — derive from
    * these per ROW, shuffle-free; the equivalent
    * explode→groupBy(doc,token)→groupBy(doc) moves the whole tokenized
    * corpus through two shuffles for a per-document number. */
  def tokenStats(text: Column): Column =
    graft.functions.TextFunctions.token_stats(text)

  /** Gopher-style WITHIN-document repetition gates — the rule family
    * that catches template spam and generation loops exact dedup can't
    * see (the document is unique; its CONTENT repeats itself):
    *
    *   - `dup_gram_frac`  = 1 − distinct/total word n-grams (with
    *     multiplicity — a doc that is one phrase looped scores → 1)
    *   - `top_gram_frac`  = characters covered by the single most
    *     frequent n-gram (count × its codepoint length) / total chars —
    *     the "fraction of characters in the most common n-gram" gate
    *   - `dup_chunk_frac` = 1 − distinct/total over `chunkWords`-word
    *     pseudo-paragraphs ([[graft.functions.TextKernels.wordChunks]]
    *     — the duplicate-line gate for corpora without real line
    *     structure; swap in a real line split when one exists)
    *
    * One shuffle-free codegen'd projection per row: the n-gram counting
    * runs in the [[graft.functions.TextKernels.ngramStats]] kernel
    * (total/distinct/top-count/top-chars in one pass — never an
    * explode→groupBy(doc,gram)→re-groupBy(doc) double shuffle of the
    * grammed corpus), the chunk fraction is array builtins. Fractions
    * are single correctly-rounded IEEE divisions of exact integers (plus
    * one exact 1−x), so every value replays bit-identically in SQL; the
    * top gram ties break to the lexicographically smallest gram, making
    * `top_gram_frac` deterministic (ORDER BY cnt DESC, gram ASC in the
    * oracle). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: Column,
      n: Int = 2, chunkWords: Int = 8): DataFrame = {
    val st = graft.functions.TextFunctions.ngram_stats(textCol, n)
    val ch = graft.functions.TextFunctions.word_chunks(textCol, chunkWords)
    df.select(col(idCol), st.as("__st"), ch.as("__ch"),
        length(textCol).cast("long").as("__len"))
      .select(col(idCol),
        element_at(col("__st"), 1).as("total_grams"),
        element_at(col("__st"), 2).as("distinct_grams"),
        when(element_at(col("__st"), 1) > 0,
          lit(1.0) - element_at(col("__st"), 2).cast("double") /
            element_at(col("__st"), 1).cast("double"))
          .otherwise(lit(0.0)).as("dup_gram_frac"),
        when(col("__len") > 0,
          (element_at(col("__st"), 3) * element_at(col("__st"), 4))
            .cast("double") / col("__len").cast("double"))
          .otherwise(lit(0.0)).as("top_gram_frac"),
        when(size(col("__ch")) > 0,
          lit(1.0) - size(array_distinct(col("__ch"))).cast("double") /
            size(col("__ch")).cast("double"))
          .otherwise(lit(0.0)).as("dup_chunk_frac"))
  }

  /** Demo weights for [[classifierScore]] — dyadic rationals over the
    * feature vector [bias, totalTokens, distinctTokens, topTokenCount,
    * stopwordHits(en), chars]: reward vocabulary breadth and natural-
    * language stopword density, penalize repetition dominance and raw
    * bulk. A real deployment replaces these with trained values (keeping
    * them dyadic keeps the score engine-exact). */
  val DefaultClassifierWeights: Seq[Double] =
    Seq(0.0, -0.03125, 0.125, -0.25, 0.5, 0.015625)

  /** Linear quality-classifier score — the model-based filtering stage
    * (fastText-style) that follows the heuristic gates. The features are
    * per-document INTEGERS ([[tokenStats]]: total/distinct/top-token
    * counts; en-stopword occurrence hits; char count) computed in one
    * shuffle-free codegen'd projection pass, and the `weights` are
    * plan-time constants — a trained model deploys as a literal vector,
    * so scoring is a projection: no join, no shuffle, no model lookup.
    *
    * `weights` must be dyadic rationals (k/2⁻ᵐ, m ≤ ~40): each
    * weight×integer product and every partial sum is then EXACT in IEEE
    * doubles, so the score replays bit-identically in any engine
    * regardless of evaluation order. No sigmoid — it is monotone, so
    * admission thresholds act on the raw logit. */
  def classifierScore(text: Column,
      weights: Seq[Double] = DefaultClassifierWeights): Column = {
    require(weights.length == 6, s"expected 6 weights, got ${weights.length}")
    val st = tokenStats(text)
    val stopHits = element_at(
      graft.functions.TextFunctions.token_set_hits(text, Seq(Stopwords("en"))), 1)
    lit(weights(0)) +
      element_at(st, 1) * lit(weights(1)) +
      element_at(st, 2) * lit(weights(2)) +
      element_at(st, 3) * lit(weights(3)) +
      stopHits.cast("long") * lit(weights(4)) +
      length(text).cast("long") * lit(weights(5))
  }

  /** Default PII redaction patterns, applied in order (email first: an
    * address's digits must not be half-eaten by the phone pattern).
    * Conservative RE2-compatible syntax — the same pattern strings replay
    * in engines whose regex is RE2 (DuckDB, Go) as well as Java's. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}" -> "<PHONE>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>")

  /** PII scrubbing: every pattern occurrence replaced with its tag —
    * chained `regexp_replace` (codegen'd, shuffle-free). A training-data
    * pipeline runs this gate over every document; anything fancier
    * (NER-based) plugs in the same per-row shape. */
  def redactPii(
      text: Column, patterns: Seq[(String, String)] = PiiPatterns): Column =
    patterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Per-document distinctive terms: top `k` tokens ranked by
    * (term frequency DESC, document frequency ASC, token ASC) — the
    * TF-IDF ordering realized with INTEGER keys only, so the ranking is
    * exact and engine-replayable (a float tf·idf score depends on each
    * engine's `ln` rounding; the lexicographic (tf, df) rank is the same
    * order for any monotone idf).
    *
    * Plan: one shuffle for per-(doc, token) counts (map-side combine),
    * one shuffle for document frequencies (vocabulary-sized — joins back
    * on the token key), one window per document. Output
    * (id, token, tf, df, rank), rank 1..k. */
  def topTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token")
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    // merge hints: the document-frequency table is VOCABULARY-sized — a
    // heavy-tail token set (typos, numbers, ids) grows with the corpus
    // and must never be a forced broadcast side; both sides are already
    // token-keyed, so the join reuses the tf aggregation's shuffle
    tf.hint("merge").join(dfreq.hint("merge"), "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rank"))
  }

  /** C4-style rule-based segment cleanup — the per-document counterpart of
    * [[boilerplateLineDedup]] (which needs cross-document frequencies):
    * drop segments that are too short, contain a blocklisted phrase, or
    * (optionally) lack terminal punctuation, then reassemble survivors in
    * order and drop documents left with fewer than `minKeptLines`
    * segments. Every rule is a per-row predicate, so the whole cleanup is
    * one shuffle-free filter pass before the per-document reassembly
    * aggregation — at 100 TB the filter runs inside the scan and only
    * survivors reach the single shuffle.
    *
    * Rules replay exactly in SQL: word count via the same
    * whitespace-split formula as the quality features, blocklist via
    * lowercase substring containment, terminal punctuation via a
    * one-character-class regex anchored at end. Reassembly mirrors
    * boilerplateLineDedup (sort_array over (pos, line) structs, field
    * extracted via GetArrayStructFields — no interpreted lambda). */
  def ruleClean(df: DataFrame, idCol: String, linesCol: Column,
      minWords: Int, banned: Seq[String],
      requireTerminal: Boolean = false, minKeptLines: Int = 1,
      sep: String = " "): DataFrame = {
    val lines = df
      .select(col(idCol).as("id"), posexplode(linesCol).as(Seq("pos", "line")))
    val lw = lower(col("line"))
    val bannedHit = banned.map(b => lw.contains(lit(b.toLowerCase)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val words = size(split(trim(col("line")), "\\s+"))
    val keepLine = words >= minWords && !bannedHit &&
      (if (requireTerminal) col("line").rlike("[.!?\"]$") else lit(true))
    lines.filter(keepLine)
      .groupBy("id")
      .agg(
        array_join(
          sort_array(collect_list(struct(col("pos"), col("line"))))
            .getField("line"), sep).as("clean_text"),
        count(lit(1)).as("kept_lines"))
      .filter(col("kept_lines") >= minKeptLines)
  }

  /** Cross-document n-gram novelty: per document, how much of its content
    * appears NOWHERE else in the corpus. The cheap integer-exact cousin of
    * near-dup scoring — rank documents by redundancy before paying for
    * MinHash verification, or gate highly-derivative pages out of a crawl.
    *
    * novelty = |distinct n-grams unique to this doc| / |distinct n-grams|,
    * computed in one explode + one two-phase document-frequency
    * aggregation + one shuffle join back. Both join sides are hinted off
    * the broadcast path: the exploded side is corpus-sized and the df
    * table is vocabulary-sized — each far beyond any static estimate
    * (the topTerms lesson). Counts are integers; the single division is
    * the only float op, so the score replays exactly.
    *
    * The shingle kernel emits DISTINCT n-grams per document, so the
    * per-shingle row count IS the document frequency (no countDistinct
    * shuffle needed). NULL text ⇒ excluded (no shingles). */
  def ngramNovelty(
      df: DataFrame, idCol: String, textCol: Column, n: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.word_shingles(textCol, n)).as("sh"))
    val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.hint("merge").join(docFreq.hint("merge"), Seq("sh"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("unique_shingles"))
      .withColumn("novelty",
        col("unique_shingles") / col("n_shingles").cast("double"))
  }

  /** Cross-document boilerplate line removal (the CCNet/C4 cleanup step):
    * drop every line that occurs verbatim in more than `maxDocFreq`
    * DISTINCT documents (navigation bars, cookie banners, license
    * headers), keep the rest in original order. `linesCol` is the
    * segmentation — `split(col(textCol), "\n")` when the corpus has real
    * lines, [[graft.functions.TextFunctions.word_chunks]] as the
    * pseudo-paragraph stand-in when it doesn't.
    *
    * Plan at scale — ADAPTIVE on the dictionary's real size (the
    * Content.visible lesson: a structurally-"small" set can still blow
    * past driver memory in the tail, so the size is probed with a hard
    * LIMIT, never assumed):
    *
    *   - the boilerplate set is ONE two-phase count-distinct aggregate,
    *     filtered to lines above the frequency bar, collected through
    *     `limit(MaxBroadcastLines + 1)` — the limit bounds driver memory
    *     no matter how pathological the tail;
    *   - if it FITS, removal runs in-row: the set ships as a Broadcast
    *     into the codegen'd RemoveLines kernel and the second corpus
    *     pass is a pure projection — no line explode, no anti-join, no
    *     per-document reassembly shuffle;
    *   - if it does NOT fit, the anti-join path runs: lines explode to
    *     (id, pos, line), an UNHINTED anti-join lets AQE pick
    *     broadcast-vs-shuffle, and reassembly is per-document
    *     (sort_array over the doc's own kept lines — never a global
    *     sort). Both paths keep the same lines in the same order.
    *
    * Output: (id, clean_text, kept_lines); documents whose every line was
    * boilerplate drop out (callers left-join and coalesce to empty). */
  def boilerplateLineDedup(df: DataFrame, idCol: String, linesCol: Column,
      maxDocFreq: Int, sep: String = " "): DataFrame =
    boilerplateLineDedupBounded(df, idCol, linesCol, maxDocFreq, sep,
      MaxBroadcastLines)

  /** [[boilerplateLineDedup]] with the broadcast bound injectable — the
    * spec entry point that drives the anti-join fallback without building
    * a 2^20-line dictionary. */
  private[pipeline] def boilerplateLineDedupBounded(
      df: DataFrame, idCol: String, linesCol: Column,
      maxDocFreq: Int, sep: String, maxBroadcast: Int): DataFrame = {
    val lines = df
      .select(col(idCol).as("id"), posexplode(linesCol).as(Seq("pos", "line")))
    // persisted BEFORE the probe: the probe's collect is the aggregate's
    // only full run — the anti-join fallback reuses the cache instead of
    // re-exploding the corpus (the probe would otherwise double the most
    // expensive stage exactly in the pathological-dictionary case)
    val boiler = lines.groupBy("line")
      .agg(countDistinct("id").as("ndocs"))
      .filter(col("ndocs") > maxDocFreq)
      .select("line")
      .persist()
    val probed = boiler.limit(maxBroadcast + 1).collect()
    if (probed.length <= maxBroadcast) {
      val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      probed.foreach(r => set.add(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
      boiler.unpersist()
      val bc = df.sparkSession.sparkContext.broadcast(set)
      df.select(col(idCol).as("id"),
          graft.functions.TextFunctions.remove_lines(linesCol, bc, sep)
            .as("__r"))
        .select(col("id"), col("__r.clean_text").as("clean_text"),
          col("__r.kept_lines").as("kept_lines"))
        .filter(col("kept_lines") > 0)
    } else {
      // fallback: materialize the RESULT while the dictionary cache is
      // live, then release the dictionary here — the caller never holds
      // `boiler`, so deferring its unpersist would leak it (r8 review).
      // The returned frame is persisted; the CALLER owns that cache
      // (Bpe.learn convention; unpersist after the result is consumed)
      val kept = lines.join(boiler, Seq("line"), "left_anti")
      val out = kept.groupBy("id")
        .agg(
          array_join(
            sort_array(collect_list(struct(col("pos"), col("line"))))
              .getField("line"), sep).as("clean_text"),
          count(lit(1)).as("kept_lines"))
        .persist()
      out.count()
      boiler.unpersist()
      out
    }
  }

  /** Boilerplate dictionaries up to this many lines run the in-row
    * broadcast-kernel removal; larger ones fall back to the anti-join.
    * ~1M short lines ≈ low hundreds of MB broadcast — the conventional
    * broadcast ceiling. */
  val MaxBroadcastLines: Int = 1 << 20

  /** Markup stripping — the extract-text-from-HTML step that precedes
    * every other text operator when the corpus arrives as crawled pages.
    * Rule pipeline (all codegen'd string builtins, applied in one
    * projection inside the scan — no UDF, no per-row parser allocation):
    * drop script/style blocks (dotall non-greedy; two separate patterns —
    * RE2 has no backreferences and the oracle replays in RE2), strip
    * remaining tags, decode the six common entities (&amp; LAST so
    * double-encoded text can't re-form entities), collapse whitespace.
    * Every pattern is in the Java∩RE2 common subset, so the result
    * replays byte-for-byte in the oracle (same precedent as redactPii).
    * A real browser-grade extractor needs an HTML5 parser — this is the
    * deterministic, distributable 95% that handles machine-generated
    * pages; rows are independent, so the operator scales as a pure map. */
  def stripMarkup(text: Column): Column = {
    // (?i): crawled HTML commonly uses <SCRIPT>/<Style>; without it their
    // bodies would leak into the text. Whitespace collapses via an
    // EXPLICIT class, not \s — Java's \s includes \x0B, RE2's does not,
    // and the oracle replay must be byte-exact on any input.
    val noScript = regexp_replace(text, "(?si)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?si)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f\\x0B]+", " "))
  }

  /** Collocation discovery: the top-k bigrams by LIFT — the phrase-mining
    * step ("new york", "machine learning") that feeds tokenizer merges and
    * phrase-aware dedup. lift(w1,w2) = p(w1 w2) / (p(w1)·p(w2)) =
    * c_xy·N_uni² / (c_x·c_y·N_bi): the same ORDER as PMI = log(lift)
    * (log is monotone) without the transcendental — every factor is an
    * exact integer and the one division is a single correctly-rounded
    * IEEE op, so ranks and scores replay exactly in any engine. The
    * `minCount` floor keeps PMI's rare-pair degeneracy out of the top-k.
    *
    * Plan at scale: bigrams come from the codegen'd
    * [[graft.functions.WordPairs]] kernel (multiplicity kept — unlike the
    * dedup shingle kernel) in ONE pass over the corpus; unigrams from one
    * explode. Both collapse through two-phase counts (map-side combine
    * absorbs Zipf skew), so the joins below run on VOCABULARY-sized
    * tables: bigram counts join unigram counts on each side — merge-hinted,
    * because both sides are post-explode aggregates whose static size
    * estimates undercount ~1000× (see Dedup.bandedSignatures) and a
    * corpus-vocabulary broadcast would OOM the driver at 100 TB. Top-k via
    * TakeOrdered (no full sort). Each count is cast to double BEFORE the
    * multiplies (N_uni² alone overflows Long past a ~3·10⁹-token corpus):
    * both sides of the division are left-associated products of exactly-
    * represented integers (counts < 2⁵³), so every engine doing the same
    * IEEE ops reproduces scores and ranks bit-identically. */
  def collocations(
      df: DataFrame, textCol: Column, minCount: Long, k: Int): DataFrame = {
    // both count tables are re-read (uni: two joins + the total; bi: the
    // minCount filter + the total) — persist the vocabulary-sized
    // aggregates so the corpus explode+count runs ONCE per table (same
    // rationale as Stats.corpusOverlap's persist; exchange reuse is not
    // guaranteed across differently-projected branches)
    val uni = df.select(explode(split(textCol, " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist()
    val bi = df.select(
        explode(graft.functions.TextFunctions.word_pairs(textCol)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cxy"))
      .persist()
    val nUni = uni.agg(sum("c").as("nu"))
    val nBi = bi.agg(sum("cxy").as("nb"))
    bi.filter(col("cxy") >= minCount)
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .withColumn("w2", substring_index(col("b"), " ", -1))
      .hint("merge")
      .join(uni.hint("merge").select(col("w").as("w1"), col("c").as("cx")), "w1")
      .join(uni.hint("merge").select(col("w").as("w2"), col("c").as("cy")), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("cxy"), col("cx"), col("cy"),
        ((col("cxy").cast("double") * col("nu").cast("double") *
            col("nu").cast("double")) /
          (col("cx").cast("double") * col("cy").cast("double") *
            col("nb").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Bigram SUCCESSOR table (the 1-gram-context LM view): for each token
    * with at least `minTotal` successor OCCURRENCES (total bigram count,
    * not distinct successors — the gate keeps the high-signal core, not
    * the hapax tail), its most frequent next token (ties → the
    * lexicographically greatest successor, the struct-max order).
    *
    * Same adjacent-pair tokenization as [[collocations]] (the codegen'd
    * [[graft.functions.WordPairs]] kernel, multiplicity kept) — change
    * the pair rule THERE and this table follows. One corpus pass,
    * two-phase counts; the argmax rides the aggregate as
    * max(struct(cnt, w2)), so no window shuffle.
    *
    * Output: (w1, next_w, next_cnt, total). */
  def bigramSuccessors(
      df: DataFrame, textCol: Column, minTotal: Long): DataFrame =
    df.select(explode(
        graft.functions.TextFunctions.word_pairs(textCol)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
      .select(substring_index(col("b"), " ", 1).as("w1"),
        substring_index(col("b"), " ", -1).as("w2"), col("cnt"))
      .groupBy("w1")
      .agg(max(struct(col("cnt").as("c"), col("w2").as("w"))).as("m"),
        sum("cnt").as("total"))
      .filter(col("total") >= minTotal)
      .select(col("w1"), col("m.w").as("next_w"),
        col("m.c").as("next_cnt"), col("total"))

  /** Token-window chunking with overlap — the RAG/context-window prep
    * stage: split each document into chunks of `chunkTokens` whitespace
    * tokens, starting a new chunk every `stride` tokens (stride <
    * chunkTokens ⇒ overlapping windows). Output one row per chunk:
    * (id, chunk_idx, n_tokens, chunk_text), chunk_idx dense from 0 in
    * document order; the tail chunk is short, never padded.
    *
    * Pure narrow transform — split / sequence / slice / array_join are
    * all codegen'd builtins, zero shuffles, so at 100 TB it runs entirely
    * inside the scan stage and parallelism is the file-split count.
    * NULL or empty text ⇒ no chunks (the explode of an empty start list
    * drops the row). Replays exactly in SQL: list slicing over the same
    * single-space split. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: Column,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkByTokens: chunkTokens/stride must be positive, got $chunkTokens/$stride")
    val toks = split(textCol, " ")
    val n = size(toks)
    val starts = when(textCol.isNotNull && n > 0,
        sequence(lit(0), n - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("id"), toks.as("__toks"), n.as("__n"),
        explode(starts).as("start"))
      .select(col("id"), (col("start") / stride).cast("int").as("chunk_idx"),
        least(lit(chunkTokens), col("__n") - col("start")).as("n_tokens"),
        array_join(slice(col("__toks"), col("start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Corpus-frequency LM quality proxy (the CCNet idea with the LM
    * replaced by an exact-replayable statistic): score each document by
    * the mean LOG2-BUCKET of its tokens' corpus frequencies — documents
    * full of rare/garbled tokens score low, templated boilerplate scores
    * high; rank-filter the tails before paying for dedup. The bucket is
    * floor(log2(count)) computed EXACTLY as binary-digit-count − 1
    * (length(conv(c,10,2)) — string ops, no float log), so unlike a real
    * LM perplexity the score replays bit-identically in any engine;
    * a production pipeline would swap the count table for a KenLM-style
    * model and keep the same join/aggregate shape.
    *
    * Shapes at 100 TB: one explode → two-phase token counts (map-side
    * combine absorbs Zipf skew), then the exploded corpus re-joins the
    * vocabulary-sized count table on the token key — merge-hinted on
    * both sides (the topTerms lesson: both are beyond any static
    * broadcast estimate) — and collapses back to one row per document.
    * mean = sum/count is the single float op (division of exact ints).
    *
    * Output: (id, n_tokens, sum_bucket, mean_freq_bucket). */
  def lmBucketScore(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(split(textCol, " ")).as("token"))
      .filter(col("token") =!= "")
    val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .select(col("token"), (length(conv(col("c"), 10, 2)) - 1).as("bucket"))
    toks.hint("merge").join(counts.hint("merge"), "token")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bucket").cast("long")).as("sum_bucket"))
      .select(col("id"), col("n_tokens"), col("sum_bucket"),
        (col("sum_bucket").cast("double") / col("n_tokens").cast("double"))
          .as("mean_freq_bucket"))
  }
}
