package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: tokenization,
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is built from codegen'd builtins (split / higher-order
  * array functions / regexp_count / xxhash64) — no UDFs — so the whole
  * stage stays inside WholeStageCodegen and scales linearly with
  * corpus size (pure map-side; zero shuffles).
  */
object TextOps {

  /** Whitespace tokens, lowercased, empties dropped. */
  /** Adjacent-token pairs from a MATERIALIZED token-array column,
    * combined by `f` — the one sanctioned construction for bigrams.
    * zip_with over two slices, NOT transform + element_at(toks, i):
    * sub-expressions inside a higher-order-function lambda re-evaluate
    * per ELEMENT (and the optimizer inlines generator-inferred filters
    * the same way), so an element_at over the un-materialized token
    * split re-runs the whole-document regex split per position —
    * O(doc²), measured at 2.6×–9× whole-query wall time before the
    * three call sites were converged on this helper.
    */
  def adjacentPairs(toks: Column, f: (Column, Column) => Column): Column = {
    import org.apache.spark.sql.functions.size
    when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        f))
  }

  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "de" -> Seq("der", "und", "das"),
    "es" -> Seq("el", "y", "que"),
    "fr" -> Seq("le", "et", "la"))

  /** C7: marker-word language ID — per-language stopword hit counts,
    * argmax with fixed precedence (en > de > es > fr), 'und'
    * (undetermined) when no marker hits.
    */
  def langId(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = documents.select(
      col("doc_id") +: langMarkers.map { case (lang, ms) =>
        size(filter(toks, t => t.isin(ms.map(lit): _*))).as(s"score_$lang")
      }: _*)
    val best = langMarkers.map(m => col(s"score_${m._1}"))
      .reduce((a, b) => greatest(a, b))
    scored.select(
      col("doc_id"),
      when(best === 0, lit("und"))
        .when(col("score_en") === best, lit("en"))
        .when(col("score_de") === best, lit("de"))
        .when(col("score_es") === best, lit("es"))
        .otherwise(lit("fr")).as("pred_lang"),
      best.cast("long").as("best_score"))
  }

  private val stopwords = Seq("the", "a", "and", "of", "to")

  /** C8: quality scoring — length, token stats, punctuation ratio,
    * stopword ratio, and a keep/drop flag (the standard pre-training
    * corpus filter shape).
    */
  def quality(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    documents.select(col("doc_id"), col("text"))
      .withColumn("n_chars_calc", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_stopwords",
        size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("long"))
      .withColumn("punct_chars",
        length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", "")))
      .select(
        col("doc_id"), col("n_chars_calc"), col("n_tokens"),
        round(col("punct_chars").cast("double") / col("n_chars_calc"), 4)
          .as("punct_ratio"),
        round(col("n_stopwords").cast("double") / col("n_tokens"), 4)
          .as("stopword_ratio"),
        (col("n_tokens") >= 5 && col("n_tokens") <= 500
          && col("n_stopwords").cast("double") / col("n_tokens") <= 0.5)
          .as("keep"))
  }

  /** C9: token counting — whitespace tokens and a BPE-ish regex count
    * (letter runs / digit runs / single other non-space chars), the
    * usual cheap proxy for tokenizer cost.
    */
  def tokenCount(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
        .cast("long").as("bpe_ish_tokens"))

  /** C19: Gopher-style repetition filter — the standard quality gate
    * that kills boilerplate and degenerate (looping) generations:
    * duplicate-token ratio and most-frequent-bigram share per doc
    * (Rae et al. 2021 §A1.3 use the same family of repetition
    * signals). Counts stay in the integer domain and the keep rule is
    * integer cross-multiplication — `(n−nd)·2 ≤ n ⟺ dup ratio ≤ 0.5`
    * — so the gate is exactly reproducible across engines with zero
    * float rounding risk.
    *
    * Scale shape: one explode + groupBy(doc_id, bigram) — keys are
    * (doc × distinct-bigram), maximally high-cardinality, so the
    * shuffle is perfectly spreadable and map-side combine collapses
    * repeated bigrams before the wire. No windows, no skew pivot.
    */
  def repetition(documents: DataFrame): DataFrame = {
    val base = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        // adjacentPairs rationale: the optimizer infers a size>0
        // filter from the downstream explode and pushes it below this
        // projection, inlining the bigram expression — the helper's
        // zip_with form keeps every inlined copy O(doc) (a
        // transform+element_at form here measured 11.9 s → 0.4 s)
        adjacentPairs(col("toks"), (a, b) => concat_ws(" ", a, b))
          .otherwise(array().cast("array<string>")).as("bigrams"))
    val bigramStats = base
      .select(col("doc_id"), explode(col("bigrams")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_bigram_n"), sum("c").as("n_bigrams"))
    base.select("doc_id", "n_tokens", "n_distinct")
      .join(bigramStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        // dup-token ratio ≤ 0.5 AND top-bigram share ≤ 0.1, both
        // integer-exact; the bigram test is vacuously true for docs
        // with < 2 tokens (0 ≤ 0)
        ((col("n_tokens") - col("n_distinct")) * 2 <= col("n_tokens") &&
          coalesce(col("top_bigram_n"), lit(0L)) * 10 <=
            coalesce(col("n_bigrams"), lit(0L))).as("keep"))
  }

  /** Deterministic slop augmentation for C61's query entry: docs with
    * doc_id ≡ 0 (mod 7) get a tail of hash/ellipsis symbol words so
    * the symbol-ratio rule fires on real variance (the synthetic
    * corpus carries no slop). Both engines build the same string.
    */
  def withSyntheticSlop(documents: DataFrame): DataFrame =
    documents.withColumn("text",
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" ### ### ### ... ... ...")))
        .otherwise(col("text")))

  /** C61: Gopher-style rule gates (Rae et al. 2021 §A1.1) — the
    * full document-level quality screen next to C8's ratios and C19's
    * repetition signals: word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio (hash marks / ellipses), alphabetic-word
    * fraction, and a minimum count of DISTINCT stopwords (the "real
    * prose" tell). Every rule is integer cross-multiplication on
    * exact counts — `3n ≤ chars ≤ 10n`, `10·symbols ≤ n`,
    * `5·alpha ≥ 4n` — so the keep flag is bit-reproducible across
    * engines with zero float risk.
    *
    * Scale shape: a PURE MAP — every signal folds inside per-row
    * array expressions (no explode, no shuffle, no UDF); the gate
    * runs at scan speed on any corpus size.
    */
  def gopherQuality(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stopHits = stopwords.map(s =>
      when(array_contains(toks, s), 1L).otherwise(0L)).reduce(_ + _)
    documents.select(
      col("doc_id"),
      size(toks).cast("long").as("n_words"),
      aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).as("word_chars"),
      size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
        .as("alpha_words"),
      regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long")
        .as("n_symbols"),
      stopHits.as("n_stop"))
      .withColumn("keep",
        col("n_words") >= 30 && col("n_words") <= 100000 &&
          lit(3L) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10L) * col("n_words") &&
          lit(10L) * col("n_symbols") <= col("n_words") &&
          lit(5L) * col("alpha_words") >= lit(4L) * col("n_words") &&
          col("n_stop") >= 2L)
  }

  /** C90 (r13): Naive-Bayes quality classifier — the learned-scorer
    * slot in a curation pipeline (CCNet/fastText-style: a cheap
    * linear token model trained on weak labels, applied corpus-wide;
    * Wenzek et al. 2019 §4.2, Joulin et al. 2016): DISTILL the C61
    * rule gate into a multinomial NB model. Labels = gopherQuality's
    * keep flag on the same corpus; training = per-token occurrence
    * counts by class with add-1 smoothing; scoring = class prior +
    * Σ per-token log-odds over the doc's token OCCURRENCES. A rule
    * gate reads each doc in isolation — the distilled model transfers
    * the gate's judgment onto token STATISTICS, which is what lets a
    * production pipeline score new text cheaply (one vocab join, no
    * rules) and is the standard weak-supervision bootstrap for a
    * quality classifier when no human labels exist.
    *
    * Determinism (the C69/C30/A37 protocol): smoothed ratios are
    * exact-integer divisions in double, per-token log-odds quantize
    * as floor(·10¹²) DECIMAL(38,0) integers (an engine ulp in ln
    * flips floor only on exact 10⁻¹² boundaries, which ln output
    * never lands on), per-doc sums are exact order-independent
    * decimal adds, publish = round(sum/10¹², 4); keep_pred compares
    * the ROUNDED score so both engines take the same branch.
    *
    * Scale shape: one explode + two token-keyed partial-agg groupBys
    * (train), one vocab-keyed equi-join + per-doc partial agg
    * (score); totals/prior are 1-row broadcasts. No driver state, no
    * rules in the scoring path — linear at any corpus size, and the
    * odds table is exactly what a deployment would persist as the
    * frozen model.
    *
    * Honest scope: token identity can encode token-distribution
    * judgments (boilerplate/symbol slop — separable recall measured
    * 1.00 at both SFs), NOT the gate's document-LENGTH and
    * stopword-count rules (overall agreement 0.65-0.67 on the gated
    * corpus, dominated by natural short-doc negatives). That is the
    * textbook NB limit, and exactly why production pipelines run the
    * learned scorer BESIDE rule gates, not instead of them (C63's
    * composite is that composition point).
    */
  def nbQuality(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // r14 (guide §1.2/§5): the labels frame feeds THREE consumers
    // (token-class counts, the doc prior, the final join) and the
    // token stream TWO (train counts, scoring sums) — unshared, the
    // corpus paid ~5 tokenize+regex passes per run (the gopher gate's
    // rlike/regexp_count scan is the expensive subtree). Persist the
    // |docs|-row label frame once, and collapse the occurrence stream
    // to a persisted (doc, tok, c) term table shared by train and
    // score: occurrence sums become c-weighted sums over distinct
    // (doc, tok) rows — exact integer/decimal arithmetic, identical
    // result, corpus passes drop 5 → 2 at any scale.
    val labels = graft.CacheRegistry.persist(
      gopherQuality(documents).select(col("doc_id"), col("keep")))
    val tc = graft.CacheRegistry.persist(documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c")))
    val tokCounts = tc.join(labels, "doc_id")
      .groupBy("tok")
      .agg(sum(when(col("keep"), col("c")).otherwise(0L)).as("n_pos"),
        sum(when(!col("keep"), col("c")).otherwise(0L)).as("n_neg"))
    val totals = tokCounts.agg(sum("n_pos").as("tot_pos"),
      sum("n_neg").as("tot_neg"), count(lit(1)).as("vocab"))
    val odds = tokCounts.crossJoin(broadcast(totals))
      .select(col("tok"),
        floor((log((col("n_pos") + lit(1L)).cast("double")
            / (col("tot_pos") + col("vocab")).cast("double"))
          - log((col("n_neg") + lit(1L)).cast("double")
            / (col("tot_neg") + col("vocab")).cast("double")))
          * lit(1.0e12)).cast(DecimalType(38, 0)).as("q"))
    val prior = labels.agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("d_pos"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("d_neg"))
      .select(floor(log((col("d_pos") + lit(1L)).cast("double")
          / (col("d_neg") + lit(1L)).cast("double")) * lit(1.0e12))
        .cast(DecimalType(38, 0)).as("qp"))
    val scored = tc.join(odds, "tok")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_toks"),
        sum(col("c").cast(DecimalType(20, 0)) * col("q")).as("qsum"))
    // every doc appears: a zero-token doc scores the prior alone
    val score = round((coalesce(col("qsum"),
        lit(BigDecimal(0)).cast(DecimalType(38, 0)))
      + col("qp")).cast("double") / lit(1.0e12), 4)
    labels.join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("keep").as("label"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        score.as("score"),
        (score > lit(0.0)).as("keep_pred"))
  }

  /** C63: composite quality report — the C8 ∧ C19 ∧ C61 decision a
    * curation pipeline actually applies, fused with a deterministic
    * FIRST-FAILING-REASON label (fixed precedence quality →
    * repetition → gopher) so the drop ledger is attributable: "how
    * many docs did each gate kill" falls out of one groupBy on
    * drop_reason. Pure composition of the three oracle-gated
    * operators — the per-rule booleans are published alongside so
    * the composite can never silently drift from its parts.
    */
  def qualityReport(documents: DataFrame): DataFrame = {
    val q = quality(documents)
      .select(col("doc_id"), col("keep").as("keep_quality"))
    val r = repetition(documents)
      .select(col("doc_id"), col("keep").as("keep_repetition"))
    val g = gopherQuality(documents)
      .select(col("doc_id"), col("keep").as("keep_gopher"))
    q.join(r, "doc_id").join(g, "doc_id")
      .select(col("doc_id"), col("keep_quality"),
        col("keep_repetition"), col("keep_gopher"),
        (col("keep_quality") && col("keep_repetition")
          && col("keep_gopher")).as("keep"),
        when(!col("keep_quality"), "quality")
          .when(!col("keep_repetition"), "repetition")
          .when(!col("keep_gopher"), "gopher")
          .otherwise("pass").as("drop_reason"))
  }

  /** C20: temperature-flattened multi-source sampling — the
    * multilingual-training resampling step (alpha-sampling, α = 0.5):
    * big sources are down-sampled toward the small ones so no single
    * domain dominates the mix. Per-source keep fraction
    * `f_s = sqrt(n_min / n_s)` (n_min = smallest source), realized by
    * the same overflow-safe Knuth hash threshold as [[sampleFraction]]
    * — deterministic, coordination-free, map-side after one tiny agg.
    *
    * Cross-engine exactness: f_s uses only correctly-rounded IEEE ops
    * (one divide, one sqrt, one multiply, floor) on integer inputs, so
    * Spark and the oracle compute bit-identical thresholds — no
    * cross-row double sums anywhere.
    *
    * Scale shape: the per-source count table has one row per source
    * (bounded, tiny at any corpus size) — AQE broadcasts the join
    * back; the filter itself is pure map-side. No windows over
    * unpartitioned data.
    */
  def sampleTemperature(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = documents.groupBy("source").agg(count(lit(1)).as("n_source"))
    val fracs = counts
      .crossJoin(counts.agg(min("n_source").as("n_min")))
      .select(col("source"), col("n_source"),
        floor(sqrt(col("n_min").cast("double") / col("n_source").cast("double"))
          * lit(4294967296.0)).cast("long").as("threshold"))
    val priority = pmod(
      col("doc_id").cast(DecimalType(20, 0)) *
        lit(2654435761L).cast(DecimalType(10, 0)),
      lit(4294967296L).cast(DecimalType(11, 0))).cast("long")
    documents.join(fracs, "source")
      .filter(priority < col("threshold"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_source"), col("threshold"))
  }

  /** C23: corpus vocabulary head — collection frequency (total
    * occurrences) and document frequency per token, top-k slice. The
    * corpus-statistics pass behind tokenizer training, stopword
    * derivation, and Zipf-curve QA.
    *
    * Scale shape: one explode + two partial-agg rollups (token-keyed —
    * maximally spreadable), then `orderBy.limit(k)` which plans as
    * TakeOrderedAndProject: each task keeps a k-row heap, the driver
    * merges k·tasks rows — NO global sort of the vocabulary (a
    * 100 M-token vocab never passes through one partition). The final
    * rank is a window over the already-limited k rows — bounded by
    * construction.
    */
  def vocabTopK(documents: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val head = tf.groupBy("tok")
      .agg(sum("tf").as("cf"), count(lit(1)).as("df"))
      .orderBy(col("cf").desc, col("tok"))
      .limit(k)
    head.withColumn("rank",
      row_number().over(Window.orderBy(col("cf").desc, col("tok"))).cast("long"))
      .select("rank", "tok", "cf", "df")
  }

  /** C38: per-document out-of-vocabulary rate against the corpus'
    * own top-k vocabulary head (C23) — the tokenizer-coverage signal
    * that decides whether a corpus slice needs vocab extension or a
    * different tokenizer before training; also a cheap quality proxy
    * (high OOV ≈ boilerplate, noise, or an unexpected language).
    *
    * Counted over token OCCURRENCES (not distinct types): the rate
    * answers "what fraction of the training stream falls outside the
    * vocab", which is the quantity that prices <unk> exposure.
    *
    * Scale shape: the vocab head is k rows — broadcast membership
    * join, so the exploded token stream NEVER shuffles for the
    * lookup; the only per-row shuffle is the final groupBy(doc_id).
    * The head itself reuses C23's aggregation (token-keyed partial
    * aggs + TakeOrderedAndProject — no global sort).
    */
  def oovRate(documents: DataFrame, k: Int = 100): DataFrame = {
    val vocab = vocabTopK(documents, k)
      .select(col("tok")).withColumn("in_vocab", lit(1L))
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (count(lit(1)) - count(col("in_vocab"))).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** C24: per-document keyword extraction — top-k terms ranked by the
    * TF-IDF ordering (term frequency high, document frequency low)
    * realized as a pure INTEGER sort key `(tf desc, df asc, tok)`:
    * the induced ranking is the one tf·idf(monotone idf) gives within
    * a document, with none of float idf's cross-engine log()
    * nondeterminism (libm ln is not correctly-rounded — the one IEEE
    * loophole the exact-aggregation protocol can't paper over).
    *
    * Scale shape: explode → (doc, term) counts; df joins back on the
    * token key (vocab-sized — AQE broadcasts when it fits); the top-k
    * window partitions on doc_id, the highest-cardinality key there
    * is. WindowGroupLimit prunes to k rows per doc before the sort
    * spills anywhere.
    */
  def keywords(documents: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("tok"))
    tf.join(df_, "tok")
      .withColumn("kw_rank", row_number().over(w).cast("long"))
      .filter(col("kw_rank") <= k)
      .select("doc_id", "kw_rank", "tok", "tf", "df")
  }

  /** C53: BM25 retrieval — the ranking function behind corpus search,
    * contamination sweeps, and retrieval-augmented data curation
    * (query-by-document here: the terms of each probe doc, doc_id <
    * nQueries, score every other doc; Robertson/Spärck Jones idf in
    * the always-positive Lucene form ln(1 + (N−df+0.5)/(df+0.5)),
    * tf saturation k1 = 1.2, length normalization b = 0.75).
    *
    * Determinism: tf/df/dl/N are integers, avgdl is one exact-decimal
    * quotient; each per-term score is a fixed double chain whose only
    * non-exactly-rounded op is `ln` — terms are quantized to
    * DECIMAL(38,18) before the order-independent per-(query, doc) sum
    * (the C32 protocol) and the published score is round-4; the rank
    * window orders by the ROUNDED score with doc_id as total-order
    * tiebreak, so ranking is ulp-proof.
    *
    * Scale shape: the classic inverted-index probe — query terms
    * broadcast onto the (doc, term, tf) postings (candidates = docs
    * sharing ≥1 term, never a cross product); df joins on the
    * vocab-sized token key (AQE broadcasts); the per-(query, doc)
    * reduce is partial-aggregable; top-k via the per-query window
    * (WindowGroupLimit prunes to k before any sort spills — C24's
    * shape). Stopword-class postings are the known skew pivot at
    * corpus scale; production caps df (drop terms in > x% of docs),
    * which also drops their near-zero idf contribution.
    */
  def bm25(documents: DataFrame, nQueries: Int = 5, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      queryPred: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val corpStats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl").cast(DecimalType(20, 6))).cast("double")
        / count(lit(1))).as("avgdl"))
    val dfv = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // queryPred overrides the default probe-set selection (ScaleSmoke
    // uses it to grow the query side with the corpus)
    val qterms = tf.filter(queryPred.getOrElse(col("doc_id") < nQueries))
      .select(col("doc_id").as("q_id"), col("tok"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val term = idf * (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0) - lit(b)
        + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = tf
      .join(broadcast(qterms), "tok")
      .filter(col("doc_id") =!= col("q_id"))
      .join(dfv, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpStats))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"),
        round(sum(term.cast(DecimalType(38, 18))).cast("double"), 4)
          .as("score"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "doc_id", "score", "n_hits")
  }

  /** C59: multi-epoch mix schedule — the data-constrained regime's
    * counterpart to C41's downsampling (Muennighoff et al. 2023:
    * when a source is SMALLER than its token budget you repeat it):
    * per source, epochs = ⌈budget / source tokens⌉ (sources without a
    * budget run once), emitted per doc with its scheduled token
    * contribution. Pure integer arithmetic (ceil as
    * (b + t − 1) DIV t), bit-exact anywhere.
    *
    * Scale shape: one partial-agg groupBy to |sources| rows,
    * broadcast back onto the doc stream (the C41/B28 join-back
    * shape) — the corpus never shuffles.
    */
  def mixSchedule(documents: DataFrame,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0))
    val docToks = documents.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val srcTot = docToks.groupBy(col("source").as("src"))
      .agg(sum("n_tokens").as("src_tokens"))
    val bs = budgets.toSeq
    val budget = bs.tail
      .foldLeft(when(col("source") === bs.head._1, lit(bs.head._2))) {
        case (w, (src, b)) => w.when(col("source") === src, lit(b))
      }.otherwise(lit(null).cast("long"))
    docToks
      .join(broadcast(srcTot), col("source") === col("src"))
      .withColumn("budget", budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        when(col("budget").isNull, lit(1L))
          .otherwise(expr("(budget + src_tokens - 1) DIV src_tokens"))
          .as("epochs"))
      .withColumn("sched_tokens", col("n_tokens") * col("epochs"))
  }

  /** C60: packing-efficiency audit over [[packSequences]] — per pack
    * stream: bin count, token mass, FILL RATIO against the bin
    * budget, and the overfull-bin count (greedy contiguous fill lets
    * a boundary-spanning doc overshoot its start bin; training
    * packers need to know how often, because overshoot becomes
    * truncation). Integer counts + one division — exact.
    *
    * Scale shape: two strictly-coarsening partial aggs over C22's
    * output (docs → bins → streams).
    */
  def packEfficiency(documents: DataFrame, budget: Int = 256): DataFrame = {
    val packed = packSequences(documents, budget)
    val bins = packed.groupBy("source", "bin_id")
      .agg(sum("n_tokens").as("bin_tokens"),
        count(lit(1)).as("n_docs"))
    bins.groupBy("source")
      .agg(count(lit(1)).as("n_bins"),
        sum("bin_tokens").as("total_tokens"),
        sum("n_docs").as("n_docs"),
        count(when(col("bin_tokens") > budget, 1)).as("n_overfull"))
      .withColumn("fill_ratio",
        col("total_tokens").cast("double")
          / (col("n_bins").cast("double") * lit(budget.toDouble)))
  }

  /** C22: greedy contiguous sequence packing — the training-prep step
    * that fills fixed token-budget context windows with documents so
    * short docs don't waste padding. Docs are laid out in a
    * deterministic order (doc_id) within each pack stream (source);
    * each doc lands in the bin its running token offset falls into:
    * `bin = cum_tokens_before DIV budget`, plus its position in that
    * bin. Greedy contiguous fill is what production packers use at
    * corpus scale (bin packing is inherently sequential; contiguous
    * fill makes it a prefix sum — expressible as a window, no
    * driver loop, wastage bounded by one doc per bin boundary).
    *
    * Everything stays in the integer domain (integer DIV, counts) —
    * exactly reproducible across engines and partitionings.
    *
    * Scale shape: one running-sum window per pack stream. `source` is
    * the stream key here for oracle determinism; at 100 TB the key
    * generalizes to any (stream, shard) composite — packing is
    * inherently within-shard sequential, so shard granularity, not
    * the algorithm, sets the parallelism.
    */
  def packSequences(documents: DataFrame, budget: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin_id", expr(s"cum_before DIV $budget"))
      .withColumn("pos_in_bin", row_number().over(
        Window.partitionBy("source", "bin_id").orderBy("doc_id")).cast("long"))
      .select("source", "bin_id", "pos_in_bin", "doc_id", "n_tokens")
  }

  /** C13: deterministic per-group sampling — keep the k docs per
    * source with the smallest hash(doc_id). Hash-priority sampling is
    * the reproducible form of uniform sampling: no RNG state, stable
    * across runs/partitionings/engines, and cheap (one window, no
    * shuffle beyond the groupBy key). The standard way to build
    * fixed-size per-source training subsets.
    */
  def samplePerGroup(documents: DataFrame, k: Int = 5): DataFrame = {
    // Knuth multiplicative hash — chosen over xxhash64 because it is
    // exactly reproducible in plain SQL (the correctness oracle).
    // The multiply runs in DECIMAL: doc_id * 2654435761 overflows Long
    // for doc_id ≳ 3.47e9, and Spark 4's ANSI mode turns that into a
    // runtime ARITHMETIC_OVERFLOW at scale. Decimal(20,0)×(10,0) →
    // (31,0): exact, overflow-free for any 64-bit doc_id; the oracle
    // mirrors it via HUGEINT.
    import org.apache.spark.sql.types.DecimalType
    val priority = pmod(
      col("doc_id").cast(DecimalType(20, 0)) *
        lit(2654435761L).cast(DecimalType(10, 0)),
      lit(4294967296L).cast(DecimalType(11, 0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(priority, col("doc_id"))
    documents
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select("source", "sample_rank", "doc_id", "lang")
  }

  /** C75: stratified sampling with NEYMAN allocation (Neyman 1934 —
    * the survey-sampling optimum behind principled eval-set
    * construction): a global budget `k` splits across strata
    * ∝ n_h·S_h (stratum size × stratum std of the cost proxy,
    * n_chars), so heterogeneous strata get proportionally more probes
    * and homogeneous ones fewer — the allocation that minimizes the
    * stratified estimator's variance, where uniform or proportional
    * draws waste budget. Integer seats via Hamilton largest-remainder;
    * within each stratum, C13's Knuth-ring priority picks the rows
    * (rerun-stable, append-stable, engine-replayable).
    *
    * Exactness: S_h² from exact integer co-moments (n·Σx² − (Σx)² in
    * DECIMAL(38,0)); n_h·S_h is one double chain ending in sqrt
    * (IEEE-correctly-rounded in BOTH engines, unlike ln) then
    * floor(·10⁶)-quantized so the cross-strata weight TOTAL is an
    * exact integer sum (a raw double Σ is partition-order-dependent);
    * ideal shares, floors and remainders are then fixed double chains
    * on exact integers — bit-identical; remainder ranking breaks ties
    * by stratum name. A stratum with n_h = 1 or zero variance gets
    * weight 0 — the textbook behavior (its mean is exact already). A
    * budget exceeding some stratum's size fails fast naming the dial
    * rather than silently under-sampling.
    *
    * Scale: one |strata|-row co-moment agg + 1-row broadcast totals +
    * one priority window per stratum (B8's per-group top-k class) —
    * the corpus shuffles once on the stratum key.
    */
  def sampleStratified(documents: DataFrame, k: Int = 100,
      strata: String = "source"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(k >= 1, s"need a positive sample budget, got $k")
    val I = DecimalType(38, 0)
    val g = documents.groupBy(col(strata).as("stratum"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("n_chars").cast(I)).as("s1"),
        sum(col("n_chars").cast(I) * col("n_chars").cast(I)).as("s2"))
    val nD = col("n_h").cast("double")
    val varh = (col("n_h").cast(I) * col("s2") - col("s1") * col("s1"))
      .cast("double") / (nD * (nD - lit(1.0)))
    val wq = when(col("n_h") > 1 && col("n_h").cast(I) * col("s2")
        > col("s1") * col("s1"),
      floor(nD * sqrt(varh) * lit(1.0e6)).cast("long"))
      .otherwise(lit(0L))
    val weighted = g.withColumn("wq", wq)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    // the division is gated on wq_tot > 0 (ANSI mode turns the
    // degenerate 0/0 into a task-level DIVIDE_BY_ZERO before the
    // fail-fast probe below can run; a null ideal flows through the
    // floors/casts harmlessly until the require fires)
    val ideal = when(col("wq_tot") > 0L,
      lit(k.toDouble) * col("wq").cast("double") /
        col("wq_tot").cast("double"))
    // size-thresholded persist: the guard's head(1) and the broadcast
    // join both read the seat plan (one corpus scan each otherwise)
    val seats = graft.CacheRegistry.persistIfLarge(weighted
      .withColumn("wq_tot", sum(col("wq")).over(wAll))
      .withColumn("ideal", ideal)
      .withColumn("base", floor(col("ideal")).cast("long"))
      .withColumn("rem", col("ideal") - col("base").cast("double"))
      .withColumn("leftover", lit(k.toLong) - sum(col("base")).over(wAll))
      .withColumn("rr", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("rem").desc, col("stratum"))))
      .select(col("stratum"),
        (col("base") + when(col("rr") <= col("leftover"), 1L)
          .otherwise(0L)).as("seats"),
        col("n_h"), col("wq"), col("wq_tot")))
    // degenerate-corpus fail-fast: if EVERY stratum has n_h == 1 or
    // zero variance, wq_tot = 0 and ideal = 0/0 = NaN — the floors and
    // casts below would silently produce an empty/undefined sample.
    // Probe the |strata|-row seat plan, mirroring the saturation guard.
    val degenerate = seats.filter(col("wq_tot") === 0L).head(1)
    require(degenerate.isEmpty,
      "Neyman allocation is undefined: no stratum carries weight " +
        "(every stratum has n_h == 1 or zero n_chars variance), so " +
        "ideal shares are 0/0; use sample_per_group or sample_fraction " +
        "for degenerate strata")
    // saturation fail-fast (the C5-style guard): a budget that outruns
    // a stratum must error naming the dial, not silently under-sample.
    // The probe reads the |strata|-row seat table, never the corpus.
    val sat = seats.filter(col("seats") > col("n_h")).head(1)
    require(sat.isEmpty,
      s"Neyman budget $k allocates ${sat.headOption.map(_.get(1)).orNull} " +
        s"seats to stratum '${sat.headOption.map(_.get(0)).orNull}' of " +
        s"only ${sat.headOption.map(_.get(2)).orNull} rows; lower k or " +
        "pre-split the stratum")
    val priority = pmod(
      col("doc_id").cast(DecimalType(20, 0)) *
        lit(2654435761L).cast(DecimalType(10, 0)),
      lit(4294967296L).cast(DecimalType(11, 0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy(priority, col("doc_id"))
    documents.select(col(strata).as("stratum"), col("doc_id"),
        col("n_chars"))
      .join(broadcast(seats.select("stratum", "seats")), "stratum")
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= col("seats"))
      .select(col("stratum"), col("seats"), col("sample_rank"),
        col("doc_id"), col("n_chars"))
  }

  /** C17: text normalization — the cheap canonicalization pass every
    * training corpus gets before dedup/tokenization: lowercase,
    * long digit runs → a <num> placeholder (so "2023" and "2024"
    * variants of the same boilerplate dedup together), whitespace
    * collapsed and trimmed. Pure map over codegen'd regexp builtins;
    * zero shuffles at any scale.
    */
  def normalizeText(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")),
        "[0-9]{4,}", "<num>"), "\\s+", " ")).as("text_norm"),
      regexp_count(col("text"), lit("[0-9]{4,}")).cast("long")
        .as("n_num_runs"))

  /** C25: sliding-window document chunking — cut each document into
    * fixed-size overlapping token windows (size 64, stride 32 by
    * default): the context-window preparation step for embedding /
    * retrieval indexing, and the granularity at which passage-level
    * dedup (C26) operates. Chunk starts step by `stride` while they
    * fall inside the document, so every token is covered and
    * boundary-spanning content appears in two chunks (the standard
    * overlap rationale). Pure generator map — explode + slice, zero
    * shuffles at any corpus size.
    */
  def docChunks(documents: DataFrame, size: Int = 64,
      stride: Int = 32): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size)
    val toks = tokens(col("text"))
    documents
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((org.apache.spark.sql.functions.size(col("toks")) - 1)
            / stride).cast("int"))).as("chunk_id"),
        col("toks"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * stride).cast("long").as("chunk_start"),
        slice(col("toks"), col("chunk_id") * stride + 1, lit(size))
          .as("chunk_toks"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        org.apache.spark.sql.functions.size(col("chunk_toks")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"))
  }

  /** C26: passage-level exact dedup — [[docChunks]] re-keyed by chunk
    * hash: boilerplate shared ACROSS documents (headers, disclaimers,
    * templated passages) that document-level dedup can never see.
    * Keep the first occurrence (min (doc_id, chunk_id), carried in one
    * struct-min aggregate); n_copies tells the removal rate. Same
    * hash-groupBy scale shape as C1 — map-side combine collapses each
    * duplicate group to one row per partition before the shuffle.
    */
  def chunkDedup(documents: DataFrame, size: Int = 64,
      stride: Int = 32): DataFrame =
    docChunks(documents, size, stride)
      .groupBy(md5(col("chunk_text")).as("chunk_hash"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("keep"),
        count(lit(1)).as("n_copies"))
      .select(col("chunk_hash"), col("keep.doc_id").as("keep_doc_id"),
        col("keep.chunk_id").as("keep_chunk_id"), col("n_copies"))

  /** C44: corpus-frequency boilerplate strip — CCNet's
    * paragraph-level dedup (Wenzek et al. 2019 §3.1: hash every
    * paragraph, drop paragraphs seen elsewhere in the corpus) as a
    * REWRITE of each document, not a doc-level filter. The test
    * corpus has no newlines, so the "paragraph" unit is consecutive
    * fixed-length token segments: each doc is cut into back-to-back
    * `segLen`-token segments, a segment appearing in more than
    * `maxDocs` distinct documents is boilerplate, and the doc is
    * reassembled from its surviving segments in original order
    * (empty string if everything was boilerplate — the doc-level
    * filter is the caller's policy, the operator reports
    * n_kept/n_dropped).
    *
    * Scale shape: segmentation is a pure generator map; the
    * frequency count is one (seg-keyed, maximally-spreadable,
    * map-side-combined) groupBy; removal is a LEFT ANTI join on the
    * segment key (the boilerplate side is the small one — AQE
    * broadcasts it when it fits); reassembly is one doc-keyed groupBy
    * whose collect_list is bounded by the doc's own segment count and
    * made deterministic by the array_sort on (seg_no, seg). No
    * windows, no self-joins, nothing O(corpus²).
    */
  def boilerplateStrip(documents: DataFrame, segLen: Int = 5,
      maxDocs: Int = 1): DataFrame = {
    require(segLen > 0 && maxDocs >= 1)
    // sequence(0, -1) would generate a DESCENDING range, so empty
    // docs are fenced explicitly
    val base = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              ceil(size(col("toks")) / lit(segLen.toDouble)).cast("int") - 1),
            i => array_join(slice(col("toks"), i * segLen + 1, lit(segLen)), " ")))
          .as("segs"))
    // r14 (guide §1.2/§5): segRows fed the frequency count AND the
    // anti-join side, and `base` was evaluated a third time for the
    // per-doc segment totals — three tokenize+segment passes over the
    // corpus. Persist the segment rows once and take n_segs from the
    // cached frame (docs with zero segments never enter segRows, so
    // the left join + coalesce(0) below reports them exactly as the
    // old base-side projection did).
    val segRows = graft.CacheRegistry.persist(
      base.select(col("doc_id"),
        posexplode(col("segs")).as(Seq("seg_no", "seg"))))
    val nSegs = segRows.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"))
    val hot = segRows.groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select("seg")
    val rebuilt = segRows.join(hot, Seq("seg"), "left_anti")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("seg_no"), col("seg"))))
        .as("ss"))
      .select(col("doc_id"),
        array_join(transform(col("ss"), s => s.getField("seg")), " ")
          .as("clean_text"),
        size(col("ss")).cast("long").as("n_kept"))
    documents.select(col("doc_id"))
      .join(nSegs, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_segs"), lit(0L))
          - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** C46: deterministic corpus-global k-sample — "give me exactly k
    * docs, reproducibly" (eval subsets, human-review draws, quick
    * iteration corpora). Each doc gets the seeded md5 priority (C40's
    * permutation key); the k smallest win. The plan is
    * TakeOrderedAndProject — each task keeps a k-row heap and the
    * driver merges |tasks|·k rows — NEVER a global sort (the
    * single-partition WindowExec/orderBy trap at 100 TB). Same-seed
    * rerun returns the identical set; appends only ever swap docs in,
    * never reshuffle survivors arbitrarily.
    */
  def sampleTopK(documents: DataFrame, k: Int = 100,
      seed: String = "graft"): DataFrame = {
    require(k > 0)
    documents
      .select(col("doc_id"), col("source"),
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
          .as("prio"))
      .orderBy(col("prio"), col("doc_id"))
      .limit(k)
  }

  /** C47: the corpus DATASHEET — per-(source, lang) volume and shape
    * stats (doc count, token totals, token/char means, extrema): the
    * audit table every training-data pipeline materializes before
    * mixing (and the input C41's target fractions are chosen from).
    * One partial-agg'd groupBy over map-side token counts; means run
    * through [[Exact.avgD]] on integer-valued doubles (exact decimal
    * sums — bit-identical cross-engine). Output is |sources × langs|
    * rows regardless of corpus size.
    */
  def corpusStats(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    documents.select(col("source"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        Exact.avgD(col("n_tokens").cast("double")).as("mean_tokens"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"),
        Exact.avgD(col("n_chars_calc").cast("double")).as("mean_chars"))
  }

  /** C27: deterministic train/val/test split — the dataset-assembly
    * step every training corpus ends with. The same overflow-safe
    * Knuth hash ring as [[sampleFraction]] maps each doc to a uniform
    * priority in [0, 2^32); fixed thresholds carve 80/10/10. Hash
    * splitting (vs random) means the split is stable under reruns,
    * engine changes, and corpus APPENDS — a new doc lands in a split
    * without moving any existing doc. Map-only, zero shuffles.
    */
  def trainSplit(documents: DataFrame, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0)
    documents.select(col("doc_id"), col("source"),
      ringSplitExpr(col("doc_id"), trainFrac, valFrac).as("split"))
  }

  /** The Knuth-ring split election shared by C27 (keyed by doc) and
    * C39 (keyed by near-dup component): multiplicative hash onto the
    * 2^32 ring, thresholds floored identically in both engines.
    */
  private[operators] def ringSplitExpr(key: Column, trainFrac: Double,
      valFrac: Double): Column = {
    import org.apache.spark.sql.types.DecimalType
    val ring = lit(4294967296L)
    val priority = pmod(
      key.cast(DecimalType(20, 0)) *
        lit(2654435761L).cast(DecimalType(10, 0)),
      ring.cast(DecimalType(11, 0))).cast("long")
    when(priority < lit((trainFrac * 4294967296.0).toLong), "train")
      .when(priority < lit(((trainFrac + valFrac) * 4294967296.0).toLong),
        "val")
      .otherwise("test")
  }

  /** C39: LEAKAGE-SAFE split — C27's deterministic hash election keyed
    * by the near-dup COMPONENT ([[DedupOps.dedupGroups]] label), so a
    * document and all its near-duplicates land in the SAME split by
    * construction. A doc-keyed split quietly leaks: two 0.9-Jaccard
    * copies of one page split train/test and the eval measures
    * memorization. Singleton docs (their own component) get exactly
    * C27's assignment.
    *
    * Scale shape: the clustering is C21's audited machinery; the
    * election itself adds one equi-join of the corpus against the
    * (doc_id, component) labels — key-partitioned, no new skew (the
    * labels frame is one row per doc).
    */
  /** `labels`: optional precomputed [[DedupOps.dedupGroups]] output
    * (needs doc_id + component) so a pipeline clusters once and
    * splits/applies/curates from the same labels frame — see
    * dedupApply's note (VERDICT r3 #5).
    */
  def trainSplitGrouped(documents: DataFrame, trainFrac: Double = 0.8,
      valFrac: Double = 0.1, tau: Double = 0.7,
      labels: Option[DataFrame] = None): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0)
    val comp = labels.getOrElse(DedupOps.dedupGroups(documents, tau))
      .select(col("doc_id"), col("component"))
    documents.select(col("doc_id"), col("source"))
      .join(comp, "doc_id")
      .select(col("doc_id"), col("source"), col("component"),
        ringSplitExpr(col("component"), trainFrac, valFrac).as("split"))
  }

  /** C28: adjacent-pair statistics — the first iteration of BPE merge
    * selection: count every adjacent token pair in the corpus, rank by
    * frequency (the top pair is BPE's first merge). Also the bigram
    * table for collocation mining. Integer counts; ties broken by the
    * pair string, so the ranking is exactly reproducible.
    *
    * Scale shape: explode bigrams → one map-combinable groupBy (keys
    * are distinct pairs — high cardinality, spreadable), then
    * orderBy.limit(k) plans as TakeOrderedAndProject (per-task k-row
    * heaps, no global sort); the rank window runs over k rows only.
    * Bigrams via [[adjacentPairs]] (see its O(doc²) rationale; the
    * transform+element_at form measured 2.6× whole-query wall here).
    */
  def bpePairs(documents: DataFrame, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val head = documents
      .select(tokens(col("text")).as("toks"))
      .select(explode(
        adjacentPairs(col("toks"), (a, b) => concat_ws(" ", a, b))
          .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
    head.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("pair"))).cast("long"))
      .select("rank", "pair", "n")
  }

  /** C80 (r11, VERDICT r10 #3): ITERATIVE BPE merge training — the
    * real trainer [[bpePairs]] only previews: `rounds` greedy merge
    * rounds, each selecting the corpus-wide most-frequent adjacent
    * token pair (ties to the pair string — exactly reproducible) and
    * REWRITING every sequence with that merge applied left-to-right
    * non-overlapping (the classical BPE apply rule: in a run of
    * consecutive matches — only possible when a == b — the 1st, 3rd, …
    * merge and the even ones are consumed). Publishes the merge table:
    * one row per round with the selected pair, its pre-merge
    * frequency, the number of merges actually applied, and the vocab
    * size after the rewrite.
    *
    * Loop mechanics are the kmeansTrain parametric-round pattern: the
    * rewritten long-form token table is eagerly pinned per round via
    * plainLocalCheckpoint (round r+1 reads a LEAF, not round r's whole
    * plan — lineage must not nest), the 1-row top-pair and stats
    * frames are pinned the same way, and everything registers with
    * CacheRegistry for harness release.
    *
    * Scale shape per round: one (a, b) partial-agg pair count + a
    * TakeOrdered top-1, then the rewrite = one window pass per doc
    * partition (lead/lag/row_number over (doc_id, pos) — the corpus
    * shuffles ONCE per round on doc_id and stays there for all four
    * window steps, one exchange reused). Nothing quadratic; rounds is
    * a small fixed dial exactly like Lloyd iterations.
    *
    * r12 (VERDICT r11 #5): `batch` selects the top-N most-frequent
    * PAIRWISE-DISJOINT pairs per round and rewrites them in ONE pass
    * — the dial that takes the trainer toward a real vocab (a 32k
    * vocab needs thousands of merges; at one merge per round the
    * round count, not the per-round work, is the wall). Disjointness
    * rule (deterministic AND oracle-expressible): rank the top-N
    * candidates by (n DESC, a, b); a candidate survives iff it shares
    * NO token with ANY higher-ranked candidate (non-recursive — a
    * dropped candidate still blocks, which keeps the rule a plain
    * self-join instead of a sequential fold; the classical greedy
    * differs only on chains ≥ 3 sharing tokens, where one round's
    * loss is the next round's pick). Disjoint selected pairs cannot
    * match adjacent positions (adjacent matches would share the
    * middle token), so consecutive-match islands remain single-pair
    * runs and the a==b parity rule applies per island unchanged —
    * batched rewrite ≡ sequential rewrite whenever the selected pairs
    * don't interact, which the spec pins. batch = 1 is bit-identical
    * to the pre-batch operator.
    */
  def bpeTrain(documents: DataFrame, rounds: Int = 2,
      batch: Int = 1): DataFrame =
    bpeLoop(documents, rounds, batch)._1

  /** C82: BPE ENCODE — tokenize the corpus with the merges
    * [[bpeTrain]] learns: the same `rounds` greedy train-and-rewrite
    * loop, publishing the FINAL rewritten token table (doc_id, pos,
    * tok — merged tokens joined with '+') instead of the merge stats.
    * This is the apply half of the tokenizer: what a training-data
    * pipeline materializes after the trainer freezes its merge list.
    * The published slice is a deterministic doc_id-mod sample purely
    * to bound the gated artifact; the rewrite itself always runs on
    * the full corpus (merges are corpus-wide statistics, so encoding
    * a sample of a larger corpus is NOT the same operator).
    * Shares [[bpeLoop]], so the scale shape is the trainer's: one
    * doc_id exchange per round reused across the window steps.
    */
  def bpeEncode(documents: DataFrame, rounds: Int = 2,
      docMod: Int = 25, batch: Int = 1): DataFrame = {
    require(docMod >= 1)
    bpeLoop(documents, rounds, batch)._2
      .filter(pmod(col("doc_id"), lit(docMod)) === 0)
      .select(col("doc_id"), col("pos"), col("tok"))
  }

  /** C89 (r12): tokenizer APPLY with a FROZEN merge table — the
    * lifecycle half C80/C82 don't cover: production trains once,
    * freezes the ordered merge list to storage, and tokenizes NEW
    * text with it (text the trainer never saw — re-running the
    * trainer on the new slice would learn different merges, which is
    * why C82 deliberately rewrites the full training corpus). The
    * C87 pattern for the tokenizer: `merges` is [[bpeTrain]]'s
    * published table read back from storage; round r's pair set is a
    * 1-to-N-row broadcast (the stored pairs are token-disjoint BY
    * CONSTRUCTION of the trainer's selection, a set property
    * independent of which corpus they apply to), and the rewrite is
    * the island-parity pass verbatim — no counting, no selection, no
    * training-side work anywhere in the plan.
    *
    * Scale shape per round: ONE doc-partitioned window pass over the
    * apply corpus + a broadcast of ≤64 merge rows; rounds = the
    * frozen vocab's merge-round count. Nothing reads the training
    * corpus; the merge table is the entire model.
    */
  def bpeApply(documents: DataFrame, merges: DataFrame,
      rounds: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1 && rounds <= 16,
      s"BPE merge rounds is a small fixed dial, got $rounds")
    val bridge = org.apache.spark.sql.graftx.bridge
    def release(df: DataFrame): Unit =
      bridge.checkpointRdd(df)
        .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    var cur = bridge.plainLocalCheckpoint(
      documents.select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
          col("tok")))
    graft.CacheRegistry.registerCheckpoint(cur)
    for (r <- 1 to rounds) {
      // the frozen round-r pair set: "a b" splits on the single
      // space bpeTrain's publisher writes (tokens never contain
      // spaces — they come from a whitespace split; merged tokens
      // join with '+')
      val sel = merges.filter(col("round") === r.toLong)
        .select(element_at(split(col("pair"), " ", 2), 1).as("a"),
          element_at(split(col("pair"), " ", 2), 2).as("b"))
      val big = cur.withColumn("nxt", lead(col("tok"), 1).over(wDoc))
      val j = big.join(broadcast(sel),
          col("tok") === col("a") && col("nxt") === col("b"), "left")
        .withColumn("m", col("a").isNotNull)
      // r14 (guide §2.4): same single-window-chain island-parity pass
      // as [[bpeLoop]] — one doc_id shuffle per round instead of the
      // (doc_id, isl) window + (doc_id, pos) join-back (see the
      // equivalence note there)
      val islStart = max(when(col("m")
          && !coalesce(lag(col("m"), 1).over(wDoc), lit(false)), col("pos")))
        .over(wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val merged = j
        .withColumn("elig",
          col("m") && (col("pos") - islStart) % 2 === 0)
        .withColumn("consumed",
          coalesce(lag(col("elig"), 1).over(wDoc), lit(false)))
        .filter(!col("consumed"))
        .select(col("doc_id"),
          row_number().over(wDoc).cast("long").as("pos"),
          when(col("elig"), concat(col("tok"), lit("+"), col("nxt")))
            .otherwise(col("tok")).as("tok"))
      val next = bridge.plainLocalCheckpoint(merged)
      graft.CacheRegistry.registerCheckpoint(next)
      release(cur)
      cur = next
    }
    cur
  }

  /** Shared trainer/encoder loop: returns (merge-stats frame, final
    * rewritten token table). Mechanics documented on [[bpeTrain]].
    */
  private def bpeLoop(documents: DataFrame,
      rounds: Int, batch: Int = 1): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1 && rounds <= 16,
      s"BPE merge rounds is a small fixed dial, got $rounds")
    require(batch >= 1 && batch <= 64,
      s"BPE merges per round is a small fixed dial, got $batch")
    val bridge = org.apache.spark.sql.graftx.bridge
    def release(df: DataFrame): Unit =
      bridge.checkpointRdd(df)
        .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    // curCk is the release HANDLE (the raw checkpoint leaf — from
    // round 1 on, `cur` is a projection over it and checkpointRdd
    // can't unpin through a Project)
    var curCk = bridge.plainLocalCheckpoint(
      documents.select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
          col("tok")))
    graft.CacheRegistry.registerCheckpoint(curCk)
    var cur: DataFrame = curCk
    var stats: DataFrame = null
    for (r <- 1 to rounds) {
      val big = cur.withColumn("nxt", lead(col("tok"), 1).over(wDoc))
      // top-`batch` candidates by (n DESC, a, b) via TakeOrdered, then
      // the NON-RECURSIVE disjointness filter: a candidate survives
      // iff it shares no token with ANY higher-ranked candidate — a
      // bounded self-anti-join over ≤ batch rows (a dropped candidate
      // still blocks; see the bpeTrain doc). batch = 1 degenerates to
      // the plain top-1 with no blocker — the pre-batch operator.
      val cand = big.filter(col("nxt").isNotNull)
        .groupBy(col("tok").as("a"), col("nxt").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(batch)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n").desc, col("a"), col("b"))))
      val sel =
        if (batch == 1) cand.select(col("a"), col("b"), col("n"))
        else cand.as("c").join(cand.as("d"),
            col("d.rk") < col("c.rk")
              && (col("d.a") === col("c.a") || col("d.a") === col("c.b")
                || col("d.b") === col("c.a") || col("d.b") === col("c.b")),
            "left_anti")
          .select(col("a"), col("b"), col("n"))
      val top = bridge.plainLocalCheckpoint(sel)
      graft.CacheRegistry.registerCheckpoint(top)
      // selected pairs are token-disjoint, so a position matches at
      // most ONE pair — the broadcast equi-left-join marks it
      val j = big.join(broadcast(top),
          col("tok") === col("a") && col("nxt") === col("b"), "left")
        .withColumn("m", col("a").isNotNull)
      // greedy left-to-right: islands of CONSECUTIVE match positions
      // (gaps-and-islands on pos), merge offsets 1, 3, … within each.
      // Disjointness means consecutive matches are always the SAME
      // pair (adjacent different-pair matches would share the middle
      // token), so the parity rule is per-pair exactly as at batch 1.
      //
      // r14 (guide §2.4): the parity pass is now ONE window chain on
      // the (doc_id, pos) ordering instead of the former
      // filter-to-matches → (doc_id, isl)-window → join-back shape,
      // which paid a second exchange (the isl partition key) plus a
      // (doc_id, pos) sort-merge join back per round. An island is a
      // maximal run of consecutive match POSITIONS, so its start is
      // `m && !lag(m)` and the running max of start positions gives
      // every match row its island start; within-island rank parity
      // (old: row_number over (doc_id, isl) odd) is exactly
      // (pos − isl_start) even. All frames share wDoc's sort — the
      // round's rewrite shuffles the corpus ONCE.
      val islStart = max(when(col("m")
          && !coalesce(lag(col("m"), 1).over(wDoc), lit(false)), col("pos")))
        .over(wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val merged = j
        .withColumn("elig",
          col("m") && (col("pos") - islStart) % 2 === 0)
        .withColumn("consumed",
          coalesce(lag(col("elig"), 1).over(wDoc), lit(false)))
        .filter(!col("consumed"))
        .select(col("doc_id"),
          row_number().over(wDoc).cast("long").as("pos"),
          when(col("elig"), concat(col("tok"), lit("+"), col("nxt")))
            .otherwise(col("tok")).as("tok"),
          // merge provenance rides INTO the checkpoint so the stats
          // row below reads the pinned leaf instead of re-running the
          // whole rewrite (eligible rows are never consumed — an elig
          // row's predecessor is never elig by parity, so every merge
          // survives the filter and the per-pair counts are identical
          // to the former pre-filter groupBy)
          when(col("elig"), concat_ws(" ", col("a"), col("b"))).as("mp"))
      val next = bridge.plainLocalCheckpoint(merged)
      graft.CacheRegistry.registerCheckpoint(next)
      // per-selected-pair stats rows — both inputs (top, next) are
      // pinned leaves, so this costs two tiny scans of the checkpoint
      val row = bridge.plainLocalCheckpoint(
        top.join(next.filter(col("mp").isNotNull).groupBy("mp")
            .agg(count(lit(1)).as("n_merges")),
            concat_ws(" ", col("a"), col("b")) === col("mp"), "left")
          .crossJoin(broadcast(
            next.agg(countDistinct(col("tok")).as("vocab_size"))))
          .select(lit(r).cast("long").as("round"),
            concat_ws(" ", col("a"), col("b")).as("pair"), col("n"),
            coalesce(col("n_merges"), lit(0L)).as("n_merges"),
            col("vocab_size")))
      graft.CacheRegistry.registerCheckpoint(row)
      release(curCk)
      curCk = next
      cur = next.select(col("doc_id"), col("pos"), col("tok"))
      stats = if (stats == null) row else stats.unionByName(row)
    }
    (stats, cur)
  }

  /** 32-bit md5-derived token hash, bit-identical to DuckDB's
    * `md5_number_upper(t) >> 32`: DuckDB reads the first 8 digest
    * bytes LITTLE-endian, so the upper 32 bits are digest bytes 7..4.
    * A real hash (md5) that both engines can compute — the reason C10
    * can be oracle-gated at all (xxhash64 has no DuckDB twin; VERDICT
    * r1 item 4). Native byte-level expression — the former
    * hex-string-chop formulation (md5 → 4× substring → concat → conv)
    * allocated five strings per token and was the #1 GC source of the
    * whole bench under heap pressure (VERDICT r3 #1).
    */
  private def md5Hash32(t: Column): Column =
    graft.functions.VectorFns.md5_hash32(t)

  /** C18: deterministic fractional sampling — keep a hash-selected
    * `frac` of documents, reproducibly: doc survives iff its Knuth
    * priority (same overflow-safe decimal ring as [[samplePerGroup]],
    * uniform on [0, 2^32)) falls under frac·2^32. No RNG state, stable
    * across runs/partitionings/engines, map-only; the standard way to
    * cut a corpus to a byte budget without coordination.
    */
  def sampleFraction(documents: DataFrame, frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0)
    import org.apache.spark.sql.types.DecimalType
    val priority = pmod(
      col("doc_id").cast(DecimalType(20, 0)) *
        lit(2654435761L).cast(DecimalType(10, 0)),
      lit(4294967296L).cast(DecimalType(11, 0))).cast("long")
    documents
      .filter(priority < lit((frac * 4294967296.0).toLong))
      .select(col("doc_id"), col("source"), col("lang"))
  }

  /** C40: reproducible training-order shard layout — the "global
    * shuffle" a training run needs, without RNG state and without a
    * global rank: each doc gets a seeded md5 ORDER key (a uniform
    * pseudo-random permutation; a new seed is a fresh epoch order)
    * and a 32-bit-hash shard id, and the emitted frame is hash-
    * partitioned by shard and sorted by ord within shards — exactly
    * the layout a sharded training-data writer puts on disk, where
    * readers consuming shards in (shard, ord) order see the full
    * permutation without ordinals ever being materialized.
    *
    * Scale: map-side projection + ONE exchange on shard. Deliberately
    * NO global row_number: an unpartitioned rank window funnels the
    * corpus through one task (the WindowExec single-partition trap) —
    * the (shard, ord) sort IS the total order.
    */
  def trainOrder(documents: DataFrame, nShards: Int = 8,
      seed: String = "graft"): DataFrame = {
    require(nShards > 0)
    val key = concat(lit(seed), lit(":"), col("doc_id").cast("string"))
    documents
      .select(col("doc_id"), col("source"), md5(key).as("ord"),
        pmod(md5Hash32(key), lit(nShards.toLong)).as("shard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
  }

  /** C41: domain-mix rebalancing — downsample each source to a caller
    * target fraction (upweight code, cut web boilerplate: the
    * standard pre-training mixture dial). Same deterministic Knuth
    * ring as C18, with a per-source threshold: a doc survives iff its
    * priority falls under frac(source)·2^32; sources without a target
    * keep everything. Map-only, rerun/append-stable, and the kept set
    * for frac f is a SUBSET of the kept set for f' > f (nested
    * samples — shrinking a mix never resamples it).
    */
  def sampleMix(documents: DataFrame,
      fracs: Map[String, Double]): DataFrame = {
    require(fracs.nonEmpty && fracs.values.forall(f => f >= 0.0 && f <= 1.0))
    import org.apache.spark.sql.types.DecimalType
    val priority = pmod(
      col("doc_id").cast(DecimalType(20, 0)) *
        lit(2654435761L).cast(DecimalType(10, 0)),
      lit(4294967296L).cast(DecimalType(11, 0))).cast("long")
    val fs = fracs.toSeq
    val threshold = fs.tail
      .foldLeft(when(col("source") === fs.head._1,
        lit((fs.head._2 * 4294967296.0).toLong))) {
        case (w, (src, f)) =>
          w.when(col("source") === src, lit((f * 4294967296.0).toLong))
      }
      .otherwise(lit(4294967296L))
    documents
      .filter(priority < threshold)
      .select(col("doc_id"), col("source"), col("lang"))
  }

  /** C10: document fingerprint — ORDER-SENSITIVE positional
    * fingerprint plus an order-insensitive min-hash, two cheap
    * fingerprints per document, all map-side (no shuffle).
    *
    * Each token contributes m_i = c_i·h_i mod 2^32 with a
    * position-dependent coefficient c_i = i·k mod 2^32 (k = Knuth's
    * 2654435761, i = 1-based position, h_i = md5-derived 32-bit token
    * hash); the fingerprint is Σ m_i mod 2^32 — a random-linear-
    * combination hash. The coefficient MULTIPLIES the hash (an
    * additive/affine mix would make the sum separable and therefore
    * permutation-invariant), so swapping tokens i,j shifts the sum by
    * (c_i−c_j)(h_i−h_j) ≠ 0. A commutative SUM of positional terms is
    * what keeps this SQL-expressible without fold/reduce — i.e.
    * reproducible by the DuckDB oracle. The c·h product runs in
    * DECIMAL (ANSI-overflow-safe; everything else stays in long range).
    */
  /** C32: corpus-trained bigram language-model scoring — the
    * perplexity-style quality signal real pipelines compute with an
    * external LM, self-contained: train MLE bigram probabilities
    * p(w2|w1) = c(w1,w2)/c(w1,·) on the corpus itself, then score
    * each document by its mean bigram negative log-likelihood (and
    * perplexity = e^nll). Formulaic filler (repeated frequent
    * bigrams) scores low; rare-transition text scores high.
    *
    * Determinism: each -ln term is quantized to DECIMAL(38,18) before
    * the per-doc sum, so the aggregate is order-independent (same
    * result on any partitioning). Cross-engine: ln is not a correctly-
    * rounded IEEE op, so per-term doubles can differ from the oracle's
    * at the last ulp — but a 1-ulp term wiggle moves the per-doc MEAN
    * by ≲1e-16, and the published avg_nll/ppl are rounded to 4
    * decimals (the q_corr protocol), which absorbs it. ppl
    * re-exponentiates the ROUNDED mean so both engines feed exp the
    * bit-identical input.
    *
    * Scale shape: bigram generation is a generator map; counts are two
    * partial-aggregated groupBys on token keys (high cardinality); the
    * scoring join hits the counts tables on their keys, AQE broadcasts
    * when small. No driver-side vocab, no collect.
    */
  def lmScore(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.functions.size
    val bigrams = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(
        adjacentPairs(col("toks"), (a, b) => struct(a.as("w1"), b.as("w2")))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val biCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // c(w1,·) from the bigram table itself — exactly the MLE
    // denominator, and every scored bigram is present by construction
    // (the corpus trains on itself), so no zero-probability guards
    val uniCounts = biCounts.groupBy("w1").agg(sum("cb").as("cu"))
    val nll = negate(log(col("cb").cast("double") / col("cu").cast("double")))
      .cast(DecimalType(38, 18))
    val scored = bigrams
      .join(biCounts, Seq("w1", "w2"))
      .join(uniCounts, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(nll).cast("double") / count(lit(1))).as("avg_nll"))
    // EVERY document appears: a doc with < 2 tokens has no bigrams
    // (explode emits nothing for it), but "score each document" means
    // the caller must see it — with n_bigrams = 0 and null nll/ppl,
    // not silently missing from a filter join downstream
    documents.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("avg_nll"), 4).as("avg_nll"),
        round(exp(round(col("avg_nll"), 4)), 4).as("ppl"))
  }

  /** C69: per-source Jensen–Shannon divergence from the corpus
    * unigram distribution — the drift audit a pretraining mix runs
    * when a new crawl/source lands (C47 counts tokens; this asks
    * whether a source's token DISTRIBUTION is an outlier before it
    * gets a mixture weight, and re-measured between snapshots it is
    * the corpus-drift alarm). JSD(p‖q) = ½Σ p·ln(p/m) + ½Σ q·ln(q/m),
    * m = (p+q)/2, p = the source's unigram MLE, q = the corpus-wide
    * one; bounded [0, ln 2], 0 iff identical.
    *
    * The q-side sum over tokens ABSENT from the source is closed-form
    * — each absent token contributes q·ln 2 — so the operator only
    * materializes PRESENT (source, token) rows and adds
    * (1 − Q_s)·ln 2 where Q_s = (Σ_{t∈s} c_t)/N is one exact integer
    * sum and one division. Per-present-token terms quantize as
    * floor(term·10¹²) integers (the C30/A37 protocol — a double→
    * DECIMAL cast rounds in Spark but truncates in DuckDB, so only
    * floor is engine-identical; ADVICE r8) → exact order-independent
    * DECIMAL(38,0) sum → round-4 publish (an engine ulp in ln flips
    * floor only on exact 10⁻¹² boundaries, which ln output never
    * lands on; the ≤1e-12 bias per term dies at round-4).
    *
    * Scale shape: one (source, tok) partial-agg groupBy, a vocab-key
    * join of that table against the |vocab|-row corpus counts, a
    * broadcast |sources|-row join — the corpus is read once; nothing
    * is per-document downstream of the first groupBy.
    */
  def corpusDivergence(documents: DataFrame): DataFrame =
    corpusDivergenceFromCounts(documents
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c_st")))

  /** C69's statistic from a (source, tok, c_st) count table — exposed
    * because these integer counts are EXACTLY the mergeable state the
    * D15 streaming monitor folds (the D14 argument: count addition is
    * associative, so micro-batching is lossless and the live JSD is
    * the whole-history batch JSD bit-for-bit).
    */
  def corpusDivergenceFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // persisted: the count table feeds the source margins, the vocab
    // margins, AND the term join — without the barrier the input
    // recomputes 3×
    val st = graft.CacheRegistry.persist(counts)
    val s = st.groupBy("source").agg(sum("c_st").as("n_s"))
    val t = st.groupBy("tok").agg(sum("c_st").as("c_t"))
    val n = s.agg(sum("n_s").as("n_corpus"))
    val p = col("c_st").cast("double") / col("n_s").cast("double")
    val q = col("c_t").cast("double") / col("n_corpus").cast("double")
    val m = (p + q) / lit(2.0)
    // floor(term·10¹²), NOT a double→DECIMAL cast (ADVICE r8): the
    // cast ROUNDS in Spark but TRUNCATES in DuckDB (the documented
    // divergence), so only floor of the exactly-computed product is
    // genuinely engine-identical. 10¹² keeps |term|·scale ≤ 1.4·10¹²
    // < 2⁵³ (floor really floors) and the ≤1e-12-per-term bias dies
    // at the round-4 publish even over 10⁸ distinct tokens.
    val term = floor((p * log(p / m) + q * log(q / m)) * lit(1.0e12))
      .cast(DecimalType(38, 0))
    val agg = st
      .join(broadcast(s), "source")
      .join(t, "tok")
      .crossJoin(broadcast(n))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        sum(term).as("term_sum"),
        sum(col("c_t")).as("ct_sum"),
        max(col("n_corpus")).as("n_corpus"))
    val qs = col("ct_sum").cast("double") / col("n_corpus").cast("double")
    agg.select(col("source"), col("n_tokens"), col("n_distinct_tokens"),
      round((col("term_sum").cast("double") / lit(1.0e12)
        + (lit(1.0) - qs) * lit(math.log(2.0))) / lit(2.0), 4).as("jsd"))
  }

  /** C74: DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — the published
    * method behind domain-targeted pretraining mixes): score every
    * raw-corpus doc by how much more likely its hashed-unigram
    * profile is under a TARGET domain's bag-of-words model than under
    * the raw corpus's own — lw(doc) = Σ_b c_doc(b)·[ln p_t(b) −
    * ln p_r(b)] over `buckets` hash buckets with add-1 smoothing.
    * Positive means target-leaning; downstream C41/C18 samplers
    * consume the weight as their mixture dial. This is the
    * "make more data look like Wikipedia" selection step C16's
    * decontamination and C52's perplexity buckets don't cover.
    *
    * Determinism: bucket = md5_hash32(token) mod buckets (the
    * C10/C40-established DuckDB md5_number_upper mirror); model
    * probabilities are exact integer ratios; each bucket's log ratio
    * is ONE fixed double chain floor(·10⁹)-quantized (C69's protocol
    * — a libm ulp flips a floor with probability ~2e-7/term at this
    * scale and a flipped term moves a doc's weight by c·10⁻⁹, which
    * dies at the round-6 publish), multiplied by the doc's integer
    * bucket count and summed in DECIMAL(38,0) — order-independent on
    * any partitioning. `target_like` compares the INTEGER sum to
    * zero, so the boolean can't sit on a float knife-edge.
    *
    * Scale shape: token explode → two ≤`buckets`-row partial-agg
    * model tables (broadcast) → one (doc, bucket) partial agg → one
    * groupBy back to |docs| rows, joined LEFT so token-less docs
    * still report. The corpus shuffles once at (doc, bucket)
    * granularity; the models are bucket-bounded at any corpus size.
    */
  def dsirWeights(documents: DataFrame, target: DataFrame,
      buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val I = DecimalType(38, 0)
    val bD = buckets.toDouble
    def toBuckets(df: DataFrame) = df
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(graft.functions.VectorFns.md5_hash32(col("tok")),
          lit(buckets.toLong)).as("bucket"))
    // persisted via the size-thresholded registry: the raw bucket
    // stream feeds the raw model AND the per-doc counts
    val tb = graft.CacheRegistry.persistIfLarge(toBuckets(documents))
    val ttb = toBuckets(target)
    val raw = tb.groupBy("bucket").agg(count(lit(1)).as("c_r"))
    val tgt = ttb.groupBy("bucket").agg(count(lit(1)).as("c_t"))
    val nR = tb.agg(count(lit(1)).as("n_r"))
    val nT = ttb.agg(count(lit(1)).as("n_t"))
    val termQ = floor(
      (log((coalesce(col("c_t"), lit(0L)).cast("double") + lit(1.0))
          / (col("n_t").cast("double") + lit(bD)))
        - log((coalesce(col("c_r"), lit(0L)).cast("double") + lit(1.0))
          / (col("n_r").cast("double") + lit(bD)))) * lit(1.0e9))
      .cast(I)
    val model = raw.join(tgt, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(nR)).crossJoin(broadcast(nT))
      .select(col("bucket"), termQ.as("term_q"))
    val perDoc = tb.groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("c_db"))
      .join(broadcast(model), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("c_db")).as("n_toks"),
        sum(col("c_db").cast(I) * col("term_q")).as("lwq"))
    documents.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_toks"),
        round(col("lwq").cast("double") / lit(1.0e9), 6).as("log_weight"),
        // length-normalized form: the raw sum scales with doc length
        // (a long off-target doc out-negatives a short one), so the
        // per-token mean is the affinity signal samplers compare
        round(col("lwq").cast("double") / lit(1.0e9)
          / col("n_toks").cast("double"), 6).as("lw_per_tok"),
        (col("lwq") > 0).as("target_like"))
  }

  /** C74's FROZEN model: the ≤`buckets`-row term table collected into
    * a driver-side artifact (this is the one justified collect in the
    * family — the model IS a deployment artifact, bounded by the
    * bucket count regardless of corpus size, exactly like a
    * regression's coefficient vector), plus the closed-form term for
    * unseen buckets (c_t = c_r = 0 ⇒ ln((n_r+B)/(n_t+B)), a
    * constant).
    */
  final case class DsirModel(terms: Map[Long, Long], defaultTermQ: Long,
      buckets: Int)

  def dsirTrain(documents: DataFrame, target: DataFrame,
      buckets: Int = 4096): DsirModel = {
    val bD = buckets.toDouble
    def toBuckets(df: DataFrame) = df
      .select(explode(tokens(col("text"))).as("tok"))
      .select(pmod(graft.functions.VectorFns.md5_hash32(col("tok")),
        lit(buckets.toLong)).as("bucket"))
    val tb = graft.CacheRegistry.persistIfLarge(toBuckets(documents))
    val ttb = toBuckets(target)
    val raw = tb.groupBy("bucket").agg(count(lit(1)).as("c_r"))
    val tgt = ttb.groupBy("bucket").agg(count(lit(1)).as("c_t"))
    val nR = tb.agg(count(lit(1))).head.getLong(0)
    val nT = ttb.agg(count(lit(1))).head.getLong(0)
    def termQ(ct: Column, cr: Column) = floor(
      (log((ct.cast("double") + lit(1.0)) / lit(nT.toDouble + bD))
        - log((cr.cast("double") + lit(1.0)) / lit(nR.toDouble + bD)))
        * lit(1.0e9)).cast("long")
    val rows = raw.join(tgt, Seq("bucket"), "full_outer")
      .select(col("bucket"), termQ(coalesce(col("c_t"), lit(0L)),
        coalesce(col("c_r"), lit(0L))).as("term_q"))
      .collect()
    val default = math.floor(
      (math.log(1.0 / (nT.toDouble + bD))
        - math.log(1.0 / (nR.toDouble + bD))) * 1.0e9).toLong
    DsirModel(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      default, buckets)
  }

  /** C74's scorer against a FROZEN model — a PURE MAP (the model is a
    * plan-literal map, the per-doc weight an in-row integer fold), so
    * it runs unchanged on a batch table or a live document STREAM
    * (D21: stateless — no state store, no watermark, no shuffle; the
    * D7/D10 offline-model/online-score split). Integer addition makes
    * the in-row fold order-exactly the distributed groupBy sum, so
    * [[dsirWeights]]-with-the-same-model and this scorer agree
    * bit-for-bit (spec-pinned).
    */
  def dsirScore(documents: DataFrame, model: DsirModel): DataFrame = {
    val m = typedlit(model.terms)
    val toks = tokens(col("text"))
    val bucketArr = transform(toks,
      t => pmod(graft.functions.VectorFns.md5_hash32(t),
        lit(model.buckets.toLong)))
    val lwq = aggregate(bucketArr, lit(0L),
      (acc, b) => acc + coalesce(element_at(m, b),
        lit(model.defaultTermQ)))
    documents.select(col("doc_id"), col("source"),
        when(size(toks) > 0, size(toks).cast("long")).as("n_toks"),
        when(size(toks) > 0, lwq).as("lwq"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        round(col("lwq").cast("double") / lit(1.0e9), 6).as("log_weight"),
        round(col("lwq").cast("double") / lit(1.0e9)
          / col("n_toks").cast("double"), 6).as("lw_per_tok"),
        (col("lwq") > 0).as("target_like"))
  }

  /** C34: URL extraction + per-domain stats — the audit behind
    * domain-level corpus curation (allow/deny lists, per-domain
    * quality priors): pull every URL, normalize to its registrable
    * host, count docs and URLs per domain. Map + one groupBy on the
    * domain key; regexes stay in the Java/RE2-common subset so the
    * oracle replays them.
    *
    * Like C29, the synthetic corpus carries no URLs, so the query
    * entry injects a deterministic doc_id-derived URL per doc first —
    * the extraction runs against real matches on every row.
    */
  def urlDomains(documents: DataFrame): DataFrame = {
    val urlPat = "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"
    val hostPat = "https?://([A-Za-z0-9.-]+)"
    documents
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(text, '$urlPat', 0)")).as("url"))
      .select(col("doc_id"),
        regexp_extract(col("url"), hostPat, 1).as("domain"))
      .groupBy("domain")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_urls"))
  }

  /** Deterministic URL augmentation for C34's query entry (same
    * rationale as [[withSyntheticPii]]).
    */
  def withSyntheticUrl(documents: DataFrame): DataFrame =
    documents.withColumn("text",
      concat(col("text"), lit(" see https://mirror"),
        pmod(col("doc_id"), lit(25)).cast("string"),
        lit(".example.org/doc/"), col("doc_id").cast("string")))

  /** A doc_id-derived crawl URL with every canonicalization hazard
    * baked in — uppercase scheme/host, explicit default port, www
    * prefix, tracking params, fragment, trailing slash — such that
    * distinct raw URLs collapse under [[urlNormalize]] exactly when
    * (doc_id mod 7, doc_id mod 50, doc_id mod 5) agree. Both engines
    * build the same string, so the normalizer is exercised on real
    * variance, not vacuously.
    */
  def withSyntheticCrawlUrl(documents: DataFrame): DataFrame =
    documents.withColumn("url",
      concat(lit("HTTPS://WWW.Host"), pmod(col("doc_id"), lit(7)).cast("string"),
        lit(".Example.COM:443/Docs/"), pmod(col("doc_id"), lit(50)).cast("string"),
        lit("/?utm_source=s"), col("doc_id").cast("string"),
        lit("&id="), pmod(col("doc_id"), lit(5)).cast("string"),
        lit("&utm_campaign=c#sec"), col("doc_id").cast("string")))

  /** C56: URL canonicalization — the normalize-before-dedup step every
    * web-corpus pipeline runs (the same page arrives under thousands
    * of raw spellings; URL-level dedup without canonicalization
    * misses most of them): strip fragment, strip `utm_*` tracking
    * params (tidying separators), lowercase scheme+host, drop default
    * ports and the `www.` prefix, drop the trailing slash. Pure
    * regex/builtin map — all patterns in the Java/RE2-common subset
    * so the oracle replays them verbatim; no UDF, no shuffle.
    */
  def urlNormalize(url: Column): Column = {
    // fragment first, then tracking params — each strip ANCHORED at a
    // real separator (ADVICE r7: the old unanchored 'utm_…&' pattern
    // half-deleted a non-utm param whose NAME merely ends in "utm_",
    // e.g. '?xutm_source=a&id=1' → '?xid=1', silently merging distinct
    // URLs). RE2 has no lookaround, so the anchored decomposition is:
    // every NON-LEADING utm param starts with '&' (replace-all handles
    // consecutive runs), then the one possible leading utm param is
    // either followed by another param (keep the '?') or alone.
    val noFrag = regexp_replace(url, "#.*$", "")
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, "&utm_[a-z]+=[^&#]*", ""),
        "\\?utm_[a-z]+=[^&#]*&", "?"),
      "\\?utm_[a-z]+=[^&#]*$", "")
    val tidy = regexp_replace(noUtm, "[?&]$", "")
    // lowercase ONLY scheme://host[:port] (paths are case-sensitive)
    val head = lower(regexp_extract(tidy, "^[A-Za-z]+://[^/]*", 0))
    val rest = regexp_replace(tidy, "^[A-Za-z]+://[^/]*", "")
    // strip ONLY the scheme-matching default port (ADVICE r7: :443 on
    // http or :80 on https is a NON-default port naming a different
    // resource — conflating them corrupts the dedup key)
    val cleanHead = regexp_replace(
      regexp_replace(
        regexp_replace(head, "^(https://[^/:]+):443$", "$1"),
        "^(http://[^/:]+):80$", "$1"),
      "^(https?://)www\\.", "$1")
    // path-trailing slash: both the bare form ".../x/" and the
    // before-query form ".../x/?id=3"
    val cleanRest = regexp_replace(
      regexp_replace(rest, "/\\?", "?"), "/$", "")
    concat(cleanHead, cleanRest)
  }

  /** C56 query shape: normalize, then exact dedup on the canonical
    * URL — keep the lowest doc_id per canonical target (C1's
    * hash-groupBy plan on the normalized key).
    */
  def urlDedup(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), urlNormalize(col("url")).as("url_norm"))
      .groupBy("url_norm")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** C29: PII redaction — the scrub pass every training corpus runs
    * before anything else: emails and phone-number shapes replaced by
    * typed placeholder tokens, with per-doc match counts for the
    * removal audit. Pure map (regexp_replace/regexp_count are
    * codegen'd builtins — no UDF), zero shuffles; patterns restricted
    * to the regex subset with identical semantics in Java and RE2 so
    * the DuckDB oracle replays them verbatim.
    *
    * The synthetic corpus carries no PII, so the query entry injects a
    * deterministic doc_id-derived email + phone into each doc first
    * (both engines build the same string) — the regexes are exercised
    * on every row, not vacuously green.
    */
  def piiRedact(documents: DataFrame): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\+?[0-9][0-9()\\-. ]{5,}[0-9]"
    val deEmailed = regexp_replace(col("text"), emailPat, "<EMAIL>")
    documents.select(
      col("doc_id"),
      regexp_replace(deEmailed, phonePat, "<PHONE>").as("redacted"),
      regexp_count(col("text"), lit(emailPat)).as("n_emails"),
      // phones counted AFTER email removal: digits inside an address
      // must not double-count (mirrored in the oracle)
      regexp_count(deEmailed, lit(phonePat)).as("n_phones"))
  }

  /** Deterministic PII augmentation for C29's query entry: append a
    * doc_id-derived email and phone so the redaction has real work on
    * the synthetic corpus. String construction is engine-portable
    * (concat/lpad/mod only).
    */
  def withSyntheticPii(documents: DataFrame): DataFrame =
    documents.withColumn("text",
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or +1 (555) 010-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))

  /** C51: character-level Shannon entropy per document — the cheap
    * gibberish/encoding-garbage detector quality pipelines run next
    * to C8/C19 (low entropy ⇒ degenerate repetition or padding; very
    * high entropy ⇒ binary-in-text or encrypted/compressed spillage;
    * CCNet and Gopher both gate on signals of this family).
    *
    * Entropy is reported in NATS (−Σ p·ln p) deliberately: both
    * engines compute `ln` directly, with no log2 = ln/ln2 quotient
    * whose extra rounding would widen the cross-engine wiggle; the
    * published value is round-4 (the expression's fixed ascending-
    * bucket fold and the oracle's order-free quantized-decimal sum
    * land within ~1e-15 of each other).
    *
    * Scale shape: a PURE MAP — the whole histogram + entropy runs
    * inside one codegen'd expression per row (graftx.CharEntropy),
    * no explode, no shuffle. The first two formulations exploded one
    * row per character and ScaleSmoke measured the explode volume
    * itself at ratio ~17 at 10× (both the substring-walk and the
    * split form — the (doc, char) partial agg was never the
    * problem); the native kernel is the same fix MultimodalOps took
    * for binary decode.
    */
  def docEntropy(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        graft.functions.VectorFns.char_entropy(col("text")).as("s"))
      .select(col("doc_id"),
        col("s.n_chars").as("n_chars"),
        col("s.n_distinct_chars").as("n_distinct_chars"),
        round(col("s.entropy_nats"), 4).as("entropy_nats"))

  /** C52: CCNet-style perplexity bucketing — the corpus split that
    * made CCNet (Wenzek et al. 2019 §4.3): per language, rank
    * documents by LM perplexity and cut into terciles `head` /
    * `middle` / `tail` (head = lowest-ppl third, the highest-quality
    * slice; downstream training mixes sample the buckets at
    * different rates). Scores come from [[lmScore]] (C32, the
    * corpus-trained bigram LM), so the ranking key is that entry's
    * already-deterministic round-4 `ppl` with doc_id as the total-
    * order tiebreak; docs the LM cannot score (< 2 tokens, null ppl)
    * are bucketed `unscored` OUTSIDE the ntile window — inside it
    * the engines would disagree on null placement (Spark sorts nulls
    * first ascending, DuckDB last).
    *
    * Scale shape: scoring is C32's plan; the bucket assignment is one
    * ntile window partitioned by lang. A language's scored rows must
    * sort within their partition — at 100 TB the per-lang global sort
    * is the cost, and the standard production cut switches to
    * approx-percentile ppl thresholds (two broadcastable cut points
    * per lang) at the price of ±ε bucket-boundary error; the exact
    * ntile here is the oracle-checkable semantics.
    */
  def ccnetBucket(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = lmScore(documents)
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("ppl"))
    val w = Window.partitionBy("lang").orderBy(col("ppl").asc, col("doc_id"))
    val bucketed = scored.filter(col("ppl").isNotNull)
      .withColumn("t", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("t") === 1, "head").when(col("t") === 2, "middle")
          .otherwise("tail").as("bucket"))
    val unscored = scored.filter(col("ppl").isNull)
      .select(col("doc_id"), col("lang"), col("ppl"),
        lit("unscored").as("bucket"))
    bucketed.union(unscored)
  }

  /** C52 100 TB variant (VERDICT r7 #2): the documented production
    * cut made real — per-lang approx_percentile tercile CUT POINTS
    * (two broadcastable values per lang, from a mergeable sketch;
    * partial-agg shape, NO per-lang global sort) assign buckets by
    * threshold instead of the exact ntile ranking.
    *
    * Gate (B10/B20 pattern): published columns are the EXACT entry's
    * (doc_id, lang, ppl, bucket — deterministic, hashable) plus an
    * in-row `approx_ok` predicate. A threshold-vs-ntile disagreement
    * is legitimate ONLY for a doc whose ppl lies between the approx
    * cut point and the true tercile edge (the ±ε rank-error region,
    * which also absorbs ntile's doc_id tie-splitting at an edge) —
    * the predicate excuses exactly that interval per boundary, so a
    * mis-bucketing anywhere else fails the oracle hash.
    */
  def ccnetBucketApprox(documents: DataFrame): DataFrame = {
    // the exact assignment feeds FOUR branches of the gate plan
    // (edges, cuts, checked rows, unscored rows) and Catalyst does
    // not CSE across joins — persist it once, released by the
    // harness's CacheRegistry.unpersistAll (cut the gate's bench
    // wall ~2x: the C32 scoring plan ran once per branch)
    val exact = graft.CacheRegistry.persist(ccnetBucket(documents))
    val scoredNN = exact.filter(col("ppl").isNotNull)
    // true tercile edges from the exact assignment: max ppl in head,
    // max ppl in head∪middle
    val edges = scoredNN.groupBy(col("lang").as("lang_e"))
      .agg(max(when(col("bucket") === "head", col("ppl"))).as("b1_edge"),
        max(when(col("bucket") =!= "tail", col("ppl"))).as("b2_edge"))
    val cuts = scoredNN.groupBy(col("lang").as("lang_c"))
      .agg(percentile_approx(col("ppl"),
        array(lit(1.0 / 3.0), lit(2.0 / 3.0)), lit(10000)).as("cs"))
      .select(col("lang_c"), col("cs").getItem(0).as("cut1"),
        col("cs").getItem(1).as("cut2"))
    val checked = scoredNN
      .join(broadcast(cuts), col("lang") === col("lang_c"))
      .join(broadcast(edges), col("lang") === col("lang_e"))
      .withColumn("bucket_a",
        when(col("ppl") <= col("cut1"), "head")
          .when(col("ppl") <= col("cut2"), "middle").otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("ppl"), col("bucket"),
        coalesce(col("bucket_a") === col("bucket")
            || (col("ppl") >= least(col("cut1"), col("b1_edge"))
              && col("ppl") <= greatest(col("cut1"), col("b1_edge")))
            || (col("ppl") >= least(col("cut2"), col("b2_edge"))
              && col("ppl") <= greatest(col("cut2"), col("b2_edge"))),
          lit(false)).as("approx_ok"))
    val unscored = exact.filter(col("ppl").isNull)
      .select(col("doc_id"), col("lang"), col("ppl"), col("bucket"),
        lit(true).as("approx_ok"))
    checked.union(unscored)
  }

  def fingerprint(documents: DataFrame): DataFrame = {
    val K = lit(2654435761L)
    val M = lit(4294967296L)
    // materialize the md5 token-hash array in its own projection:
    // referencing the raw expression from both `mixed` and `array_min`
    // would md5 every token twice per row (multi-referenced non-cheap
    // aliases survive CollapseProject, so the split is kept)
    //
    // c·h mod 2^32 in pure long arithmetic (16-bit split: c_lo·h and
    // c_hi·h both < 2^48, so nothing can overflow a long and no ANSI
    // guard trips). The former DECIMAL(20,0) formulation was
    // overflow-safe but allocated a BigDecimal per token — with the
    // string-chop hash it made C10 the bench's worst GC offender
    // (VERDICT r3 #1); this path is allocation-free integer codegen.
    val mixed = transform(col("th"), (h, i) => {
      val c = pmod((i + 1).cast("long") * K, M)
      val lo = c.bitwiseAND(lit(0xFFFFL)) * h
      val hiLow16 = shiftright(c, 16).multiply(h).bitwiseAND(lit(0xFFFFL))
      (lo + shiftleft(hiLow16, 16)).bitwiseAND(lit(0xFFFFFFFFL))
    })
    documents
      .select(col("doc_id"),
        transform(tokens(col("text")), t => md5Hash32(t)).as("th"))
      .select(
        col("doc_id"),
        pmod(aggregate(mixed, lit(0L), (acc, m) => acc + m), M)
          .as("rolling_fp"),
        array_min(col("th")).as("min_fp"))
  }
}
