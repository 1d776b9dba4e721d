package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableMath.gridSnap

/** Text-quality operators for training-data pipelines: language ID,
  * quality scoring, token statistics. All heuristics are deterministic
  * integer/ratio computations over built-in expressions, so they are
  * SQL-expressible (oracle-checkable) and stay inside codegen.
  */
object TextAnalysis {

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language heuristic. Public knowledge (most-frequent function words).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "y", "en", "los", "que", "un"),
    "de" -> Seq("der", "die", "das", "und", "von", "mit", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un"))

  private def hitCount(toksCol: String, words: Seq[String]): Column = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter($toksCol, t -> t IN ($inList)))")
  }

  /** Language ID: argmax of per-language stopword hit ratios, 'unknown'
    * below `minRatio`. Adds `predicted_lang`.
    */
  def languageId(df: DataFrame, textCol: String, minRatio: Double = 0.05): DataFrame = {
    val withToks = df.withColumn("_toks", TextFunctions.tokens(lower(col(textCol))))
    val langs = Seq("en", "es", "de", "fr")
    val withHits = langs.foldLeft(withToks) { (d, l) =>
      d.withColumn(s"_h_$l", hitCount("_toks", stopwords(l)))
    }
    // argmax with deterministic tie-break (first of en,es,de,fr wins —
    // a chained when() evaluates in priority order).
    val best = langs.map(l => col(s"_h_$l")).reduce((a, b) => greatest(a, b))
    val conds = langs.map { l =>
      (col(s"_h_$l") === best &&
        col(s"_h_$l").cast("double") / size(col("_toks")) >= minRatio, lit(l))
    }
    val predOrdered = conds.tail
      .foldLeft(when(conds.head._1, conds.head._2)) { (acc, c) => acc.when(c._1, c._2) }
      .otherwise(lit("unknown"))
    withHits
      .withColumn("predicted_lang", predOrdered)
      .drop((Seq("_toks") ++ langs.map(l => s"_h_$l")): _*)
  }

  /** Quality score in [0,10] from length/punctuation/stopword signals
    * (the reference's completeness/complexity scoring shape,
    * `streaming_processor.py:260-283`, generalized to documents).
    * All inputs are exact integers; one rounded double at the end.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nToks = size(TextFunctions.tokens(t))
    val nChars = length(t)
    val nPunct = size(TextFunctions.regexTokens(t)) - size(split(trim(t), " "))
    val stopHits = hitCount("_toks", stopwords("en"))
    df.withColumn("_toks", TextFunctions.tokens(lower(t)))
      .withColumn("quality_score", gridSnap(
        least(nToks.cast("double") * 0.2, lit(4.0)) +
          least(stopHits.cast("double") / nToks * 10.0, lit(4.0)) +
          when(nChars > 50, 2.0).otherwise(nChars.cast("double") / 25.0) -
          least(greatest(nPunct.cast("double"), lit(0.0)) * 0.5, lit(2.0)), 6))
      .drop("_toks")
  }

  /** Jensen–Shannon divergence (in bits) between the token
    * distributions of two corpus slices — the symmetric, bounded
    * [0, 1] drift measure for mixing audits: "does the new crawl's
    * vocabulary match the training mix?", "did the validation slice
    * drift from train?". KL is undefined the moment either side has
    * a token the other lacks; JSD's mixture midpoint makes missing
    * tokens contribute their ½·p·log2 2 = p/2 mass instead of ∞.
    *
    * Shape: one tokenize pass over the two slices together, a count
    * aggregation per (slice, token), a full-outer self-alignment on
    * the token (missing side = 0), and a DECIMAL-summed per-token
    * term — nothing corpus-quadratic, and the alignment relation is
    * vocabulary-sized. Probabilities are double divisions of exact
    * integer counts; each term's expression tree is mirrored
    * token-for-token in the oracle; final 6 dp round. Returns 1 row:
    * (jsd_bits, n_a, n_b) — token occurrence totals per slice.
    */
  def jensenShannon(df: DataFrame, sliceCol: String, textCol: String,
                    sliceA: String, sliceB: String): DataFrame = {
    val toks = df
      .where(col(sliceCol).isin(sliceA, sliceB))
      .select(col(sliceCol).as("_s"),
        explode(TextFunctions.tokens(
          TextFunctions.normalized(col(textCol)))).as("_tok"))
      .where(length(col("_tok")) > 0)
      .groupBy("_s", "_tok").agg(count(lit(1)).as("_c"))
    jsdFromCounts(
      toks.where(col("_s") === sliceA).select(col("_tok"), col("_c").as("_ca")),
      toks.where(col("_s") === sliceB).select(col("_tok"), col("_c").as("_cb")))
  }

  /** JSD core over two (token, count) relations — shared by the batch
    * form above and the streaming drift monitor
    * ([[graft.stream.Streaming.driftMonitorBatchStep]]). An EMPTY
    * side yields a null jsd_bits (nothing to compare yet) rather than
    * a 0/0.
    */
  private[graft] def jsdFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 16)
    val totals = a.agg(coalesce(sum(col("_ca")), lit(0L)).as("_na"))
      .crossJoin(b.agg(coalesce(sum(col("_cb")), lit(0L)).as("_nb")))
    val aligned = graft.operators.Joins.withScalar(
      a.join(b, Seq("_tok"), "full_outer")
        .select(coalesce(col("_ca"), lit(0L)).as("_ca"),
          coalesce(col("_cb"), lit(0L)).as("_cb")), totals)
    // zero-total sides guard their division (ANSI mode): an empty side
    // has only zero counts, so its probability is exactly 0 — the
    // expression never changes a both-sides-live result
    val p = when(col("_na") > 0,
      col("_ca").cast("double") / col("_na")).otherwise(lit(0.0))
    val q = when(col("_nb") > 0,
      col("_cb").cast("double") / col("_nb")).otherwise(lit(0.0))
    val m = (p + q) / lit(2.0)
    val term =
      when(col("_ca") > 0, p / lit(2.0) * log2(p / m)).otherwise(lit(0.0)) +
        when(col("_cb") > 0, q / lit(2.0) * log2(q / m)).otherwise(lit(0.0))
    val summed = aligned
      .groupBy(col("_na"), col("_nb"))
      .agg(gridSnap(sum(term.cast(dec)).cast("double"), 6).as("_j"))
      .select(
        when(col("_na") > 0 && col("_nb") > 0, col("_j")).as("jsd_bits"),
        col("_na").as("n_a"), col("_nb").as("n_b"))
    // BOTH sides empty → no aligned rows at all — surface the one-row
    // null verdict instead of an empty frame (one empty side still
    // aligns against the other and flows through the null-guard above)
    val fallback = totals.select(lit(null).cast("double").as("jsd_bits"),
      col("_na").as("n_a"), col("_nb").as("n_b"))
      .where(col("n_a") === 0 && col("n_b") === 0)
    summed.unionByName(fallback)
  }

  /** Per-document top-k keyword extraction: the k highest-TF-IDF terms
    * of each document (ties → lexicographically first term) — the
    * tagging/routing primitive on top of [[tfidf]] (auto-labeling
    * corpus slices, building sparse retrieval keys).
    *
    * Scale shape: no corpus-wide window — the per-document term list
    * is bounded by the document's own vocabulary, so the
    * collect+sort_array+slice runs in per-group memory proportional
    * to ONE document, and the shuffle is the tfidf relation it
    * already consumes. Ordering is normalized by `sort_array` (the
    * collected order never matters). Returns (idCol, rank, term,
    * tfidf), rank 1-based.
    */
  def topKeywords(df: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame = {
    require(k > 0, s"keyword count must be positive, got $k")
    tfidf(df, idCol, textCol)
      .groupBy(col(idCol))
      .agg(slice(sort_array(collect_list(
          struct((-col("tfidf")).as("nt"), col("term").as("t")))), 1, k)
        .as("_top"))
      .select(col(idCol), posexplode(col("_top")).as(Seq("_p", "_e")))
      .select(col(idCol), (col("_p") + 1).cast("long").as("rank"),
        col("_e.t").as("term"), gridSnap(-col("_e.nt"), 6).as("tfidf"))
  }

  /** Token statistics: whitespace tokens vs regex (BPE-ish) tokens. */
  def tokenStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(TextFunctions.tokens(col(textCol))))
      .withColumn("n_re_tokens", size(TextFunctions.regexTokens(col(textCol))))
      .withColumn("n_chars_obs", length(col(textCol)))

  /** Gopher/C4-style repetition heuristics — the quality gates that
    * catch boilerplate and degenerate generations before training:
    *
    *   - `dup_token_frac`: 1 − distinct/total tokens (per-row
    *     `array_distinct`, no shuffle);
    *   - `top_bigram_frac`: the most frequent bigram's share of all
    *     bigrams (explode + two keyed aggregations — the per-doc
    *     bigram table never materializes globally);
    *   - `mean_token_len`: Σ token length / tokens, computed as
    *     `length(concat_ws('', toks))` — codegen string length, no
    *     per-element lambda.
    *
    * Bigrams stay token STRINGS (`a b`), not hashes, so the identical
    * SQL runs in the DuckDB oracle. Documents with < 2 tokens are
    * excluded (no bigram frame). All ratios rounded at 6 dp.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("n_toks", size(col("toks")))
    val topBigram = base
      .select(col(idCol), col("n_toks"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("bg"))
      .groupBy(col(idCol), col("n_toks"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n_toks"))
      .agg(max(col("c")).as("max_bg"))
    base.join(topBigram, Seq(idCol, "n_toks"))
      .select(col(idCol), col("n_toks"),
        gridSnap(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
          / col("n_toks"), 6).as("dup_token_frac"),
        gridSnap(col("max_bg").cast("double") / (col("n_toks") - 1), 6)
          .as("top_bigram_frac"),
        gridSnap(length(concat_ws("", col("toks"))).cast("double")
          / col("n_toks"), 6).as("mean_token_len"))
  }

  /** PII redaction: e-mail and phone patterns replaced with typed
    * placeholder tags, plus per-row match counts (the audit trail a
    * compliance pass needs). Patterns are backreference-free character
    * classes, valid in both Java regex (Spark) and RE2 (DuckDB), so the
    * operator is oracle-checkable verbatim. Pure per-row
    * `regexp_replace`/`regexp_extract_all` — codegen, no shuffle.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\d{3}[-.]\\d{3}[-.]\\d{4}"

  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(phonePattern), lit(0))))
      .withColumn("redacted_text",
        regexp_replace(regexp_replace(col(textCol), emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))

  /** TF-IDF term scores — the classic relevance / keyword-extraction
    * primitive for corpus curation. tf = term count / doc length,
    * idf = ln(N / df). Three hash aggregations (term-in-doc, doc
    * length, document frequency) + joins; the df relation is
    * vocabulary-sized, so at 100 TB Catalyst/AQE broadcasts it when it
    * fits and shuffles on the term key otherwise — no driver-side
    * vocabulary. Exact integer counts; one rounded double at the end.
    */
  /** Shared (doc, term) explode and (doc, term, tf) aggregation — the
    * common front of [[tfidf]] and [[unigramLogProb]]; one place pins
    * the tokenization convention the oracles replay.
    */
  /** The tokenization both log-prob sides and tfidf share — changing
    * it here changes scorer and reference together (they must agree,
    * or every token looks OOV).
    */
  private def termColumn(textCol: String): Column =
    explode(TextFunctions.tokens(lower(col(textCol)))).as("term")

  private def termFrequencies(df: DataFrame, idCol: String,
                              textCol: String): (DataFrame, DataFrame) = {
    val toks = df.select(col(idCol), termColumn(textCol))
    (toks, toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")))
  }

  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (toks, tf) = termFrequencies(df, idCol, textCol)
    val docLen = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n_toks"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.select(col(idCol)).distinct().agg(count(lit(1)).as("n_docs"))
    tf.join(docLen, idCol)
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        gridSnap(col("tf") / col("n_toks") * log(col("n_docs") / col("df")), 6))
      .select(col(idCol), col("term"), col("tfidf"))
  }

  /** Unigram log-probability quality score — the cheap approximation of
    * KenLM-style perplexity filtering: score each document by the mean
    * log probability of its tokens under the corpus's own unigram
    * distribution. Add-one smoothing keeps the formula well-defined at
    * c = 0, so the same arithmetic extends unchanged to a two-corpus
    * variant (scoring new documents against a stored reference
    * distribution) — here the corpus scores itself, so every token has
    * c ≥ 1. Low scores flag gibberish/rare-token soup; high scores flag
    * natural, typical text — the standard second quality gate after
    * the rule-based heuristics.
    *
    * Scale shape: the frequency relation is vocabulary-sized; the
    * (doc, term, tf) relation joins it ON term — a shuffle on a
    * near-uniform key (AQE broadcasts the frequency side while it
    * fits); the grand totals are a 1-row broadcast. Parity discipline:
    * each term's `tf·ln p` is cast to DECIMAL(28,12) BEFORE the per-doc
    * sum, so the aggregation is exact decimal addition —
    * order-independent across partitionings and engines — with one
    * double division + round at the end (the entropy pattern).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // self-scoring = scoring against one's own distribution (every
    // token is in-vocabulary, so the left join below always matches)
    unigramLogProbAgainst(df, idCol, textCol, df, textCol)

  /** Two-corpus form of [[unigramLogProb]]: score `df`'s documents
    * against `ref`'s unigram distribution — the production shape
    * (tomorrow's crawl scored against the trusted corpus). Tokens
    * absent from the reference take the add-one floor 1/(N+V), so
    * OOV-heavy documents sink to the bottom of the ranking.
    */
  def unigramLogProbAgainst(df: DataFrame, idCol: String, textCol: String,
                            ref: DataFrame, refTextCol: String): DataFrame = {
    // withColumn/agg silently replace same-named columns — refuse an
    // idCol that collides with the working/output names (the Ranking
    // reserved-name discipline).
    val reserved = Set("term", "tf", "c", "n_total", "v_size",
      "_lp", "_slp", "n_toks", "avg_logprob")
    require(!reserved.contains(idCol),
      s"idCol '$idCol' collides with unigramLogProb's working/output " +
        s"names (${reserved.mkString(", ")}) — rename it first")
    val (_, tf) = termFrequencies(df, idCol, textCol)
    val freq = ref.select(termColumn(refTextCol))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val totals = freq.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("v_size"))
    tf.join(freq, Seq("term"), "left") // left: OOV terms keep their rows
      .crossJoin(broadcast(totals))
      .withColumn("_lp",
        (col("tf") * log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n_total") + col("v_size")).cast("double")))
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_toks"), sum(col("_lp")).as("_slp"))
      .select(col(idCol), col("n_toks"),
        gridSnap(col("_slp").cast("double") / col("n_toks"), 6).as("avg_logprob"))
  }

  /** Sliding-window document chunking: split each document into
    * overlapping token windows of `chunkTokens` tokens every `stride`
    * tokens — the step between curation and sequence packing when
    * documents exceed the model's context length. Window starts are
    * `1, 1+stride, …` up to the last full-window start, plus the final
    * full window itself so the document's tail is always covered (the
    * HF-datasets convention). One row per (doc, window), identified by
    * the window's 1-based `start_tok` — a pure function of the token
    * count, so the output is layout- and engine-independent.
    *
    * Scale shape: pure per-row narrow work — tokenize once, build the
    * (tiny) start list with `sequence`, `explode`, `slice`. No shuffle,
    * no state, fully parallel; the explode fan-out is bounded by
    * n/stride rows per doc. Everything is built-in Catalyst HOFs on one
    * pass over the text.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens and stride must be positive, got $chunkTokens/$stride")
    // withColumn silently replaces same-named input columns — refuse
    // inputs that collide with the working/output names (the Ranking
    // reserved-name discipline).
    val reserved = Set("_toks", "_n", "start_tok", "_chunk",
      "n_chunk_tokens", "chunk_fp")
    val clash = df.columns.filter(c => reserved.contains(c) && c != idCol)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with chunkDocuments' " +
        s"working/output names (${reserved.mkString(", ")}) — rename them first")
    df.withColumn("_toks", TextFunctions.tokens(col(textCol)))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") >= 1)
      .withColumn("start_tok", explode(expr(
        s"""array_distinct(concat(
           |  sequence(1, greatest(1, _n - $chunkTokens + 1), $stride),
           |  array(greatest(1, _n - $chunkTokens + 1))))""".stripMargin)))
      .withColumn("_chunk", expr(s"slice(_toks, start_tok, $chunkTokens)"))
      .select(col(idCol), col("start_tok").cast("long").as("start_tok"),
        size(col("_chunk")).as("n_chunk_tokens"),
        md5(array_join(col("_chunk"), " ")).as("chunk_fp"))
  }

  /** Polynomial rolling-hash document fingerprint (base-31 Horner fold
    * over the code points of `textCol`, mod 1e9+7) — the cheap
    * order-sensitive fingerprint; md5 variant in TextFunctions.
    * A native codegen'd Catalyst expression
    * ([[graft.functions.StringPolyHash]]): the earlier
    * `aggregate`/`substring` higher-order-function form evaluated its
    * lambda interpreted per character and re-entered the string per
    * index. Same values (the modulus keeps both engines overflow-free;
    * DuckDB's `list_reduce` oracle agrees exactly).
    */
  def rollingHash(textCol: String): Column =
    graft.functions.HashFunctions.polyHash(col(textCol))

  /** Distributed BPE vocabulary trainer (byte-pair encoding, public
    * Sennrich et al. 2016 arXiv:1508.07909): learn `numMerges` merge
    * rules, highest-frequency adjacent symbol pair first.
    *
    * The scale trick is WHAT the iterations run on: BPE statistics are
    * a function of the word-frequency table, not the corpus — so the
    * corpus is scanned ONCE (tokenize → groupBy word → count; at web
    * scale ~10⁵-10⁶ distinct words from 10¹² tokens), and every merge
    * iteration runs on the |V|-row vocab relation. Per iteration: an
    * adjacent-pair explode + weighted count (one hash shuffle on the
    * pair), a 1-row TakeOrdered argmax (ties broken on (pair_count
    * DESC, left ASC, right ASC) — deterministic on any layout), a
    * broadcast of that single row, and a map-side fold that rewrites
    * each word's symbol array left-to-right (the standard greedy
    * non-overlapping merge: "aaaa" under (a,a) → (aa)(aa)). The HOF
    * fold evaluates interpreted, which is irrelevant at vocab scale —
    * the corpus-sized pass is pure codegen. `localCheckpoint` per
    * iteration truncates the k-deep lineage.
    *
    * Returns the merge table (merge_rank, left, right, merged,
    * pair_count) — the artifact a tokenizer ships.
    */
  /** BM25 ranking (public Robertson–Walker Okapi BM25, Lucene-style
    * idf = ln(1 + (N − df + ½)/(df + ½))) of documents against a term
    * query — the retrieval scorer a training pipeline uses for
    * hard-negative mining and eval-set construction; the reference's
    * search is substring containment (`api/main.py:135`), which cannot
    * rank.
    *
    * Scale shape: the only corpus-sized pass is the tokenize; term
    * frequencies are filtered to the query's terms BEFORE the
    * aggregation (|docs|·|q| rows max), document frequencies and
    * length stats are broadcast-sized relations, and the final score
    * is one DECIMAL-cast sum per document (order-independent) ending
    * in TakeOrdered. All arithmetic is double with 6 dp rounding —
    * engine-portable.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "query must have at least one term")
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(
        TextFunctions.normalized(col(textCol)))).as("term"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val scal = dl.agg(count(lit(1)).as("_N"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("_avgdl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    tf.join(broadcast(dft), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(scal))
      .withColumn("_idf", log(lit(1.0)
        + (col("_N") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5))))
      .withColumn("_s", col("_idf") * (col("tf") * lit(k1 + 1))
        / (col("tf") + lit(k1)
          * (lit(1.0 - b) + lit(b) * col("dl") / col("_avgdl"))))
      .groupBy(col(idCol))
      .agg(gridSnap(sum(col("_s")
        .cast(org.apache.spark.sql.types.DecimalType(38, 16))).cast("double"), 6)
        .as("bm25"))
      .orderBy(desc("bm25"), asc(idCol))
      .limit(topK)
  }

  /** The (word-symbol-array, frequency) relation BPE iterates on —
    * the corpus's ONLY full scan in the whole training run.
    */
  private def bpeWordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(
        TextFunctions.normalized(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(split(col("word"), "").as("toks"), col("n"))

  /** Weighted adjacent-pair counts of a symbolized word table. */
  private def bpePairs(words: DataFrame): DataFrame =
    words.filter(size(col("toks")) >= 2)
      .select(col("n"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  j -> struct(element_at(toks, j) AS l, element_at(toks, j + 1) AS r))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("n")).as("pair_count"))

  /** Iteration-0 pair statistics (the relation the first argmax runs
    * on) — exposed for profiling and oracle checks.
    */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame =
    bpePairs(bpeWordTable(df, textCol))

  /** Apply learned BPE merges to a corpus. The corpus-scale path is
    * pure relational: tokenize → hash-join each word against the
    * ENCODED VOCAB dictionary → order-preserving reassembly per
    * document. The k-deep interpreted merge fold only ever runs on the
    * distinct-word relation (the memoization that makes BPE encode
    * viable at 100 TB — encoding 10¹² tokens costs one join, not 10¹²
    * fold evaluations); a production encoder would swap the fold for a
    * codegen'd longest-match pass over the same dictionary.
    *
    * `merges` is [[bpeTrain]]'s output (stays relational — each rank is
    * broadcast like a centroid row, never collected). Returns
    * (idCol, bpe_toks array<string>).
    */
  def encodeBpe(df: DataFrame, idCol: String, textCol: String,
                merges: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"merge count must be positive, got $numMerges")
    val docWords = df.select(col(idCol),
        posexplode(TextFunctions.tokens(
          TextFunctions.normalized(col(textCol)))).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    var vocab = docWords.select("word").distinct()
      .withColumn("toks", split(col("word"), ""))
    for (i <- 1 to numMerges) {
      vocab = vocab
        .crossJoin(broadcast(merges.filter(col("merge_rank") === i)
          .select(col("left").as("_l"), col("right").as("_r"))))
        .withColumn("toks", expr(
          """aggregate(toks, CAST(array() AS array<string>),
            |  (acc, x) -> CASE
            |    WHEN size(acc) > 0 AND element_at(acc, -1) = _l AND x = _r
            |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(_l, _r)))
            |    ELSE concat(acc, array(x)) END)""".stripMargin))
        .drop("_l", "_r")
    }
    docWords.join(vocab, "word")
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        e => e.getField("toks"))).as("bpe_toks"))
  }

  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"merge count must be positive, got $numMerges")
    var words = bpeWordTable(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (rank <- 1 to numMerges) {
      val best = bpePairs(words)
        .orderBy(desc("pair_count"), asc("left"), asc("right"))
        .limit(1)
        .select(lit(rank).as("merge_rank"), col("left"), col("right"),
          concat(col("left"), col("right")).as("merged"), col("pair_count"))
        .localCheckpoint()
      merges += best
      words = words
        .crossJoin(broadcast(best.select(col("left").as("_l"), col("right").as("_r"))))
        .withColumn("toks", expr(
          """aggregate(toks, CAST(array() AS array<string>),
            |  (acc, x) -> CASE
            |    WHEN size(acc) > 0 AND element_at(acc, -1) = _l AND x = _r
            |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(_l, _r)))
            |    ELSE concat(acc, array(x)) END)""".stripMargin))
        .drop("_l", "_r")
        .localCheckpoint()
    }
    merges.reduce(_ unionByName _)
  }
}
