package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Base-hash family for the sketching operators (MinHash banding,
  * SimHash). The VALUES of these hashes decide the result (min over
  * permutations, sketch bits), unlike the Jaccard/decontamination
  * paths where any injective key works — so the family is a visible
  * parameter, not an implementation detail.
  */
sealed trait HashFamily
object HashFamily {
  /** xxhash64 — the production default: fastest, codegen'd, 64-bit. */
  case object Xx64 extends HashFamily

  /** 60-bit hash from the first 15 hex digits of md5 — bit-identical
    * in ANY engine with md5 (DuckDB, Postgres, Python...), which makes
    * sketch results cross-checkable against an independent SQL oracle.
    * Four fewer effective bits than [[Xx64]] — immaterial for banding
    * or sketch quality, and the positive 60-bit range sidesteps
    * signed-shift divergence across engines.
    */
  case object Md5Portable extends HashFamily
}

/** Shared text-pipeline column builders. Everything here is built-in
  * Catalyst expressions (codegen'd, no UDFs) so the hot path stays
  * inside whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** SQL snippet hashing expression `x` (a string) under `family`. */
  private[textops] def hashSql(x: String, family: HashFamily): String =
    family match {
      case HashFamily.Xx64 => s"xxhash64($x)"
      case HashFamily.Md5Portable =>
        s"CAST(conv(substring(md5($x), 1, 15), 16, 10) AS BIGINT)"
    }

  /** Whitespace-normalized, lowercased canonical form for fingerprinting. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** MD5 content fingerprint of the canonical form — the exact-dedup key.
    * 128 bits ⇒ collision-free in practice at 100 TB (~2^64 birthday bound).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Markup-to-text for web-scraped corpora: drop script/style blocks
    * wholesale, strip remaining tags, decode the five ubiquitous named
    * entities (+ numeric apostrophe), collapse whitespace. Pure
    * codegen'd string expressions — no parser, no UDF — which is the
    * right trade at 100 TB: a DOM parse is ~100× the cost and the
    * training-data gates downstream (quality, repetition, langid) are
    * robust to the residual imperfections of regex stripping. The
    * regexes are RE2-compatible (no backtracking pathologies) and
    * engine-portable, so the DuckDB oracle replays them identically.
    */
  def stripMarkup(html: Column): Column = {
    // The opener's tag name must end at '>' or an attribute delimiter —
    // RE2 has no lookahead (and \b passes hyphens: <style\b matches
    // <style-guide>), so the delimiter is an explicit alternation. The
    // closer requires an exact tag. A script closed by </style> (or
    // vice versa) still ends the block early — the documented limit of
    // regex stripping (RE2 has no backreferences to pair tags).
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)(>|[ \\t\\n\\r/][^>]*>).*?</(script|style)[ \\t\\n\\r]*>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    // &amp; decodes LAST: decoding it first would turn double-escaped
    // text (&amp;lt; — a page showing the literal string "&lt;") into
    // &lt; and then wrongly decode that too.
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    // explicit class, not \s: Java \s includes U+000B, RE2's does not —
    // the explicit class makes Spark and the DuckDB oracle byte-identical
    trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** BPE-ish regex tokens: words, digit runs, single punctuation. */
  val tokenRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(tokenRegex), lit(0))

  /** Distinct (id, shingle-hash) rows — the input relation for
    * Jaccard/MinHash candidate joins. `n`-word shingles keep the
    * self-join sparse: unigrams over a small vocabulary would make it
    * quadratic, while 3-shingles collide only for genuinely similar
    * text.
    *
    * Shingles are `xxhash64` of the n-token slice, never materialized
    * as strings: every downstream shuffle/join carries 8-byte longs.
    * Hash-distinct equals text-distinct up to xxhash64 collisions
    * (~2^32 distinct shingles birthday bound — the same assumption
    * MinHash itself rests on). Deliberately explode + global
    * `.distinct()` rather than a per-doc `array_distinct`: the
    * explode/hash path stays inside whole-stage codegen and the
    * distinct's partial aggregation dedups map-side, so the shuffle
    * carries ~one row per distinct (id, shingle) — measured ~1.7×
    * faster than the interpreted higher-order-function variant at
    * sf0.1.
    */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int,
                   family: HashFamily = HashFamily.Xx64): DataFrame = {
    // Xx64 hashes the token slice directly (no string materialization);
    // the portable family hashes the space-joined shingle string — the
    // exact form a SQL oracle can reproduce from its own tokenizer.
    val sh = family match {
      case HashFamily.Xx64 => s"xxhash64(slice(toks, i + 1, $n))"
      case HashFamily.Md5Portable =>
        hashSql(s"array_join(slice(toks, i + 1, $n), ' ')", family)
    }
    val toks = tokens(col(textCol))
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> $sh)"))
        .as("shingle"))
      .distinct()
  }
}
