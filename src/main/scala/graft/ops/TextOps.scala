package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, counting, quality scoring, language ID, fingerprinting.
  * Everything is built from codegen'd built-ins / higher-order functions —
  * no UDFs — so the hot path stays inside whole-stage codegen and scales
  * linearly with no shuffle (all per-row).
  */
object TextOps {

  /** Whitespace tokenization (single-space separated corpus). NOTE:
    * empty text tokenizes to one empty token — the SQL `string_split`
    * semantics the DuckDB oracles share — so an empty document counts as
    * a 1-token doc throughout the stats/quality stack; filter
    * `length(text) > 0` upstream where that matters. */
  def tokens(text: Column): Column = split(text, " ", -1)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Adjacent word bigrams; empty array for single-token docs. */
  def wordBigrams(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
  }

  /** Adjacent word k-shingles as strings; empty array for docs shorter
    * than `k` tokens. String (not hashed) shingles so cross-engine
    * oracles can recompute them; the dedup stack's narrow-shuffle twin
    * is [[graft.ops.Dedup.shingleHashes]]. */
  def wordShingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    when(size(t) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(t) - (k - 1)),
        i => array_join(slice(t, i, lit(k)), " ")))
  }

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val stops = filter(t, tok => tok.isInCollection(stopwords))
    size(stops) / size(t)
  }

  /** Heuristic quality score in [0,1]: non-stopword density × length
    * credit (docs shorter than `fullCreditTokens` are discounted). */
  def qualityScore(text: Column, stopwords: Seq[String],
                   fullCreditTokens: Int = 200): Column =
    (lit(1.0) - stopwordRatio(text, stopwords)) *
      (least(tokenCount(text), lit(fullCreditTokens)) / lit(fullCreditTokens.toDouble))

  /** BPE-ish token-count estimate without a tokenizer model: word count
    * plus a subword surcharge of ~1 token per 6 chars of long words. */
  def estimatedBpeTokens(text: Column): Column = {
    val longWordChars =
      aggregate(tokens(text), lit(0L),
        (acc, tok) => acc + when(length(tok) > 6, length(tok).cast("long") - 6).otherwise(0L))
    tokenCount(text) + (longWordChars / lit(6)).cast("long")
  }

  /** Order-sensitive 64-bit document fingerprint: polynomial rolling hash
    * over per-token xxhash64 values (detects reordering that set-based
    * hashes miss). Wrapping arithmetic via the native [[PolyHash64]]
    * expression — the column-arithmetic equivalent overflows under ANSI
    * mode. Per-row, distributable, no state. */
  def fingerprint(text: Column): Column =
    graft.functions.PolyHash64(graft.functions.XxHash64Array(tokens(text)))

  /** Deterministic content-hash train/val split: a document's split is
    * decided by the first byte of the md5 of its TEXT — not its id — so
    * byte-identical duplicates can never straddle the split (the exact-dup
    * leakage guard every training pipeline needs), and the assignment is
    * stable under repartitioning and replay with no RNG anywhere.
    * `trainFrac` is quantized to 256ths (the hex-prefix comparison);
    * must be in (0, 1). */
  def contentSplit(text: Column, trainFrac: Double = 0.9): Column = {
    require(trainFrac > 0 && trainFrac < 1, s"trainFrac in (0,1), got $trainFrac")
    // 3-hex-digit cut vs '0'-padded prefix: fractions near 1 quantize to
    // 256 = "100", which a 2-digit compare would order BELOW most
    // prefixes ("ff" < "100" is false lexicographically) and flip ~93% of
    // the corpus to "val"
    val cut = f"${math.min(math.round(trainFrac * 256).toInt, 256)}%03x"
    when(concat(lit("0"), substring(md5(text.cast("binary")), 1, 2)) < lit(cut), "train")
      .otherwise("val")
  }

  /** Deterministic stratified sampling: keep a row iff the first hex byte
    * of md5(text) falls under its group's quantized rate — the
    * training-data-mix primitive (e.g. keep 100% of rare languages, 10%
    * of the dominant one). Same properties as [[contentSplit]]: no RNG,
    * stable under repartitioning/replay, duplicates sampled identically;
    * rates quantized to 1/256ths. Unknown group keys → `defaultFrac`. */
  def stratifiedKeep(text: Column, group: Column, rates: Map[String, Double],
                     defaultFrac: Double = 0.0): Column = {
    def cut(f: Double) = {
      require(f >= 0 && f <= 1, s"rate must be in [0,1], got $f")
      f"${math.min(math.round(f * 256).toInt, 256)}%03x"
    }
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(cut(defaultFrac))) {
      case (acc, (k, f)) => when(group === k, lit(cut(f))).otherwise(acc)
    }
    // 3-hex-digit zero-padded cut ("0e6") vs 2-digit hash prefix keeps the
    // string compare numeric even at rate 1.0 ("100" > "ff"... padded to
    // compare as "0ff" < "100")
    concat(lit("0"), substring(md5(text.cast("binary")), 1, 2)) < rate
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword-overlap
    * language-ID heuristic. Real deployments plug in fastText-style models;
    * the *engine shape* (argmax over per-language scores, one pass, no
    * shuffle) is what matters here. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Per-key union length of inclusive integer intervals `[s, e]` — the
    * all-integer running-max sweep dd14 uses for duplicated-span
    * coverage: intervals sorted by start within each key's window, each
    * contributing `max(0, e − max(prevMaxEnd, s−1))`. Window state is one
    * key's intervals; exact on any partitioning (integer math only).
    *
    * @param df (keyCol, sCol, eCol) rows, `1 ≤ s ≤ e`, both integral
    *           (the missing-prev sentinel is 0, so starts must be ≥ 1)
    * @return (key, covered) — one row per key present in `df`
    */
  def intervalUnionLength(df: org.apache.spark.sql.DataFrame, keyCol: String,
                          sCol: String, eCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol).as("key"), col(sCol).cast("long").as("s"),
        col(eCol).cast("long").as("e"))
      .withColumn("pmax", max(col("e")).over(w))
      .withColumn("contrib", greatest(lit(0L),
        col("e") - greatest(coalesce(col("pmax"), lit(0L)), col("s") - 1L)))
      .groupBy(col("key")).agg(sum(col("contrib")).as("covered"))
  }

  /** Crawl-style URL canonicalization — the dedup key a CommonCrawl-scale
    * curation run groups on before content hashing. Rules (all pure
    * column ops, codegen'd, replayed verbatim by the DuckDB oracle):
    * drop the fragment, drop the scheme (http/https unify), lowercase
    * the HOST ONLY (path case is significant and preserved), strip one
    * leading `www.`, strip one trailing slash from the path, and drop
    * tracking parameters (`utm_*`, `fbclid`, `gclid`) — matched on the
    * parameter NAME (the part before `=`), so a bare valueless `?fbclid`
    * is dropped too — while KEEPING real query parameters in their
    * original order. Userinfo (`user@host`) and explicit ports are NOT
    * normalized: they stay inside the lowercased authority, so
    * `host:8080` and `host` remain distinct keys by design. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val host = regexp_replace(lower(regexp_extract(noScheme, "^([^/?]+)", 1)),
      "^www\\.", "")
    val pathq = regexp_replace(noScheme, "^[^/?]+", "")
    val path = regexp_replace(regexp_replace(pathq, "\\?.*$", ""), "/$", "")
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val kept = array_join(
      filter(split(query, "&", -1), p => {
        val name = regexp_extract(p, "^([^=]*)", 1)
        !(substring(name, 1, 4) === "utm_" ||
          name === "fbclid" || name === "gclid")
      }), "&")
    concat(host, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Predicted language = argmax over profile-overlap scores; ties broken
    * deterministically by greatest language code (struct max semantics). */
  def languageId(text: Column): Column = {
    val t = tokens(text)
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      struct(size(filter(t, tok => tok.isInCollection(stops))).as("score"),
             lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }
}
