package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines:
  * tokenization, shingling, quality metrics, language-ID heuristics,
  * document fingerprinting, and a cross-engine-stable polynomial hash.
  *
  * Everything here is built from `org.apache.spark.sql.functions` /
  * SQL higher-order functions, so it stays inside whole-stage codegen
  * (no Scala UDF boundary, no serialization per row) — at 100 TB the
  * difference between a codegen'd expression and a UDF on the scan
  * path is the whole job.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count (BIGINT for oracle parity). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, single
    * punctuation marks — the boundary split GPT-2-style BPE vocab
    * builds start from. RE2-compatible, so the DuckDB oracle counts
    * with the identical pattern. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Subword-boundary token count under [[BpePattern]] (BIGINT). */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpePattern)).cast("long")

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token-array
    * column; empty array when fewer than n tokens. The guard matters:
    * Spark's sequence(0, -k) would count DOWN (implicit step -1) and
    * produce garbage shingles.
    *
    * PERFORMANCE: `w` must be a bound column (project `tokens(text)`
    * into a column first), NOT the tokens(...) expression itself —
    * higher-order-function lambdas are interpreted and re-evaluate
    * captured expressions per element, so an inline split would re-split
    * the whole document for every element_at (measured 8s → 0.3s on
    * 260k shingles). */
  def shinglesOfTokens(w: Column, n: Int): Column = {
    val idxs = when(size(w) >= n, sequence(lit(0), size(w) - n))
      .otherwise(array().cast("array<int>"))
    transform(idxs, i =>
      concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))
  }

  /** Convenience form over raw text — fine for small inputs; hot paths
    * should materialize tokens and use [[shinglesOfTokens]]. */
  def wordShingles(c: Column, n: Int): Column =
    shinglesOfTokens(tokens(c), n)

  /** Ratio of alphabetic chars, rounded for cross-engine comparison. */
  def alphaRatio(c: Column, scale: Int = 4): Column =
    round(length(regexp_replace(c, "[^A-Za-z]", "")).cast("double") /
      length(c), scale)

  private val StopWords =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** Fraction of tokens that are English stopwords — a cheap quality /
    * language signal used by corpus-filtering pipelines. */
  def stopwordRatio(c: Column, scale: Int = 4): Column = {
    val w = tokens(c)
    val stops = filter(w, t => t.isin(StopWords: _*))
    round(size(stops).cast("double") / size(w), scale)
  }

  /** Mean token length, rounded. */
  def avgTokenLen(c: Column, scale: Int = 4): Column = {
    val w = tokens(c)
    round(aggregate(w, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / size(w), scale)
  }

  /** N-gram-free language-ID heuristic: score languages by marker-word
    * hits. Deterministic and SQL-expressible, so it is oracle-checkable;
    * a production pipeline would swap in a trained classifier behind the
    * same column contract. */
  def langIdHeuristic(c: Column): Column = {
    val t = concat(lit(" "), lower(c), lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => when(t.contains(s" $w "), 1).otherwise(0))
        .reduce(_ + _)
    val en = hits(Seq("the", "and", "of", "is"))
    val de = hits(Seq("der", "die", "und", "ist"))
    val es = hits(Seq("el", "la", "los", "es"))
    val fr = hits(Seq("le", "les", "et", "est"))
    when(de > en && de >= es && de >= fr, "de")
      .when(es > en && es >= fr, "es")
      .when(fr > en, "fr")
      .when(en > 0, "en")
      .otherwise("und")
  }

  /** Whitespace-normalized lowercase text — the canonical form of a
    * document for dedup purposes. Two documents with equal normalized
    * text have equal [[fingerprint]]s, so any metric computed on the
    * normalized text is invariant across a fingerprint class — the
    * property that makes dedup-then-gate pipelines deterministic no
    * matter which duplicate survives. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Document fingerprint: md5 of [[normalizeText]]. Stable across
    * engines (md5 is identical everywhere) and across formatting-only
    * edits. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Cross-engine-stable polynomial hash of a string, seeded.
    * h = fold(chars, seed, (a, ch) -> (a*31 + ascii(ch)) % 2^20.
    * Stays in 20 bits so the fold never overflows an int in either
    * engine (DuckDB BIGINT errors on overflow rather than wrapping —
    * Java would wrap silently, so the mod keeps both in lockstep). */
  def polyHash(c: Column, seed: Int, bits: Int = 20): Column = {
    val m = 1 << bits
    aggregate(
      transform(split(c, ""), ch => ascii(ch)),
      lit(seed),
      (a, x) => (a * 31 + x) % m)
  }
}
