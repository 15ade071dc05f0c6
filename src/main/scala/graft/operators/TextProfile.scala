package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Repetition profiling for corpus quality filtering — the standard
  * cheap "repetition" signals LLM-data pipelines gate on (duplicate
  * n-gram fraction and top-n-gram fraction in the Gopher-rules style,
  * type-token ratio from the lexical-diversity literature): documents
  * dominated by a few repeated phrases are low-quality training data
  * and are filtered before any expensive dedup runs.
  */
object TextProfile {

  /** Per-document repetition signals over word unigrams and bigrams.
    * Returns one row per document with >= 2 tokens:
    *  - n_tokens, distinct_tokens and ttr_bp (type-token ratio)
    *  - n_bigrams, top_bigram_n (occurrences of the most frequent
    *    bigram) and top2_bp (its share of all bigram occurrences)
    *  - dup2_bp (share of bigram occurrences whose bigram occurs
    *    more than once)
    *
    * All ratio columns are integer basis points,
    * floor(10000·a/b) — identical IEEE division then floor on any
    * engine, so results are bit-exact cross-engine (a round() on
    * the raw double diverges on ties).
    *
    * Scale shape: unigram stats are narrow (size/array_distinct per
    * row, no shuffle); bigram occurrences explode to (id, gram) and
    * aggregate twice — shuffle keys (id, gram) then (id), both
    * bounded by document length × corpus size, the same budget as
    * every shingle pipeline here. The explode feeds from a
    * materialized token array (the interpreted-HOF re-evaluation trap
    * documented on shinglesOfTokens). */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__w"))
    val uni = toks.select(col(idCol),
      size(col("__w")).cast("long").as("n_tokens"),
      size(array_distinct(col("__w"))).cast("long").as("distinct_tokens"))
    val bi = toks
      .select(col(idCol), explode(shinglesOfTokens(col("__w"), 2)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("n_bigrams"),
        max(col("__c")).as("top_bigram_n"),
        sum(when(col("__c") >= 2, col("__c")).otherwise(lit(0L)))
          .as("__dup_occ"))
    def bp(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      floor(num * lit(10000.0) / den).cast("long")
    uni.join(bi, idCol) // inner: drops docs with < 2 tokens (no bigrams)
      .select(col(idCol), col("n_tokens"), col("distinct_tokens"),
        bp(col("distinct_tokens"), col("n_tokens")).as("ttr_bp"),
        col("n_bigrams"), col("top_bigram_n"),
        bp(col("top_bigram_n"), col("n_bigrams")).as("top2_bp"),
        bp(col("__dup_occ"), col("n_bigrams")).as("dup2_bp"))
  }
}
