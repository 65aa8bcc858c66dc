package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, content fingerprinting.
  *
  * All pure Column expressions (codegen'd, no UDFs); each has an exact
  * DuckDB-SQL oracle twin in [[graft.SparkEntry.oracleSql]].
  */
object TextAnalysis {

  /** Stopword lists for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny and fixed: the operator contract is "deterministic
    * heuristic", not model-grade LID.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "no"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que"))

  private def toks(textCol: Column): Column = split(textCol, " ")

  /** Language ID: per-language stopword hit count over token occurrences;
    * argmax with (1) 'und' (undetermined) when no list matches, (2)
    * alphabetical language order as tie-break. One explode + one groupBy
    * shuffle on doc id.
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("w"))
    val langs = stopwords.keys.toSeq.sorted
    val scoreAggs = langs.map(l =>
      sum(when(col("w").isin(stopwords(l): _*), 1).otherwise(0)).as(s"s_$l"))
    val scored = tok.groupBy(col("doc_id")).agg(scoreAggs.head, scoreAggs.tail: _*)
    val best = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, rest) =>
      when(best > 0 && col(s"s_$l") === best, lit(l)).otherwise(rest)
    }
    // foldRight keeps alphabetical priority: the FIRST when() in the chain
    // is the alphabetically smallest language.
    scored.select(col("doc_id"), pred.as("pred_lang"))
  }

  /** Quality score in [0,1]: length saturation + type-token ratio +
    * stopword ratio (an n-gram-free proxy for "looks like language").
    * Components exposed for downstream filtering.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("w"))
    val en = stopwords("en")
    val agg = tok.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("w")).as("n_distinct"),
      sum(when(col("w").isin(en: _*), 1).otherwise(0)).as("n_stop"))
    agg.select(
      col("doc_id"),
      col("n_tokens"),
      round(
        lit(0.4) * least(lit(1.0), col("n_tokens") / 25.0) +
          lit(0.4) * (col("n_distinct").cast("double") / col("n_tokens")) +
          lit(0.2) * (col("n_stop").cast("double") / col("n_tokens")),
        4).as("quality"))
  }

  /** Whitespace token count + a BPE-ish subword proxy: count of maximal
    * letter runs, digit runs, and single non-alphanumerics — the classic
    * pre-tokenizer regex. Pure projection, no shuffle.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(toks(col(textCol))).cast("bigint").as("ws_tokens"),
      regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
        .cast("bigint").as("bpe_tokens"))

  /** Content fingerprint: md5 of case-normalized text, plus an 8-hex-char
    * prefix usable as a cluster/shard key. Pure projection.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      md5(lower(col(textCol))).as("fp"),
      substring(md5(lower(col(textCol))), 1, 8).as("fp_prefix"))
}
