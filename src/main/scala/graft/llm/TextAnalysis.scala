package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * quality scoring, stopword/punctuation ratios, and a lightweight
  * language-ID heuristic. Everything is built from codegen'd built-in
  * expressions (split / filter / size / length — no UDFs), so at 100 TB
  * the cost is the scan plus whole-stage-codegen'd per-row work, with
  * no shuffle until the caller aggregates.
  *
  * Determinism contract: ratio-valued scores are emitted as
  * `floor(ratio * 10^k)` fixed-point BIGINTs so DuckDB-oracle hash
  * compares are exact (same pattern as `graft.queries.Relational`).
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text; empty/blank → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens that appear in `vocab` (small literal list —
    * becomes an array_contains chain, not a join). */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(lit(vocab.toArray), t)))

  /** floor(1e6 * hits / tokens) — 0 for empty docs. */
  def stopwordRatioFp(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0L))
      .otherwise(floor(vocabHits(text, stopwords).cast("double") * 1e6 /
        n.cast("double")).cast("bigint"))
  }

  /** English-ish stopword list used by the default quality score. */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "is", "to", "it")

  /** Mean token length as fixed-point (floor(100 * chars/tokens)). */
  def meanTokenLenFp(text: Column): Column = {
    val n = tokenCount(text)
    val totalLen = aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
    when(n === 0, lit(0L))
      .otherwise(floor(totalLen.cast("double") * 100.0 / n.cast("double")).cast("bigint"))
  }

  /** Composite quality score in fixed-point millionths: rewards docs in
    * a sane length band with a plausible stopword ratio. The exact
    * formula matters less than being deterministic, monotonic in its
    * inputs, and cheap; callers threshold it to filter corpora. */
  def qualityScoreFp(text: Column): Column = {
    val n = tokenCount(text)
    val lenScore = when(n >= 20 && n <= 1000, lit(400000L))
      .otherwise(when(n >= 5, lit(200000L)).otherwise(lit(0L)))
    val stopFp = stopwordRatioFp(text, DefaultStopwords)
    // stopword ratio in [2%, 40%] looks like prose; outside → penalty
    val stopScore = when(stopFp >= 20000L && stopFp <= 400000L, lit(400000L))
      .otherwise(lit(100000L))
    val charScore = when(length(text) >= 100, lit(200000L)).otherwise(lit(50000L))
    lenScore + stopScore + charScore
  }

  /** Stopword profiles for the language-ID heuristic. Order matters:
    * ties resolve to the earliest profile. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "in", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "que"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "que"),
  )

  /** Predicted language: argmax of profile hit counts, 'und'
    * (undetermined) when no profile matches at all. */
  def langId(text: Column): Column = {
    val hits = LangProfiles.map { case (lang, words) => lang -> vocabHits(text, words) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // fold reversed so the first profile's WHEN ends up outermost —
    // ties resolve to the earliest profile in LangProfiles order
    hits.reverse.foldLeft(lit("und"): Column) { case (els, (lang, h)) =>
      when(h === best && h > 0, lit(lang)).otherwise(els)
    }
  }
}
