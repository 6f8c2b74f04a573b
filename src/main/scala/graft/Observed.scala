package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost pipeline counters via Spark's `observe` API.
  *
  * A curation job that writes its output and THEN recounts what it
  * kept has paid two corpus passes for one number; `observe` attaches
  * aggregates to the plan itself, so the metrics come back with the
  * SAME action that wrote the data — no second scan, at any size.
  * Batch reads land in an [[org.apache.spark.sql.Observation]]
  * (`obs.get` blocks until the action completes); streaming twins
  * surface per-batch values in `StreamingQueryProgress.observedMetrics`
  * under the same name, so a crawl-time gate exports its accept rate
  * for free.
  *
  * The metric expressions are shared between this attach point and
  * ObservedSpec's exact recount, so the free numbers are pinned equal
  * to a second-pass aggregate — the point being they cost nothing,
  * not that they are approximate.
  */
object Observed {

  /** The standard gate metrics: rows seen, rows kept, tokens kept —
    * over a frame carrying a boolean `keptCol` and a bigint token
    * count `nTokCol` (what [[graft.llm.TextAnalysis.ruleFilter]]
    * emits). */
  def gateMetrics(keptCol: String, nTokCol: String): Map[String, Column] = {
    val kept = col(Names.quoted(keptCol))
    val nTok = col(Names.quoted(nTokCol))
    Map(
      "n_rows" -> count(lit(1)),
      "n_kept" -> sum(when(kept, 1L).otherwise(0L)),
      "kept_tokens" -> sum(when(kept, nTok).otherwise(0L)))
  }

  /** Attach named metrics to `df` for a batch action; read them from
    * the returned [[Observation]] AFTER the action. Metrics must be
    * aggregates Spark can compute per task and merge (no distinct). */
  def batch(df: DataFrame, name: String,
      metrics: Map[String, Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }.toSeq
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** Attach named metrics to a STREAMING frame; values surface per
    * micro-batch in `StreamingQueryProgress.observedMetrics(name)`. */
  def stream(df: DataFrame, name: String,
      metrics: Map[String, Column]): DataFrame = {
    require(metrics.nonEmpty, "at least one metric")
    val cols = metrics.map { case (n, c) => c.as(n) }.toSeq
    df.observe(name, cols.head, cols.tail: _*)
  }
}
