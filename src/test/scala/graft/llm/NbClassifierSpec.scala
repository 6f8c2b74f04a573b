package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Top-level so Spark derives the Encoder. */
case class NbDoc(doc_id: Long, text: String, lang: String)

/** Trained token-vote classifier: count training, fixed-point winner
  * table, smoothing default, majority vote with its deterministic tie
  * and no-evidence contracts, artifact round-trip identity, and the
  * collected-map scoring twin == the join-window batch path. */
class NbClassifierSpec extends AnyFunSuite with SparkTestSession {

  // en: {cat, dog, fish}; fr: {chat, chien}; shared: 'le' appears in
  // BOTH but more in fr — a seen-token tiebreak probe
  private def labeled = {
    import spark.implicits._
    Seq(
      NbDoc(1L, "cat dog fish cat", "en"),
      NbDoc(2L, "dog fish le", "en"),
      NbDoc(3L, "chat chien le le", "fr"),
      NbDoc(4L, "chien le chat", "fr")).toDF()
  }

  test("train: exact (label, token) counts, null labels excluded") {
    import spark.implicits._
    val in = labeled.unionByName(
      Seq((9L, "cat cat", null.asInstanceOf[String]))
        .toDF("doc_id", "text", "lang"))
    val got = NbClassifier.train(in, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got.contains(("en", "cat", 2L)), "null-labeled docs must not train")
    assert(got.contains(("fr", "le", 3L)))
    assert(got.contains(("en", "le", 1L)))
    assert(!got.exists(_._1 == null))
  }

  test("tokenVerdicts: per-type argmax of the smoothed fixed-point score") {
    val counts = NbClassifier.train(labeled, "text", "lang")
    val v = NbClassifier.tokenVerdicts(counts)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // en: cat2 dog2 fish2 le1 (tot 7); fr: chat2 chien2 le3 (tot 7);
    // vocab 6 types → both denominators 7 + 6 = 13
    // cat: en (2+1)/13 vs fr (0+1)/13 → en
    assert(v("cat") === "en" && v("dog") === "en" && v("fish") === "en")
    assert(v("chat") === "fr" && v("chien") === "fr")
    // le: en (1+1)/13 vs fr (3+1)/13 → fr
    assert(v("le") === "fr")
    assert(v.size === 6, "one verdict per train token type")
  }

  test("defaultVerdict: equal masses tie → smallest label, deterministically") {
    val counts = NbClassifier.train(labeled, "text", "lang")
    // unseen: en 1/13 vs fr 1/13 — an exact tie both engines must
    // break identically: label ascending
    val d = NbClassifier.defaultVerdict(counts).collect()
    assert(d.length === 1 && d.head.getString(0) === "en")
  }

  test("predict: majority vote, unseen→default, empty→(none), ties→smallest label") {
    import spark.implicits._
    val counts = NbClassifier.train(labeled, "text", "lang")
    val eval = Seq(
      NbDoc(10L, "cat dog chien", "x"),     // en 2 votes vs fr 1 → en
      NbDoc(11L, "zzz qqq", "x"),           // all unseen → default 'en' 
      NbDoc(12L, "", "x"),                  // no tokens → (none)
      NbDoc(13L, "cat chien", "x")).toDF()  // 1–1 tie → 'en' < 'fr'
    val got = NbClassifier.predict(eval, counts, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set(
      (10L, "en", 3L, 666666L),                      // 2 of 3 votes
      (11L, "en", 2L, 1000000L),                     // default sweeps
      (12L, NbClassifier.NoEvidenceLabel, 0L, 0L),
      (13L, "en", 2L, 500000L)))                     // split vote
  }

  test("predict: EMPTY counts keeps voted rows (the oracle's NULL-subquery shape)") {
    import spark.implicits._
    // The advisor's r13 trap: with an empty trained-counts frame the
    // old crossJoin collapsed the votes frame to zero rows and every
    // doc scored as no-evidence (share 0) while the DuckDB spelling's
    // NULL scalar subquery kept the voted rows at share 1000000. The
    // left-joined one-row default pins Spark to the oracle shape:
    // tokens still vote (all for the NULL default, coalesced to the
    // no-evidence label), n_tokens stays real, share is 1000000.
    val counts = NbClassifier.train(labeled, "text", "lang")
      .filter(lit(false))
    val eval = Seq(NbDoc(30L, "cat dog", "x"), NbDoc(31L, "", "x")).toDF()
    val got = NbClassifier.predict(eval, counts, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set(
      (30L, NbClassifier.NoEvidenceLabel, 2L, 1000000L),
      (31L, NbClassifier.NoEvidenceLabel, 0L, 0L)))
  }

  test("predictFromTf: shared precomputed tf frame equals the direct path") {
    import graft.llm.{NbClassifier => NB}
    val counts = NB.train(labeled, "text", "lang")
    val direct = NB.predict(labeled, counts, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val shared = NB.predictFromTf(
        labeled.select(col("doc_id")),
        NB.termFrequencies(labeled, "doc_id", "text"), counts)
      .collect().map(_.toString).sorted.toSeq
    assert(shared === direct,
      "the share-one-tokenize entry point must be plan-sugar only")
  }

  test("trainFromTokens: pre-exploded slice equals train exactly") {
    import graft.llm.{NbClassifier => NB}
    val direct = NB.train(labeled, "text", "lang")
      .collect().map(_.toString).sorted.toSeq
    val exploded = labeled.select(
      col("lang").cast("string").as("label"),
      explode(graft.llm.TextAnalysis.tokens(col("text"))).as("w"))
    val shared = NB.trainFromTokens(exploded)
      .collect().map(_.toString).sorted.toSeq
    assert(shared === direct,
      "the share-one-explode entry point must be plan-sugar only")
  }

  test("predictVariantsFromTf: per variant row-for-row equal to predictFromTf") {
    import spark.implicits._
    import graft.llm.{NbClassifier => NB}
    val base = NB.train(labeled, "text", "lang")
    // a genuinely different second variant: only the fr rows trained
    val frOnly = NB.train(labeled.filter(col("lang") === "fr"), "text", "lang")
    // and a degenerate third: EMPTY counts (the NULL-default shape)
    val empty = NB.train(labeled.filter(lit(false)), "text", "lang")
    val eval = Seq(
      NbDoc(20L, "cat fish", "en"), NbDoc(21L, "chien chat", "fr"),
      NbDoc(22L, "zzz qqq", "en"), NbDoc(23L, "", "fr")).toDF()
    val ids = eval.select(col("doc_id"))
    val tf = NB.termFrequencies(eval, "doc_id", "text")
    val variants = Seq("base" -> base, "fr_only" -> frOnly, "none" -> empty)
    val onePass = NB.predictVariantsFromTf(ids, tf, variants)
    variants.foreach { case (name, counts) =>
      val single = NB.predictFromTf(ids, tf, counts)
        .collect().map(_.toString).sorted.toSeq
      val tagged = onePass.filter(col("variant") === name).drop("variant")
        .collect().map(_.toString).sorted.toSeq
      assert(tagged === single,
        s"variant '$name' must match its single-variant scoring exactly")
    }
  }

  test("confusionCard: every eval doc lands in exactly one cell") {
    import spark.implicits._
    val counts = NbClassifier.train(labeled, "text", "lang")
    val eval = Seq(
      NbDoc(20L, "cat fish", "en"), NbDoc(21L, "chien chat", "fr"),
      NbDoc(22L, "chien chat", "en")).toDF()
    val got = NbClassifier.confusionCard(eval, counts, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("en", "en", 1L), ("fr", "fr", 1L), ("en", "fr", 1L)))
  }

  test("rule-gate distillation: weak labels come from the gate, cells partition the slice") {
    // the q226 wiring on real corpus rows: every held-out doc lands in
    // exactly ONE confusion cell, the truth axis is exactly the rule
    // gate's own verdict (no human labels anywhere), and the cell
    // total equals the test-slice size — the card can neither drop
    // nor double-count a document
    val card = graft.queries.LlmQueries
      .q226RuleDistill(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(card.nonEmpty)
    assert(card.map(_._1).toSet.subsetOf(Set("keep", "drop")),
      "truth labels are the gate's verdicts only")
    assert(card.map(_._2).toSet.subsetOf(
      Set("keep", "drop", NbClassifier.NoEvidenceLabel)))
    val labeled = graft.llm.Sampling.hashSplit(
      TextAnalysis.ruleFilter(
          graft.Tables.documents(spark, "/root/testdata/sf0.001"),
          "doc_id", "text"),
      "doc_id", 80, 10)
    val nTest = labeled.filter(col("split") === "test").count()
    assert(card.map(_._3).sum === nTest,
      "confusion cells must partition the held-out slice exactly")
  }

  test("mergeCounts: delta-train equals full retrain exactly") {
    import spark.implicits._
    val a = labeled.filter(col("doc_id") <= 2)
    val b = labeled.filter(col("doc_id") > 2)
    val merged = NbClassifier.mergeCounts(
        NbClassifier.train(a, "text", "lang"),
        NbClassifier.train(b, "text", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val full = NbClassifier.train(labeled, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(merged === full, "counts must be a monoid — no drift on delta-train")
  }

  test("artifact round-trip: loaded counts score byte-identically") {
    val counts = NbClassifier.train(labeled, "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("nbcls").toString
    Artifacts.saveIndexFrame(dir + "/counts", counts)
    val loaded = Artifacts.loadIndexFrame(spark, dir + "/counts")
    val a = NbClassifier.predict(labeled, counts, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = NbClassifier.predict(labeled, loaded, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b, "trained-in-session and loaded state must agree exactly")
  }
  test("eraseCounts: mergeCounts run backwards — erase(train(A∪B), train(B)) == train(A)") {
    import spark.implicits._
    val a = labeled.filter(col("doc_id") <= 2L)
    val b = labeled.filter(col("doc_id") > 2L)
    val full = NbClassifier.train(labeled, "text", "lang")
    val erased = NbClassifier.eraseCounts(full,
        NbClassifier.train(b, "text", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = NbClassifier.train(a, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(erased === want,
      "shared cells must decrement and erased-only cells must vanish")
    // erasing everything empties the artifact outright
    assert(NbClassifier.eraseCounts(full, full).count() === 0L)
  }
}
