package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PII scrubbing: codegen'd regex detect + redact over a text column.
  * Patterns stay in the Java-regex/RE2 common subset so the q59 DuckDB
  * oracle replays them byte-for-byte — these tests pin the Spark-side
  * semantics (counts over the original text, fixed redaction order,
  * null passthrough, the documented overlap caveat). */
class PiiSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def scrubOne(text: String): org.apache.spark.sql.Row =
    Pii.scrub(Seq((1L, text)).toDF("id", "text"), "text")
      .select("n_emails", "n_ips", "n_phones", "clean_text")
      .head()

  test("redacts emails, IPv4s, and phones with type tokens") {
    val r = scrubOne("mail a.b+c@sub.example.no or 192.168.0.1, call +47 555 12345.")
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1L, 1L)))
    assert(r.getString(3) == "mail <EMAIL> or <IP>, call <PHONE>.")
  }

  test("counts all matches, not just the first") {
    val r = scrubOne("x@y.no and z@w.org; 1.2.3.4 5.6.7.8")
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(r.getString(3) == "<EMAIL> and <EMAIL>; <IP> <IP>")
  }

  test("word boundaries: version-ish strings do not over-match") {
    val r = scrubOne("release v1.2 and 1.2.3.4.5 stay; plain 12345 stays")
    // 5-group string: only a 4-group prefix window matches (documented)
    assert(r.getLong(1) == 1L)
    assert(r.getString(3).contains("v1.2 "))
    assert(r.getString(3).contains("12345 stays"))
  }

  test("null text survives with null counts and null clean_text") {
    val r = Pii.scrub(Seq((1L, null: String)).toDF("id", "text"), "text")
      .select("n_emails", "n_ips", "n_phones", "clean_text").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("overlap caveat: counts diverge from clean_text tokens by design") {
    // the email pattern consumes the dotted quad, so n_ips counts a
    // match that never becomes an <IP> token — the scrub() scaladoc
    // documents exactly this divergence
    val r = scrubOne("user@1.2.3.4.com")
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getString(3) == "<EMAIL>")
    assert(!r.getString(3).contains("<IP>"))
  }

  test("scrubSequential: counts reconcile exactly against clean_text tokens") {
    def seqOne(text: String): org.apache.spark.sql.Row =
      Pii.scrubSequential(Seq((1L, text)).toDF("id", "text"), "text")
        .select("n_emails", "n_ips", "n_phones", "clean_text")
        .head()
    // overlap: the email consumes the quad, so sequential counts report
    // n_ips=0 — agreeing with clean_text, where scrub() reports 1
    val r = seqOne("user@1.2.3.4.com and 5.6.7.8, call +47 555 12345")
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1L, 1L)))
    assert(r.getString(3) == "<EMAIL> and <IP>, call <PHONE>")
    val overlapOnly = seqOne("user@1.2.3.4.com")
    assert(overlapOnly.getLong(1) == 0L) // scrub() would say 1
    assert(overlapOnly.getString(3) == "<EMAIL>")
    // agreement invariant on a mixed sample: every count == its token
    // occurrences in clean_text
    for (s <- Seq("a@b.no x 1.2.3.4 +47 555 123", "no pii at all",
        "two a@b.no c@d.org mails 9.9.9.9")) {
      val row = seqOne(s)
      val clean = row.getString(3)
      def occ(tok: String) = tok.r.findAllIn(clean).size.toLong
      assert(row.getLong(0) == occ(Pii.EmailToken), s"emails in: $s")
      assert(row.getLong(1) == occ(Pii.Ipv4Token), s"ips in: $s")
      assert(row.getLong(2) == occ(Pii.PhoneToken), s"phones in: $s")
    }
    // null passthrough holds for the sequential variant too
    val nr = Pii.scrubSequential(Seq((1L, null: String)).toDF("id", "text"), "text")
      .select("n_emails", "n_ips", "n_phones", "clean_text").head()
    assert(nr.isNullAt(0) && nr.isNullAt(1) && nr.isNullAt(2) && nr.isNullAt(3))
  }

  test("patterns and tokens embed safely in single-quoted oracle SQL") {
    // the q59 oracle interpolates these constants into single-quoted
    // DuckDB literals verbatim — a quote or backslash-escape sequence
    // RE2 lacks would silently corrupt the oracle SQL, so pin the
    // invariant here rather than escaping at the call site
    for (s <- Seq(Pii.EmailPattern, Pii.Ipv4Pattern, Pii.PhonePattern,
        Pii.EmailToken, Pii.Ipv4Token, Pii.PhoneToken)) {
      assert(!s.contains("'"), s"single quote would break the SQL literal: $s")
    }
    // RE2 compatibility: no backreferences or lookaround (RE2 rejects
    // them); the constructs used must stay in the common subset
    for (p <- Seq(Pii.EmailPattern, Pii.Ipv4Pattern, Pii.PhonePattern)) {
      assert(!p.matches(".*\\\\[0-9].*"), s"backreference is not RE2-replayable: $p")
      assert(!p.contains("(?=") && !p.contains("(?!") && !p.contains("(?<"),
        s"lookaround is not RE2-replayable: $p")
    }
  }

  test("plan stays codegen'd: no UDFs, no shuffle") {
    val df = Pii.scrub(Seq((1L, "a@b.no")).toDF("id", "text"), "text")
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), "scrub must not shuffle")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
