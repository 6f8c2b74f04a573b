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

  test("plan stays codegen'd: no UDFs, no shuffle") {
    val df = Pii.scrub(Seq((1L, "a@b.no")).toDF("id", "text"), "text")
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), "scrub must not shuffle")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
