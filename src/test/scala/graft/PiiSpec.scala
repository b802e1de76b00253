package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends TestBase {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("detect: exact typed counts per category") {
    val d = docs(
      1L -> "mail me at a.user+tag@sub.example.co.uk or b@x.io",
      2L -> "server 192.168.0.1 and 10.0.0.255 up",
      3L -> "call +1 555 0134 2345 or +44 207 946 0958",
      4L -> "clean text with no findings",
      5L -> "mixed: root@host.org at 127.0.0.1 phone +1 555 123 4567")
    val got = Pii.detect(d).orderBy("doc_id")
      .select("n_email", "n_phone", "n_ip", "has_pii")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((2L, 0L, 0L, 1), (0L, 0L, 2L, 1), (0L, 2L, 0L, 1),
      (0L, 0L, 0L, 0), (1L, 1L, 1L, 1)))
  }

  test("redact: typed tokens, email applied before IP so hosts aren't half-eaten") {
    val d = docs(
      // the local part is itself shaped like an IPv4 — the email rule must
      // consume the whole address before the IP rule ever sees it
      1L -> "from 1.2.3.4@mail.com at 5.6.7.8",
      2L -> "reach admin@example.com or +1 555 123 4567")
    val got = Pii.redact(d).orderBy("doc_id")
      .select("redacted").as[String].collect().toSeq
    assert(got == Seq(
      "from <EMAIL> at <IP>",
      "reach <EMAIL> or <PHONE>"))
  }

  test("redact: idempotent (tokens contain no redactable text)") {
    val d = docs(1L -> "x admin@example.com 1.2.3.4 +1 555 123 4567 y")
    val once = Pii.redact(d)
    val twice = Pii.redact(once.select(col("doc_id"), col("redacted").as("text")))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("phone shapes: international, parenthesized, dashed — all one category") {
    val d = docs(
      1L -> "call +1 555 123 4567 now",
      2L -> "or (555) 867-5309 later",
      3L -> "fax 555-123-4567 anytime",
      4L -> "order 555-123-456 is not a phone (3-3-3)")
    val got = Pii.detect(d).orderBy("doc_id").select("n_phone")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 1L, 1L, 0L))
    assert(Pii.redact(docs(5L -> "(555) 867-5309 or 555-123-4567"))
      .select("redacted").as[String].collect().head == "<PHONE> or <PHONE>")
  }

  test("ssn (3-2-4) and dashed phone (3-3-4) never half-match each other") {
    val d = docs(
      1L -> "ssn 123-45-6789 filed",
      2L -> "phone 555-123-4567 listed",
      3L -> "both 123-45-6789 and 555-123-4567")
    val got = Pii.detect(d).orderBy("doc_id").select("n_ssn", "n_phone")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (0L, 1L), (1L, 1L)))
    // redaction order (phone before ssn) leaves each span to its owner
    assert(Pii.redact(docs(4L -> "123-45-6789 555-123-4567"))
      .select("redacted").as[String].collect().head == "<SSN> <PHONE>")
  }

  test("ipv6: full 8-group form; hex groups; disjoint from ipv4") {
    val d = docs(
      1L -> "via fe80:1:2:3:4:5:6:1000 tunnel",
      2L -> "v4 10.0.0.1 stays v4",
      3L -> "short fe80:1:2:3 is not a full v6")
    val got = Pii.detect(d).orderBy("doc_id").select("n_ipv6", "n_ip")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (0L, 1L), (0L, 0L)))
    assert(Pii.redact(docs(4L -> "x fe80:0:0:0:0:8a2e:370:7334 y"))
      .select("redacted").as[String].collect().head == "x <IPV6> y")
  }

  test("ipv6 compressed forms: ::-shapes match whole; single-colon " +
      "times/ratios never match; bare :: stays") {
    val d = docs(
      1L -> "gw 2001:db8::1 up",            // both-sides, k=2
      2L -> "lo ::1 ok",                    // leading ::
      3L -> "net fe80:: down",              // trailing ::
      4L -> "mid 1:2:3:4:5:6::7 deep",      // k=6 (8 groups total)
      5L -> "time 12:30 ratio 3:2 score 10:7", // single colons — never v6
      6L -> "cpp std::vector stays",        // non-hex around :: — no match
      7L -> "bare :: alone is not an address")
    val got = Pii.detect(d).orderBy("doc_id").select("n_ipv6")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 1L, 1L, 1L, 0L, 0L, 0L))
    // the WHOLE compressed address redacts (never a half-eaten span),
    // and the full 8-group form still wins over any compressed prefix
    assert(Pii.redact(docs(
        8L -> "a 2001:db8::ff00:42:8329 b ::1 c fe80:: d",
        9L -> "full fe80:1:2:3:4:5:6:1000 kept whole"))
      .orderBy("doc_id").select("redacted").as[String].collect().toSeq ==
      Seq("a <IPV6> b <IPV6> c <IPV6> d", "full <IPV6> kept whole"))
    // DOCUMENTED over-redaction edge (r18 ADVICE): the trailing-::
    // alternative matches the 7-group-plus-:: prefix of an INVALID
    // >8-group shape — over-redaction of a non-address (the safe
    // direction), identical in both engines; an exact guard would need
    // the lookahead the cross-engine regex discipline forbids. This pin
    // makes the behavior a contract, not an accident.
    assert(Pii.redact(docs(10L -> "bad 1:2:3:4:5:6:7::8 shape"))
      .select("redacted").as[String].collect().head == "bad <IPV6>8 shape")
  }

  test("cc shape: uniform-separator 4-4-4-4 forms; disjoint from phones " +
      "and ssn; mixed separators are NOT a card") {
    val d = docs(
      1L -> "card 4556 7375 9012 3456 on file",
      2L -> "card 4556-7375-9012-3456 works",
      3L -> "card 4556737590123456 bare",
      4L -> "mixed 4556 7375-9012 3456 is not one card",
      5L -> "phone 555-123-4567 ssn 123-45-6789 untouched")
    val got = Pii.detect(d).orderBy("doc_id")
      .select("n_cc", "n_phone", "n_ssn").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((1L, 0L, 0L), (1L, 0L, 0L), (1L, 0L, 0L),
      (0L, 0L, 0L), (0L, 1L, 1L)))
    assert(Pii.redact(docs(9L -> "pay 4556 7375 9012 3456 now"))
      .select("redacted").as[String].collect().head == "pay <CC> now")
  }

  test("detect counts categories independently; REDACTION resolves " +
      "overlaps by order (the 1.2.3.4@mail.com case)") {
    val d = docs(1L -> "ping 1.2.3.4@mail.com ok")
    val row = Pii.detect(d).select("n_email", "n_ip").as[(Long, Long)]
      .collect().head
    // the IP-shaped local part IS an independent ipv4 match on raw text…
    assert(row == ((1L, 1L)))
    // …but redaction applies email first, so no <IP> token survives
    assert(Pii.redact(d).select("redacted").as[String].collect().head ==
      "ping <EMAIL> ok")
  }

  test("stats: per-group prevalence aggregates the detect counts exactly") {
    val d = Seq(
      (1L, "a@b.co and c@d.io", "web"),
      (2L, "clean", "web"),
      (3L, "10.0.0.1", "book"),
      (4L, "clean too", "web"))
      .toDF("doc_id", "text", "source")
    val got = Pii.stats(d, "source").orderBy("source")
      .select("source", "n_docs", "n_docs_pii", "n_email", "n_ip", "pii_rate")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("book", 1L, 1L, 0L, 1L, 1.0),
      ("web", 3L, 1L, 2L, 0L, 0.333333)))
  }
}
