package graft

import graft.operators.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrub1(text: String): (Long, Long, Long, Long, String) = {
    val r = Pii.scrub(Seq((1L, text)).toDF("doc_id", "text"),
      "text", "doc_id")
      .as[(Long, Long, Long, Long, Long, String)].head()
    (r._2, r._3, r._4, r._5, r._6)
  }

  test("each category detects and redacts") {
    assert(scrub1("mail me at john.doe+x@sub.example.co.uk thanks") ==
      ((1L, 0L, 0L, 0L, "mail me at <EMAIL> thanks")))
    assert(scrub1("ssn is 123-45-6789 ok") ==
      ((0L, 1L, 0L, 0L, "ssn is <SSN> ok")))
    assert(scrub1("ping 192.168.0.1 and 10.0.0.255") ==
      ((0L, 0L, 2L, 0L, "ping <IP> and <IP>")))
    assert(scrub1("call 555-010-4242 or +4915123456789 now") ==
      ((0L, 0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
  }

  test("sequential stages prevent double counting") {
    // an SSN's digit run also matches the phone pattern; the ssn stage
    // runs first, so it counts once as SSN and never as phone
    assert(scrub1("id 123-45-6789 here") ==
      ((0L, 1L, 0L, 0L, "id <SSN> here")))
    // an IPv4's digits would match the phone pattern too: ip stage
    // first
    assert(scrub1("host 10.20.30.40 up") ==
      ((0L, 0L, 1L, 0L, "host <IP> up")))
    // an email containing digits is consumed before phone ever looks
    assert(scrub1("a12345678@example.com") ==
      ((1L, 0L, 0L, 0L, "<EMAIL>")))
  }

  test("short digit runs and plain words do not trip the phone gate") {
    assert(scrub1("room 4211 on floor 3") ==
      ((0L, 0L, 0L, 0L, "room 4211 on floor 3")))
    assert(scrub1("version 1.2.3 of the lib") ==
      ((0L, 0L, 0L, 0L, "version 1.2.3 of the lib")))
  }

  test("null text yields zeros and empty redaction; stats aggregate") {
    val df = Seq((1L, "mail a@b.io"), (2L, null.asInstanceOf[String]),
      (3L, "10.0.0.1 and c@d.org")).toDF("doc_id", "text")
    val got = Pii.scrub(df, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, 0L, 0L, 0L, 0L, "")))
    val st = Pii.stats(df, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(st == ((2L, 0L, 1L, 0L, 2L, 3L)))
  }
}
