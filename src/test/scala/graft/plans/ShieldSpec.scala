package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-20 literal shield (the pre-pass that
  * keeps MATCH_RECOGNIZE rewrite text contiguous while making literal
  * content inert — r19 VERDICT hygiene item 2).
  */
class ShieldSpec extends AnyFunSuite {
  private def roundTrip(s: String): String = {
    val (sh, lits) = MatchRecognizeSql.shieldLiterals(s)
    MatchRecognizeSql.unshieldLiterals(sh, lits)
  }

  test("shield round-trips plain, dotted, keyword and escaped-quote " +
      "literals") {
    for (s <- Seq(
        "event_type = 'A'",
        "LAST(CASE WHEN t = 'x.y' THEN a.v ELSE b.v END)",
        "x = 'first(' AND y = 'prev not like'",
        """name = 'don\'t' AND z = ''""",
        "'leading' = col AND col2 = 'trailing'"))
      assert(roundTrip(s) == s, s"round trip broke for: $s")
  }

  test("shielded text carries no quotes, dots or letters from literal " +
      "content") {
    val (sh, _) = MatchRecognizeSql.shieldLiterals(
      "LAST(CASE WHEN t = 'a.value' THEN a.v ELSE b.v END)")
    assert(!sh.contains("a.value"))
    assert(!sh.contains('\''))
    // the placeholder is digit-only between U+0007 markers: no regex
    // in the rewrite passes can read a qualifier or bare column there
    assert("\u0007\\d+\u0007".r.findAllIn(sh).size == 1)
  }

  test("comments outside literals are dropped; quotes inside comments " +
      "cannot desynchronize the literal scan") {
    val (sh, lits) = MatchRecognizeSql.shieldLiterals(
      "a = 'x' -- don't trip\nAND b = 'y' /* nor 'this' */ AND c = 2")
    assert(lits.toSeq == Seq("'x'", "'y'"))
    assert(!sh.contains("trip") && !sh.contains("this"))
    assert(MatchRecognizeSql.unshieldLiterals(sh, lits)
      .replaceAll("\\s+", " ").trim == "a = 'x' AND b = 'y' AND c = 2")
  }

  test("unshield is total: a stray placeholder index past the store " +
      "restores to itself") {
    assert(MatchRecognizeSql.unshieldLiterals(
      "x\u00075\u0007y", Vector("'a'")) == "x\u00075\u0007y")
  }
}
