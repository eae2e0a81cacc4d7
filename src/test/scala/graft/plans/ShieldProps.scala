package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property coverage for the round-20 literal shield: on ANY text
  * whose quotes pair under Spark's lexer rules, shield→unshield is the
  * identity, and no literal content survives into the shielded text.
  */
object ShieldProps extends Properties("Shield") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(graft.Soak.knob("GRAFT_SHIELD_GENS", 500, 5000))

  // literal contents: dots, keywords, parens, escaped quotes — the
  // exact shapes the rewrite regexes would misread if they leaked
  private val genLitBody: Gen[String] = Gen.oneOf(
    Gen.const("x.y"), Gen.const("first("), Gen.const("a.value"),
    Gen.const("prev not like"), Gen.const("don\\'t"),
    Gen.const(""), Gen.const("), PREV(b.v"),
    Gen.alphaNumStr.map(_.take(8)))
  private val genCode: Gen[String] = Gen.oneOf(
    "a.value + b.value", "LAST(", ")", " BETWEEN 1 AND 2",
    "CASE WHEN t = ", " THEN x ELSE y END", "PREV( FIRST(v.c) )",
    "  \n  ", "c1 * 2 - 3", ",")
  private val genText: Gen[String] =
    Gen.listOf(Gen.oneOf(
      genCode,
      genLitBody.map(b => s"'$b'"))).map(_.mkString(" "))

  property("shield then unshield is the identity") =
    forAll(genText) { s =>
      val (sh, lits) = MatchRecognizeSql.shieldLiterals(s)
      MatchRecognizeSql.unshieldLiterals(sh, lits) == s
    }

  property("no quote, and no dotted or word content from any literal, " +
      "survives into the shielded text") =
    forAll(genText) { s =>
      val (sh, _) = MatchRecognizeSql.shieldLiterals(s)
      !sh.contains('\'') &&
        !sh.contains("x.y") && !sh.contains("first(") &&
        !sh.contains("don")
    }

  // r20 ADVICE (high): String.trim strips the U+0007 markers when a
  // literal sits at the BOUNDARY of a rewriter group — wsTrim must
  // strip real whitespace ONLY and never touch a marker
  property("wsTrim strips surrounding whitespace but never a shield " +
      "marker, and round-trips through unshield") =
    forAll(genLitBody,
        Gen.oneOf("", " ", "\t", "\n", " \t ", "\u000B", "\f \u000B")) {
      (b, ws) =>
      val s = s"'$b'"
      val (sh, lits) = MatchRecognizeSql.shieldLiterals(s)
      val t = MatchRecognizeSql.wsTrim(ws + sh + ws)
      t == sh && MatchRecognizeSql.unshieldLiterals(t, lits) == s
    }

  property("wsTrim equals String.trim on marker-free text") =
    forAll(Gen.oneOf(genCode, Gen.const(""), Gen.const("  \t\r\n "),
        Gen.const(" \f x \f "))) { s =>
      MatchRecognizeSql.wsTrim(s) == s.trim
    }

  // r20 ADVICE (low): Spark's lexer nests bracketed comments — the
  // shield must drop `/* a /* b */ c */` entirely, not leak `c */`
  property("nested bracketed comments are dropped entirely") =
    forAll(genLitBody) { b =>
      val (sh, _) = MatchRecognizeSql.shieldLiterals(
        s"x /* o '$b' /* i */ leak */ y")
      !sh.contains("leak") && !sh.contains("*/") &&
        sh.contains("x") && sh.contains("y")
    }
}
