package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension: `spark.sql("pattern: …")` compiles the engine's CEP
  * plan dialect (the same text the control plane and `env.plan` accept),
  * so ONE textual surface reaches all three entry points. Everything
  * else delegates to Spark's parser untouched.
  *
  * Registered via `SparkSessionExtensions.injectParser`
  * ([[GraftExtensions]]); batch pattern text lands on the
  * MATCH_RECOGNIZE custom operator through [[graft.control.PlanCompiler]].
  */
class GraftSqlParser(delegate: ParserInterface, session: SparkSession)
    extends ParserInterface {

  private def isPattern(t: String): Boolean =
    t.trim.toLowerCase.startsWith("pattern:")

  private def isMatchRecognize(t: String): Boolean =
    MatchRecognizeSql.statementRe.pattern.matcher(t).matches()

  override def parsePlan(sqlText: String): LogicalPlan =
    if (isPattern(sqlText))
      // compile against the OWNING session, not SparkSession.active —
      // with multiple sessions the thread-local active one may be a
      // different tenant whose same-named views would silently win
      graft.control.PlanCompiler.compile(session, sqlText)
        .queryExecution.logical
    else if (isMatchRecognize(sqlText))
      MatchRecognizeSql.compile(session, delegate, sqlText)
        .queryExecution.logical
    else delegate.parsePlan(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    if (isPattern(sqlText) || isMatchRecognize(sqlText)) parsePlan(sqlText)
    else delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** SQL-standard `MATCH_RECOGNIZE` (supported subset), rewritten onto the
  * [[MatchRecognize]] custom operator:
  *
  * {{{
  * SELECT * FROM events MATCH_RECOGNIZE (
  *   PARTITION BY user_id
  *   ORDER BY ts_us, event_id          -- (event-time, tie-break)
  *   MEASURES a.event_id AS a_id, LAST(b.event_id) AS b_id,
  *            MATCH_START AS s, MATCH_END AS e
  *   PATTERN (a b+ c?)                 -- quantifiers: + * ? {m,n}
  *   WITHIN 600000000                  -- optional, in ORDER BY units
  *   DEFINE a AS event_type = 'click', b AS event_type = 'view',
  *          c AS event_type = 'purchase'
  * )
  * }}}
  *
  * Output = partition columns ++ measures (ONE ROW PER MATCH).
  * `var.col` / `LAST(var.col)` read the LAST event bound to `var`
  * (SQL-standard one-row-per-match resolution — Oracle/Flink/Trino
  * agree), `FIRST(var.col)` the first. Not supported (fail fast):
  * alternation / grouping inside PATTERN, DEFINE predicates referencing
  * pattern variables, ALL ROWS PER MATCH, AFTER MATCH SKIP.
  */
private[plans] object MatchRecognizeSql {
  import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
  import org.apache.spark.sql.functions.{col, element_at}

  val statementRe =
    ("""(?is)\s*select\s+\*\s+from\s+([\w.]+)\s+match_recognize\s*""" +
      """\((.*)\)\s*;?\s*""").r

  /** canonical key -> keyword regex (two-word keywords tolerate any
    * whitespace; `(?<!\w)`/`(?!\w)` boundaries treat `_` as a word char,
    * so `pattern_id` never matches `pattern`)
    */
  private val sections: Seq[(String, scala.util.matching.Regex)] = Seq(
    "partition by" -> """(?i)(?<!\w)partition\s+by(?!\w)""".r,
    "order by" -> """(?i)(?<!\w)order\s+by(?!\w)""".r,
    "measures" -> """(?i)(?<!\w)measures(?!\w)""".r,
    "pattern" -> """(?i)(?<!\w)pattern(?!\w)""".r,
    "within" -> """(?i)(?<!\w)within(?!\w)""".r,
    "define" -> """(?i)(?<!\w)define(?!\w)""".r)

  /** The body with single-quoted literal CONTENTS blanked out (same
    * length, positions preserved) — keyword scans, depth counts and
    * guards run on this; extraction uses the original text.
    */
  private[plans] def maskLiterals(s: String): String = {
    val b = s.toCharArray
    var in = false
    var i = 0
    while (i < b.length) {
      if (b(i) == '\'') in = !in
      else if (in) b(i) = ' '
      i += 1
    }
    new String(b)
  }

  /** Split the MATCH_RECOGNIZE body into its clause sections (keyword
    * scan at paren depth 0 on the literal-masked text).
    */
  private def splitSections(body: String): Map[String, String] = {
    val masked = maskLiterals(body)
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    for ((key, re) <- sections) {
      re.findAllMatchIn(masked)
        .find { mm =>
          val prefix = masked.substring(0, mm.start)
          prefix.count(_ == '(') == prefix.count(_ == ')')
        }
        .foreach(mm => found += ((mm.start, mm.end, key)))
    }
    val sorted = found.sortBy(_._1).toSeq
    sorted.zipWithIndex.map { case ((_, end, key), j) =>
      val next = if (j + 1 < sorted.length) sorted(j + 1)._1 else body.length
      key -> body.substring(end, next).trim
    }.toMap
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach { c =>
      if (c == '\'') { inQuote = !inQuote; cur.append(c) }
      else if (!inQuote && c == '(') { depth += 1; cur.append(c) }
      else if (!inQuote && c == ')') { depth -= 1; cur.append(c) }
      else if (!inQuote && depth == 0 && c == sep) {
        out += cur.toString; cur.clear()
      } else cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val quantRe = """(\w+)(\+|\*|\?|\{(\d+),(\d+)\})?""".r

  def compile(session: SparkSession, delegate: ParserInterface,
      sqlText: String): DataFrame = {
    val m = statementRe.findFirstMatchIn(sqlText).getOrElse(
      throw new IllegalArgumentException(
        "MATCH_RECOGNIZE statements must have the form " +
          "SELECT * FROM <table> MATCH_RECOGNIZE (...)"))
    val table = m.group(1)
    val sec = splitSections(m.group(2))
    def need(kw: String): String = sec.getOrElse(kw,
      throw new IllegalArgumentException(s"MATCH_RECOGNIZE needs a " +
        s"${kw.toUpperCase} clause"))
    // guard on literal-masked, whitespace-normalized text: a newline
    // between 'AFTER' and 'MATCH' must still trip it, and a string
    // literal containing the phrase must NOT
    val guardText = maskLiterals(m.group(2)).toLowerCase
      .replaceAll("\\s+", " ")
    for (bad <- Seq("all rows per match", "after match"))
      require(!guardText.contains(bad),
        s"MATCH_RECOGNIZE: '$bad' is not supported (one row per match only)")

    val keys = splitTopLevel(need("partition by"), ',')
    val order = splitTopLevel(need("order by"), ',')
    require(order.nonEmpty && order.length <= 2,
      "ORDER BY takes (event-time[, tie-break])")
    val (tsCol, tieCol) = (order.head, order.lift(1).getOrElse(order.head))

    // PATTERN (a b+ c{2,3}) — linear concatenation with quantifiers
    val patBody = need("pattern").trim
    require(patBody.startsWith("(") && patBody.endsWith(")"),
      "PATTERN needs parentheses")
    val inner = patBody.substring(1, patBody.length - 1).trim
    require(!inner.contains("|") && !inner.contains("("),
      "PATTERN alternation/grouping is not supported (linear only)")
    val vars = inner.split("\\s+").toSeq.map {
      case quantRe(name, q, mn, mx) =>
        q match {
          case null => (name, 1, 1)
          case "+" => (name, 1, Int.MaxValue)
          case "*" => (name, 0, Int.MaxValue)
          case "?" => (name, 0, 1)
          case _ => (name, mn.toInt, mx.toInt)
        }
      case other =>
        throw new IllegalArgumentException(s"bad PATTERN element: $other")
    }
    val varNames = vars.map(_._1)
    require(varNames.distinct.length == varNames.length,
      "duplicate PATTERN variables")

    // DEFINE a AS <pred>, ... — predicates over plain input columns
    val defs = splitTopLevel(need("define"), ',').map { d =>
      val asRe = """(?is)(\w+)\s+as\s+(.+)""".r
      d.trim match {
        case asRe(n, e) => n -> e.trim
        case other => throw new IllegalArgumentException(
          s"bad DEFINE entry: $other")
      }
    }.toMap
    val missing = varNames.filterNot(defs.contains)
    require(missing.isEmpty,
      s"PATTERN variables without DEFINE: ${missing.mkString(", ")}")
    for (d <- defs.values; v <- varNames)
      require(!maskLiterals(d).matches(s"(?is).*(?<!\\w)$v\\s*\\..*"),
        s"DEFINE predicates may not reference pattern variables " +
          s"(per-event predicates only): $d")

    val within = sec.get("within").map(_.trim).map { w =>
      require(w.matches("\\d+"),
        s"WITHIN takes a raw long in ORDER BY units (got '$w'); " +
          "interval syntax is not supported")
      w.toLong
    }
    val elems = vars.map { case (n, mn, mx) =>
      MatchRecognize.EStep(n,
        GraftSqlBridge.column(delegate.parseExpression(defs(n))), mn, mx)
    }
    val matched = MatchRecognize(session.table(table), keys, tsCol, tieCol,
      elems, within)

    // MEASURES: textual rewrite of var.col / FIRST(var.col) / LAST(var.col)
    // to array accesses over the match columns, then parse as
    // expressions. String literals are excluded from the rewrite: the
    // text splits on quotes, rewrites run on the OUTSIDE segments only.
    def rewriteOutsideLiterals(s: String)(f: String => String): String =
      s.split("'", -1).zipWithIndex.map {
        case (seg, i) => if (i % 2 == 0) f(seg) else seg
      }.mkString("'")
    val measures = splitTopLevel(need("measures"), ',').map { mm =>
      val asRe = """(?is)(.+)\s+as\s+(\w+)""".r
      val (exprTxt, alias) = mm.trim match {
        case asRe(e, a) => (e.trim, a)
        case other => throw new IllegalArgumentException(
          s"MEASURES entries need 'expr AS name': $other")
      }
      val t = rewriteOutsideLiterals(exprTxt) { seg0 =>
        var seg = seg0
        for (v <- varNames) {
          // aggregates over ALL events bound to the variable (numeric
          // aggregation runs in double, in bind order)
          seg = seg.replaceAll(s"(?i)(?<!\\w)count\\s*\\(\\s*$v\\.\\*\\s*\\)",
            s"size(`$v`)")
          seg = seg.replaceAll(s"(?i)(?<!\\w)sum\\s*\\(\\s*$v\\.(\\w+)\\s*\\)",
            s"aggregate(`$v`, cast(0.0 as double), " +
              s"(_mr_acc, _mr_x) -> _mr_acc + _mr_x.`$$1`)")
          seg = seg.replaceAll(s"(?i)(?<!\\w)avg\\s*\\(\\s*$v\\.(\\w+)\\s*\\)",
            s"(aggregate(`$v`, cast(0.0 as double), " +
              s"(_mr_acc, _mr_x) -> _mr_acc + _mr_x.`$$1`) / size(`$v`))")
          seg = seg.replaceAll(s"(?i)(?<!\\w)first\\s*\\(\\s*$v\\.(\\w+)\\s*\\)",
            s"element_at(`$v`, 1).`$$1`")
          seg = seg.replaceAll(s"(?i)(?<!\\w)last\\s*\\(\\s*$v\\.(\\w+)\\s*\\)",
            s"element_at(`$v`, -1).`$$1`")
          // bare var.col = LAST bound event (SQL-standard one-row-per-
          // match resolution)
          seg = seg.replaceAll(s"(?i)(?<!\\w)$v\\.(\\w+)",
            s"element_at(`$v`, -1).`$$1`")
        }
        seg
      }
      GraftSqlBridge.column(delegate.parseExpression(t)).as(alias)
    }
    matched.select(keys.map(col) ++ measures: _*)
  }
}
