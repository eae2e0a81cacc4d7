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
  * `var.col` / `FIRST(var.col)` read the first event bound to `var`,
  * `LAST(var.col)` the last. Not supported (fail fast): alternation /
  * grouping inside PATTERN, DEFINE predicates referencing pattern
  * variables, ALL ROWS PER MATCH, AFTER MATCH SKIP.
  */
private[plans] object MatchRecognizeSql {
  import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
  import org.apache.spark.sql.functions.{col, element_at}

  val statementRe =
    ("""(?is)\s*select\s+\*\s+from\s+([\w.]+)\s+match_recognize\s*""" +
      """\((.*)\)\s*;?\s*""").r

  private val sections =
    Seq("partition by", "order by", "measures", "pattern", "within", "define")

  /** Split the MATCH_RECOGNIZE body into its clause sections (case-
    * insensitive keyword scan at paren depth 0, outside quotes).
    */
  private def splitSections(body: String): Map[String, String] = {
    val lower = body.toLowerCase
    // locate each section keyword at depth 0
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    for (kw <- sections) {
      var idx = 0
      var done = false
      while (!done) {
        val i = lower.indexOf(kw, idx)
        if (i < 0) done = true
        else {
          val depth = body.substring(0, i).count(_ == '(') -
            body.substring(0, i).count(_ == ')')
          val quotes = body.substring(0, i).count(_ == '\'')
          val wordBoundary =
            (i == 0 || !body(i - 1).isLetterOrDigit) &&
              (i + kw.length >= body.length ||
                !body(i + kw.length).isLetterOrDigit)
          if (depth == 0 && quotes % 2 == 0 && wordBoundary) {
            found += ((i, kw)); done = true
          } else idx = i + 1
        }
      }
    }
    val sorted = found.sortBy(_._1).toSeq
    sorted.zipWithIndex.map { case ((pos, kw), j) =>
      val end = if (j + 1 < sorted.length) sorted(j + 1)._1 else body.length
      kw -> body.substring(pos + kw.length, end).trim
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
    for (bad <- Seq("all rows per match", "after match"))
      require(!m.group(2).toLowerCase.contains(bad),
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
      require(!d.matches(s"(?is).*\\b$v\\s*\\..*"),
        s"DEFINE predicates may not reference pattern variables " +
          s"(per-event predicates only): $d")

    val within = sec.get("within").map(_.trim.toLong)
    val elems = vars.map { case (n, mn, mx) =>
      MatchRecognize.EStep(n,
        GraftSqlBridge.column(delegate.parseExpression(defs(n))), mn, mx)
    }
    val matched = MatchRecognize(session.table(table), keys, tsCol, tieCol,
      elems, within)

    // MEASURES: textual rewrite of var.col / FIRST(var.col) / LAST(var.col)
    // to array accesses over the match columns, then parse as expressions
    val measures = splitTopLevel(need("measures"), ',').map { mm =>
      val asRe = """(?is)(.+)\s+as\s+(\w+)""".r
      val (exprTxt, alias) = mm.trim match {
        case asRe(e, a) => (e.trim, a)
        case other => throw new IllegalArgumentException(
          s"MEASURES entries need 'expr AS name': $other")
      }
      var t = exprTxt
      for (v <- varNames) {
        t = t.replaceAll(s"(?i)\\bfirst\\s*\\(\\s*$v\\.(\\w+)\\s*\\)",
          s"element_at(`$v`, 1).`$$1`")
        t = t.replaceAll(s"(?i)\\blast\\s*\\(\\s*$v\\.(\\w+)\\s*\\)",
          s"element_at(`$v`, -1).`$$1`")
        t = t.replaceAll(s"(?i)\\b$v\\.(\\w+)",
          s"element_at(`$v`, 1).`$$1`")
      }
      t = t.replaceAll("(?i)\\bmatch_start\\b", "match_start")
        .replaceAll("(?i)\\bmatch_end\\b", "match_end")
      GraftSqlBridge.column(delegate.parseExpression(t)).as(alias)
    }
    matched.select(keys.map(col) ++ measures: _*)
  }
}
