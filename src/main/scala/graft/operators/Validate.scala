package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ pattern —
  * Schelter et al., "Automating Large-Scale Data Quality Verification",
  * VLDB 2018): declare per-column expectations, get back one verdict
  * row per constraint with exact violation counts. The pipeline
  * building block that gates an ingest batch BEFORE it pollutes the
  * corpus — run the suite, fail the batch on any `pass = 0` row.
  *
  * Scale shape: every scalar constraint (not-null, range, pattern,
  * arbitrary predicate) folds into ONE full scan — a single map-side
  * combinable aggregation computing `count(*)` plus one violation sum
  * per constraint; adding constraints adds columns to the agg, not
  * passes over the data. Each uniqueness constraint adds one hash
  * aggregation keyed by its column (map-side partial counting bounds
  * the exchange by distinct values per partition), re-aggregated to a
  * single row. The result is O(constraints) rows — collect-safe.
  */
object Validate {

  /** One declared expectation. `Matches` patterns should stay in the
    * RE2-compatible subset (no backrefs/lookahead) if the suite output
    * must replay in other engines.
    */
  sealed trait Constraint
  final case class NotNull(column: String) extends Constraint
  final case class Unique(column: String) extends Constraint
  final case class InRange(column: String, lo: Long, hi: Long)
      extends Constraint
  final case class Matches(column: String, pattern: String)
      extends Constraint
  /** Arbitrary row predicate (SQL expression string); a NULL predicate
    * result counts as a violation (three-valued logic never hides a
    * bad row).
    */
  final case class Satisfies(name: String, predicate: String)
      extends Constraint
  /** Referential integrity (the foreign-key expectation): every
    * non-null value of `column` must exist in `ref`'s `refColumn`
    * (null handling is [[NotNull]]'s job). One distinct-build +
    * anti-join per constraint — both sides key-only, never wide rows.
    */
  final case class RefIntegrity(column: String, ref: DataFrame,
      refColumn: String) extends Constraint
  /** Dataset-level metric expectation (Deequ's aggregate checks):
    * `metricExpr` is a SQL aggregate evaluated over the whole frame,
    * `predicate` a SQL boolean over its value bound as `_metric`
    * (e.g. `"avg(n_chars)"` with `"_metric BETWEEN 100 AND 400"`).
    * The whole DATASET either passes or violates (`n_violations` is
    * 0 or 1); a NULL metric or predicate counts as a violation. All
    * metric constraints fold into the same single scan aggregation
    * the scalar constraints use.
    */
  final case class AggSatisfies(name: String, metricExpr: String,
      predicate: String) extends Constraint

  private def labelOf(c: Constraint): (String, String, Option[Column]) =
    c match {
      case NotNull(col0) =>
        ("not_null", col0, Some(col(col0).isNull))
      case InRange(col0, lo, hi) =>
        (s"in_range[$lo,$hi]", col0,
          Some(col(col0).isNull || col(col0) < lo || col(col0) > hi))
      case Matches(col0, p) =>
        (s"matches[$p]", col0,
          Some(col(col0).isNull || !col(col0).rlike(p)))
      case Satisfies(name, pred) =>
        (s"satisfies[$name]", "*",
          Some(!coalesce(expr(pred), lit(false))))
      case Unique(col0) => ("unique", col0, None)
      case RefIntegrity(col0, _, refCol) =>
        (s"ref_integrity[$refCol]", col0, None)
      case AggSatisfies(name, _, _) => (s"agg[$name]", "*", None)
    }

  /** Exact numeric column profile (the Deequ profiler tier that feeds
    * constraint suggestion): one row per column with
    * `(column, n_rows, n_null, n_distinct, min, max, sum)` — every
    * stat an exact BIGINT (columns cast to long; the gate never hashes
    * floats). Null-only columns report NULL min/max/sum.
    *
    * Shape for scale: nulls/min/max/sum AND the exact distinct counts
    * for ALL columns fold into ONE scan aggregation (Catalyst plans
    * the multi-column count-distinct through a single Expand pass —
    * map-side partials bound the exchange by distinct values per
    * partition), collected as a single bounded row; the result is a
    * driver-built O(columns) relation, so profiling a 100 TB table
    * costs one scan regardless of how many columns are profiled.
    */
  /** @param approxDistinct use `approx_count_distinct` (HLL++, ~2%
    *                        default error) instead of the exact
    *                        multi-column distinct: drops the Expand
    *                        pass entirely, the cheapest single-scan
    *                        shape for very wide profiles of huge
    *                        tables. [[suggest]]'s Unique inference
    *                        compares n_distinct to the row count, so
    *                        feed it EXACT profiles. */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // integral columns only — the long cast would TRUNCATE doubles
    // silently and mis-profile them; fail loudly instead
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"profile column '$c' must be integral, got ${dt.catalogString}" +
          " (scale floats to integer units upstream)")
    }
    val aggs = count(lit(1)).cast("long").as("_n") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(col(c).isNull.cast("long")).as(s"_nu$i"),
        min(col(c).cast("long")).as(s"_mn$i"),
        max(col(c).cast("long")).as(s"_mx$i"),
        sum(col(c).cast("long")).as(s"_sm$i"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).cast("long").as(s"_nd$i"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val nRows = row.getLong(0)
    def opt(idx: Int): Option[Long] =
      if (row.isNullAt(idx)) None else Some(row.getLong(idx))
    import df.sparkSession.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      (c, nRows, row.getLong(1 + 5 * i), row.getLong(5 + 5 * i),
        opt(2 + 5 * i), opt(3 + 5 * i), opt(4 + 5 * i))
    }.toDF("column", "n_rows", "n_null", "n_distinct",
      "min", "max", "sum")
  }

  /** Constraint suggestion from a [[profile]] result (the Deequ
    * suggestion tier): columns with zero nulls suggest [[NotNull]],
    * columns where every non-null value is distinct suggest
    * [[Unique]], and null-FREE columns suggest [[InRange]] over the
    * observed `[min, max]` ([[InRange]] counts nulls as violations,
    * so a nullable column's range would fail on its own data).
    * Collects the profile (O(columns) rows — bounded); running
    * [[check]] with the suggestions against the SAME data passes by
    * construction — the value is gating FUTURE batches against the
    * shape of a known-good one.
    */
  def suggest(profileDf: DataFrame): Seq[Constraint] =
    profileDf.collect().toSeq.flatMap { r =>
      val c = r.getString(0)
      val nRows = r.getLong(1)
      val nNull = r.getLong(2)
      val nDistinct = r.getLong(3)
      (if (nNull == 0) Seq(NotNull(c)) else Nil) ++
        (if (nDistinct == nRows - nNull && nRows > nNull)
          Seq(Unique(c)) else Nil) ++
        (if (nNull == 0 && !r.isNullAt(4) && !r.isNullAt(5))
          Seq(InRange(c, r.getLong(4), r.getLong(5))) else Nil)
    }

  /** Run the suite: one row per constraint,
    * `(constraint, column, n_rows, n_violations, pass)` — all counts
    * exact, `pass` an int flag. Constraints on missing columns fail at
    * plan time (analysis error), not silently.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "constraint suite must be non-empty")
    val spark = df.sparkSession
    val labeled = constraints.map(labelOf)
    val scalar = labeled.collect { case (l, c, Some(v)) => (l, c, v) }
    val aggc = constraints.collect { case a: AggSatisfies => a }
    val aggs = count(lit(1)).cast("long").as("_n") +:
      (scalar.zipWithIndex.map { case ((_, _, v), i) =>
        sum(v.cast("long")).as(s"_v$i")
      } ++ aggc.zipWithIndex.map { case (a, i) =>
        expr(a.metricExpr).as(s"_m$i")
      })
    // ONE scan computes every scalar violation sum AND every metric;
    // the single result row collects (bounded) and rebuilds as a
    // literal frame, so the unique/ref branches below never re-run
    // the base aggregation
    val oneScan = df.agg(aggs.head, aggs.tail: _*)
    val collected = oneScan.collect().head
    val nRows = collected.getLong(0)
    val one = spark.createDataFrame(
      java.util.Collections.singletonList(collected), oneScan.schema)
    val scalarRows =
      if (scalar.isEmpty) None
      else Some(one.select(explode(array(
        scalar.zipWithIndex.map { case ((l, c, _), i) =>
          struct(lit(l).as("constraint"), lit(c).as("column"),
            col("_n").as("n_rows"),
            coalesce(col(s"_v$i"), lit(0L)).as("n_violations"))
        }: _*)).as("_r")).select(col("_r.*")))
    // each metric evaluates its predicate with the value bound as
    // `_metric`; NULL metric or predicate = the dataset violates
    val aggRows = aggc.zipWithIndex.map { case (a, i) =>
      one.select(col(s"_m$i").as("_metric"))
        .select(lit(s"agg[${a.name}]").as("constraint"),
          lit("*").as("column"), lit(nRows).as("n_rows"),
          when(coalesce(expr(a.predicate), lit(false)), lit(0L))
            .otherwise(lit(1L)).as("n_violations"))
    }
    val uniqueRows = labeled.collect { case ("unique", c, None) =>
      df.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)).as("_c"))
        .filter(col("_c") > 1)
        .agg(coalesce(sum(col("_c")), lit(0L)).as("n_violations"))
        .select(lit("unique").as("constraint"), lit(c).as("column"),
          lit(nRows).as("n_rows"), col("n_violations"))
    }
    val refRows = constraints.collect { case RefIntegrity(c, ref, rc) =>
      df.select(col(c).as("_k")).filter(col("_k").isNotNull)
        .join(ref.select(col(rc).as("_k")).distinct(), Seq("_k"),
          "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(s"ref_integrity[$rc]").as("constraint"),
          lit(c).as("column"), lit(nRows).as("n_rows"),
          col("n_violations"))
    }
    (scalarRows.toSeq ++ aggRows ++ uniqueRows ++ refRows)
      .reduce(_ unionByName _)
      .select(col("constraint"), col("column"), col("n_rows"),
        col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("pass"))
  }
}
