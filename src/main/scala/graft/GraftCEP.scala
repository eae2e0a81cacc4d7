package graft

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Error surface mirroring the reference's
  * (exception/DuplicatedStreamException.java, UndefinedStreamException.java;
  * guards at SiddhiCEP.java:101-106, exercised SiddhiCEPITCase.java:441-463).
  */
class DuplicatedStreamException(msg: String) extends RuntimeException(msg)
class UndefinedStreamException(msg: String) extends RuntimeException(msg)
class UndefinedFieldException(msg: String) extends RuntimeException(msg)

/** The engine environment — Spark-native equivalent of `SiddhiCEP`
  * (reference: core/src/main/java/org/apache/flink/streaming/siddhi/SiddhiCEP.java:53-54
  * keeps `dataStreams` + `dataStreamSchemas` registries; :174-185 registers;
  * :201-206 registers extensions).
  *
  * Streams are DataFrames (batch or streaming — the DSL below compiles to
  * the same Catalyst plan either way). Registration also creates a temp
  * view so `spark.sql` sees every stream.
  */
class GraftCEP(val spark: SparkSession) {

  private val streams = mutable.LinkedHashMap[String, DataFrame]()
  // ids created by registerStream — appendStream must not union query
  // output into an INPUT stream (that would silently feed results back
  // into the source view); only multi-query OUTPUT streams union
  private val inputStreams = mutable.Set[String]()

  def registerStream(streamId: String, df: DataFrame): this.type = {
    if (streams.contains(streamId))
      throw new DuplicatedStreamException(s"stream '$streamId' already registered")
    streams(streamId) = df
    inputStreams += streamId
    df.createOrReplaceTempView(streamId)
    this
  }

  /** Field-name binding form (reference `registerStream(streamId, ds,
    * fieldNames…)`, SiddhiCEP.java:174-185): the user names the fields,
    * types come from the host schema, unknown names fail fast (reference
    * error surface: StreamSchemaTest.java unknown-field case).
    */
  def registerStream(streamId: String, df: DataFrame,
      fieldNames: String*): this.type = {
    val missing = fieldNames.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new UndefinedFieldException(
        s"stream '$streamId': fields ${missing.mkString(", ")} not in " +
          s"schema [${df.columns.mkString(", ")}]")
    registerStream(streamId,
      if (fieldNames.isEmpty) df else df.select(fieldNames.map(col): _*))
  }

  def getStream(streamId: String): DataFrame =
    streams.getOrElse(streamId,
      throw new UndefinedStreamException(s"stream '$streamId' is not registered"))

  def streamIds: Seq[String] = streams.keys.toSeq

  /** B23: scalar UDF extension (reference `registerExtension`,
    * SiddhiCEP.java:201-206; exercised SiddhiCEPITCase.java:394-410).
    * Prefer native `functions._` in queries — this is the escape hatch.
    */
  def registerFunction(name: String, f: UserDefinedFunction): this.type = {
    spark.udf.register(name, f)
    this
  }

  /** Output-stream insertion: unlike [[registerStream]] (which rejects
    * duplicates), multiple queries inserting into one named output
    * stream UNION their results — the reference runs 3 queries into a
    * single output stream (SiddhiCEPITCase.java:289-293). Schemas must
    * match by name.
    */
  private[graft] def appendStream(streamId: String, df: DataFrame): DataFrame = {
    if (inputStreams.contains(streamId))
      throw new DuplicatedStreamException(
        s"'$streamId' is a registered input stream; queries may only " +
          "insert into output streams")
    val merged = streams.get(streamId)
      .map(_.unionByName(df)).getOrElse(df)
    streams(streamId) = merged
    merged.createOrReplaceTempView(streamId)
    merged
  }

  /** from(streamId): start a fluent query over one stream (B1). */
  def from(streamId: String): StreamQuery =
    new StreamQuery(this, getStream(streamId))

  /** `.cql(planText)` equivalent: compile a plan string — ANSI SQL or
    * the `pattern:` CEP dialect — against the registered stream views
    * (same dialect the dynamic control plane accepts, so static and
    * runtime-added plans share one surface).
    */
  def plan(text: String): DataFrame =
    graft.control.PlanCompiler.compile(spark, text)

  /** A3: union of registered streams by name, null-filling missing
    * columns (reference `union`, SiddhiStream.java:185-257).
    */
  def union(streamIds: String*): StreamQuery = {
    val dfs = streamIds.map(getStream)
    new StreamQuery(this,
      dfs.reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /** A2-flavored envelope: tag every row of each stream with its source
    * streamId and union — the routed multiplexed stream
    * (reference Tuple2<StreamRoute,Object>, SiddhiStream.java:80-100).
    */
  def routedUnion(streamIds: String*): StreamQuery = {
    val dfs = streamIds.map { id =>
      getStream(id).withColumn("_stream_id", lit(id))
    }
    new StreamQuery(this,
      dfs.reduce(_.unionByName(_, allowMissingColumns = true)))
  }
}

object GraftCEP {
  def apply(spark: SparkSession): GraftCEP = new GraftCEP(spark)
}

/** Fluent query surface (≈ the `.cql(...)` capability set, B1-B15/B21-B22
  * expressed as typed combinators instead of a SiddhiQL string — the plan
  * is declared directly against Catalyst, so analysis/validation is eager
  * and pushdown/pruning/codegen are native).
  */
final class StreamQuery private[graft] (env: GraftCEP, private var df: DataFrame) {

  /** B4 filter predicate. */
  def where(cond: Column): StreamQuery = { df = df.filter(cond); this }

  /** B2/B3 projection (select * when empty). */
  def select(cols: Column*): StreamQuery = {
    df = if (cols.isEmpty) df.select(col("*")) else df.select(cols: _*)
    this
  }

  /** B13 group-by aggregation; B15 having via the returned handle. */
  def groupBy(keys: Column*): GroupedQuery = new GroupedQuery(env, df, keys)

  /** B10/B12: join against another registered stream or table. */
  def join(other: String, cond: Column, joinType: String = "inner"): StreamQuery = {
    df = df.join(env.getStream(other), cond, joinType); this
  }

  /** B12 with an explicitly broadcast dimension. */
  def joinBroadcast(other: String, cond: Column, joinType: String = "inner"): StreamQuery = {
    df = df.join(broadcast(env.getStream(other)), cond, joinType); this
  }

  /** B21 partition-with: per-value scoping — recorded as the grouping for
    * downstream stateful ops (Catalyst inserts the hash shuffle).
    */
  def partitionBy(keys: Column*): GroupedQuery = new GroupedQuery(env, df, keys)

  /** B16-B20 via the whole-operator Catalyst path: run a CEP pattern over
    * this stream through [[graft.plans.MatchRecognize]] (one planned hash
    * shuffle; array<struct> match columns, `element_at(col("a"),1)` for
    * Siddhi's `a[0]` access).
    */
  def matchRecognize(partitionKeys: Seq[String], tsCol: String, tieCol: String,
      pattern: Seq[graft.plans.MatchRecognize.Elem],
      withinTs: Option[Long] = None,
      skipPastLastRow: Boolean = false,
      skipToVar: Option[(String, Boolean)] = None): StreamQuery = {
    df = graft.plans.MatchRecognize(df, partitionKeys, tsCol, tieCol,
      pattern, withinTs, skipPastLastRow = skipPastLastRow,
      skipToVar = skipToVar)
    this
  }

  /** B5: insert into a named output stream; repeated inserts into the
    * same output union (reference multi-query-one-output semantics).
    */
  def insertInto(outStreamId: String): DataFrame =
    env.appendStream(outStreamId, df)

  def toDF: DataFrame = df
}

final class GroupedQuery private[graft] (
    env: GraftCEP, df: DataFrame, keys: Seq[Column]) {

  def agg(first: Column, rest: Column*): AggedQuery =
    new AggedQuery(env, df.groupBy(keys: _*).agg(first, rest: _*))
}

final class AggedQuery private[graft] (env: GraftCEP, private var df: DataFrame) {

  /** B15 having. */
  def having(cond: Column): AggedQuery = { df = df.filter(cond); this }

  def insertInto(outStreamId: String): DataFrame =
    env.appendStream(outStreamId, df)

  def toDF: DataFrame = df
}
