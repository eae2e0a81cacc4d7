package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Stream/table source helpers. The reference takes user-supplied Flink
  * `DataStream`s and ships no scans of its own (SURVEY §2.D; tests use
  * inline collections, the experimental module Kafka) — on Spark every
  * source is a one-liner, so this module just names the idiomatic
  * constructions and applies the engine's conventions (explicit schema,
  * event-time column, watermark at the edge).
  */
object Sources {

  /** Batch parquet table (the driver test corpus shape). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** File stream: newly-arriving files under `path` tailed as a stream —
    * schema must be explicit (streaming scans don't infer).
    */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)

  /** Rate source: synthetic `(timestamp, value)` ticks (tests, triggers,
    * throughput probes).
    */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** Kafka topic as a stream — the reference's production transport
    * (experimental/CEPPipeline.scala:50-58). Config-only here: this
    * environment has no broker, but the construction is the standard
    * one; `value` arrives as binary, pair with `from_json` + a schema.
    */
  def kafka(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** JSONL corpus — the crawl-dump interchange format real curation
    * pipelines ingest. Schema is explicit (inference is a full extra
    * pass at 100 TB), and malformed lines are CAPTURED into
    * `_corrupt_record` (PERMISSIVE) so ingest loss is auditable:
    * `df.filter(col("_corrupt_record").isNotNull)` is the reject
    * relation (Spark requires the parse be materialized — cache or
    * write — before a corrupt-only projection). Pass
    * `dropMalformed = true` to discard instead.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
      dropMalformed: Boolean = false): DataFrame = {
    val withCorrupt =
      if (dropMalformed) schema
      else new StructType((schema.fields :+ org.apache.spark.sql.types
        .StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType, nullable = true)).toArray)
    spark.read.schema(withCorrupt)
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** JSONL tailed as a stream (same schema/corrupt-record contract). */
  def jsonlStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withCorrupt = new StructType((schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType, nullable = true)).toArray)
    spark.readStream.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** CSV corpus — the other interchange format metadata tables arrive
    * in (crawl indexes, blocklists, label sheets). Same contract as
    * [[jsonl]]: explicit schema, PERMISSIVE malformed-row capture into
    * `_corrupt_record` as the auditable reject relation (materialize
    * the parse before a corrupt-only projection), or DROPMALFORMED.
    * Header/sep configurable; quotes/escapes are Spark's RFC-4180
    * defaults.
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ",",
      dropMalformed: Boolean = false): DataFrame = {
    val withCorrupt =
      if (dropMalformed) schema
      else new StructType((schema.fields :+ org.apache.spark.sql.types
        .StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType, nullable = true)).toArray)
    spark.read.schema(withCorrupt)
      .option("header", header.toString)
      .option("sep", sep)
      // RFC-4180 doubled-quote escaping (Spark's default escape is the
      // backslash, which no spreadsheet/exporter actually writes)
      .option("escape", "\"")
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
  }

  /** Watermarked event-time edge: timestamp column + allowed lateness,
    * applied once at the source boundary (every downstream stateful op
    * inherits it).
    */
  def withEventTime(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
}
