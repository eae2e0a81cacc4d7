package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The last mile of the pipeline: actually WRITE the corpus layouts
  * that [[TextOps.splitAssign]] and [[TextOps.packSequences]] plan —
  * partitioned parquet with deterministic file routing and in-file
  * ordering, the artifact a training job streams.
  *
  * Scale shape (both writers): ONE shuffle, keyed by the layout's
  * partition unit — `repartition(partition cols)` co-locates each
  * output file's rows in exactly one task, `sortWithinPartitions`
  * orders them with the task-local sorter (spill-capable), and
  * `partitionBy` fans the task's groups into one parquet file per
  * directory. No global sort, no single-task rank bottleneck, no
  * driver materialization — the 100 TB write is the same plan with
  * more executors.
  */
object CorpusWriter {

  /** Materialize [[TextOps.splitAssign]]: `outDir/split=<s>/file_idx=<f>/`
    * holds exactly one parquet file per task-group whose rows are
    * ordered by the decorrelated `shuffle_key` — a deterministic
    * global shuffle of each split, reproducible row-for-row on any
    * cluster. All original columns are kept; `shuffle_key` is written
    * too (provenance + resumable ordering).
    */
  def writeSplits(df: DataFrame, idCol: String, outDir: String,
      splits: Seq[(String, Int)], nFiles: Int = 1): Unit = {
    val plan = TextOps.splitAssign(df, idCol, splits, nFiles)
      .withColumnRenamed("id", "_plan_id")
    df.join(plan, col(idCol).cast("long") === col("_plan_id"))
      .drop("_plan_id")
      .repartition(col("split"), col("file_idx"))
      .sortWithinPartitions(col("split"), col("file_idx"),
        col("shuffle_key"), col(idCol))
      .write.partitionBy("split", "file_idx")
      .mode("overwrite").parquet(outDir)
  }

  /** Materialize [[TextOps.packSequences]]: `outDir/<stratum>=…/shard=<k>/`
    * holds one parquet file whose rows stream in `(pack_id,
    * pack_offset)` order — a sequence-packing consumer reads packs
    * contiguously with zero seeks. Documents keep their columns plus
    * the pack coordinates (`n_tokens`, `pack_id`, `pack_offset`).
    */
  def writePacked(df: DataFrame, textCol: String, idCol: String,
      stratumCol: String, budget: Long, outDir: String,
      shards: Int = 1): Unit = {
    val plan = TextOps.packSequences(df, textCol, idCol, stratumCol,
        budget, shards)
      .select(col("id").as("_plan_id"), col("n_tokens"), col("pack_id"),
        col("pack_offset"))
    df.join(plan, col(idCol).cast("long") === col("_plan_id"))
      .drop("_plan_id")
      // integer shift, not a double divide: FP division is exact only
      // while pack_id < 2^53 (~8192 shards at the full 2^40 pack
      // index); beyond that rows would silently land in the wrong
      // shard directory
      .withColumn("shard", shiftright(col("pack_id"), 40))
      .repartition(col(stratumCol), col("shard"))
      .sortWithinPartitions(col(stratumCol), col("shard"), col("pack_id"),
        col("pack_offset"), col(idCol))
      .write.partitionBy(stratumCol, "shard")
      .mode("overwrite").parquet(outDir)
  }

  /** JSONL export — the interchange format most training stacks
    * ingest: one JSON object per line, one file per (split, file_idx)
    * directory, rows ordered by the decorrelated `shuffle_key` exactly
    * like [[writeSplits]]' parquet form (same plan: one shuffle keyed
    * by the file unit, task-local sort, `partitionBy` fan-out — text
    * sink instead of parquet). Column values serialize via Spark's
    * `to_json` over the full row struct, so nested/array columns
    * survive.
    */
  def writeJsonlSplits(df: DataFrame, idCol: String, outDir: String,
      splits: Seq[(String, Int)], nFiles: Int = 1): Unit = {
    val plan = TextOps.splitAssign(df, idCol, splits, nFiles)
      .withColumnRenamed("id", "_plan_id")
    val joined = df.join(plan, col(idCol).cast("long") === col("_plan_id"))
      .drop("_plan_id")
    val payloadCols = df.columns.map(col)
    joined
      .repartition(col("split"), col("file_idx"))
      .sortWithinPartitions(col("split"), col("file_idx"),
        col("shuffle_key"), col(idCol))
      .select(col("split"), col("file_idx"),
        to_json(struct(payloadCols: _*)).as("value"))
      .write.partitionBy("split", "file_idx")
      .mode("overwrite").text(outDir)
  }

  /** The machine-readable DATA CARD that ships with a curated corpus:
    * every audit relation the pipeline produced (domain stats, cluster
    * histograms, per-language fertility, sketch profiles, …)
    * normalized into ONE long-format relation `(section, entity,
    * metric, value)` and written as parquet partitioned by section —
    * the audit-to-artifact last mile. Each section DataFrame
    * contributes: `entity` = its first column as a string key, one row
    * per remaining column with `metric` = the column name and `value`
    * = the value rendered as a string (exact integer text for
    * integrals — downstream diffs two cards textually).
    *
    * Scale shape: the melt is a scan-side explode of column literals;
    * one shuffle keyed by section, task-local sort, one file per
    * section dir (audit relations are aggregate-sized — a section is
    * at most the cardinality of its group-by key).
    */
  /** On-disk layout audit of a written corpus tree: one row per leaf
    * partition directory with its file count and byte size —
    * `(dir, n_files, n_bytes)` — the shard-balance report that catches
    * a skewed writer before a training job reads 1 fat shard at the
    * pace of its slowest task. Uses the Hadoop FileSystem API, so it
    * audits whatever scheme the corpus was written to; listing cost is
    * O(files), driver-side — file counts are writer-scale, not
    * corpus-scale.
    */
  def layoutStats(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame = {
    import scala.collection.mutable
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = mutable.ArrayBuffer.empty[(String, Long, Long)]
    def walk(p: org.apache.hadoop.fs.Path): Unit = {
      val entries = fs.listStatus(p)
      val (dirs, files) = entries.partition(_.isDirectory)
      val data = files.filterNot(_.getPath.getName.startsWith("_"))
        .filterNot(_.getPath.getName.startsWith("."))
      if (data.nonEmpty)
        rows += ((p.toUri.getPath.stripPrefix(
            path.toUri.getPath).stripPrefix("/"),
          data.length.toLong, data.map(_.getLen).sum))
      dirs.foreach(d => walk(d.getPath))
    }
    walk(path)
    import spark.implicits._
    rows.toSeq.toDF("dir", "n_files", "n_bytes")
  }

  /** Diff two [[writeDataCard]] relations — the corpus-version review
    * artifact: `(section, entity, metric, value_a, value_b, status)`
    * with `status` ∈ changed/added/removed/same (added/removed mean
    * present only in B/only in A). A full-outer join on the card key;
    * cards are aggregate-sized, so this is trivially cheap at any
    * corpus scale.
    */
  def diffDataCards(a: DataFrame, b: DataFrame): DataFrame = {
    val key = Seq("section", "entity", "metric")
    a.select(key.map(col) :+ col("value").as("value_a"): _*)
      .join(b.select(key.map(col) :+ col("value").as("value_b"): _*),
        key, "full_outer")
      .select(col("section"), col("entity"), col("metric"),
        col("value_a"), col("value_b"),
        when(col("value_a").isNull, "added")
          .when(col("value_b").isNull, "removed")
          .when(col("value_a") === col("value_b"), "same")
          .otherwise("changed").as("status"))
  }

  def writeDataCard(sections: Seq[(String, DataFrame)],
      outDir: String): Unit = {
    require(sections.nonEmpty, "data card needs at least one section")
    val long = sections.map { case (name, df) =>
      val cols = df.columns
      require(cols.length >= 2,
        s"section '$name' needs a key column + at least one metric, " +
          s"got ${cols.mkString(",")}")
      df.select(lit(name).as("section"),
          coalesce(col(cols.head).cast("string"), lit("")).as("entity"),
          explode(array(cols.tail.map(c =>
            struct(lit(c).as("m"),
              col(c).cast("string").as("v"))): _*)).as("_mv"))
        .select(col("section"), col("entity"),
          col("_mv.m").as("metric"), col("_mv.v").as("value"))
    }.reduce(_ unionByName _)
    long.repartition(col("section"))
      .sortWithinPartitions(col("section"), col("entity"), col("metric"))
      .write.partitionBy("section")
      .mode("overwrite").parquet(outDir)
  }
}
