package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Hll, Text}
import graft.operators.{Dedup, Similarity, TextOps}

/** The 100 TB training-data pipeline composed end-to-end from the
  * library's operators: exact dedup → quality filter → language filter
  * → chunk-level dedup audit → near-duplicate removal → per-language
  * sample + sketch profile → embedding-space neighbor audit. Every
  * stage is a declarative DataFrame transform — at scale the same code
  * runs unchanged with more executors (no stage collects, no all-pairs
  * joins, fingerprint-only shuffles).
  *
  * Run: `sbt "runMain graft.examples.TrainingDataPipeline [sfDir]"`
  */
object TrainingDataPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents")
    println(s"STAGE ingest          n=${docs.count()}")

    // 1. exact dedup: fingerprint winner election, text never shuffles
    val exact = Dedup.exact(docs, "text", "doc_id")
    println(s"STAGE exact_dedup     n=${exact.count()}")

    // 2. quality gate: token count + stopword ratio (native expressions)
    val f = Text.qualityFeatures(col("text"))
    val quality = exact
      .withColumn("n_tokens", f.getField("n_tokens"))
      .withColumn("sw", f.getField("stopword_ratio"))
      .filter(col("n_tokens") >= 10)
      .drop("n_tokens", "sw")
    println(s"STAGE quality_filter  n=${quality.count()}")

    // 3. language filter: n-gram marker language id
    val english = quality.filter(Text.langId(col("text")) === "en")
    println(s"STAGE lang_en         n=${english.count()}")

    // 3b. chunk-level novelty audit: fraction of 50-word chunks this doc
    // is the first to contribute corpus-wide (CCNet-style)
    val novelty = TextOps.chunkDedupStats(english, "text", "doc_id")
    val lowNovel = novelty.filter(col("n_kept") * 2 < col("n_chunks")).count()
    println(s"STAGE chunk_audit     low_novelty=$lowNovel")

    // 4. near-dup removal: MinHash-LSH candidates, keep the lower doc_id
    val nearPairs = Dedup.minhashPairs(english, "text", "doc_id",
      threshold = 0.8)
    val losers = nearPairs.select(col("id_b").as("doc_id")).distinct()
    val kept = english.join(losers, Seq("doc_id"), "left_anti")
    println(s"STAGE near_dedup      n=${kept.count()} " +
      s"(removed ${losers.count()} near-dups)")

    // 4b. per-language profile + deterministic eyeball sample: HLL
    // distinct-user... distinct-document sketch per language (256 B of
    // state per group) and 3 reproducible docs per language for review
    val profile = kept.groupBy(col("lang"))
      .agg(Hll.sketch(col("doc_id")).as("r"), count(lit(1)).as("n"))
      .select(col("lang"), col("n"), Hll.estimate(col("r")).as("est_docs"))
    profile.collect().foreach(r =>
      println(s"STAGE profile         lang=${r.getString(0)} " +
        s"n=${r.getLong(1)} hll_est=${r.getLong(2)}"))
    val eyeball = TextOps.topKSample(kept, "doc_id", "lang", k = 3)
    println(s"STAGE eyeball_sample  n=${eyeball.count()}")

    // 5. embedding-space audit: multi-probe LSH top-3 neighbors for a
    // query sample — the index-building shape for retrieval curation
    val emb = Tables.load(spark, sfDir, "embeddings")
    val sample = emb.filter(col("vec_id") % 100 === 0)
    val neighbors = Similarity.lshTopK(emb, sample, "embedding", "vec_id",
      dim = 64, k = 3, nPlanes = 8, multiProbe = 4)
    println(s"STAGE ann_audit       pairs=${neighbors.count()}")

    println("PIPELINE-DONE")
    spark.stop()
  }
}
