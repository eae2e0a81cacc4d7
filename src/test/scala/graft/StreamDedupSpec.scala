package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.Hashing
import graft.streaming.StreamDedup

case class SDoc(id: Long, text: String)

object StreamDedupSpec {
  // top-level so the streaming closure doesn't capture the spec class
  private def fp(d: SDoc): Long = Hashing.mix64(
    graft.functions.TextKernelExprs.polyHashEval(
      org.apache.spark.unsafe.types.UTF8String.fromString(d.text)))
  private val fpF: SDoc => Long = fp
  private val orderF: SDoc => Long = _.id
}

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamDedupSpec.{fpF, orderF}

  test("incremental line dedup composes as a foreachBatch ingest loop") {
    // the claimed streaming contract of TextOps.incrementalLineDedup:
    // each micro-batch dedups against the ACCUMULATED line-fingerprint
    // history, then the kept text's fingerprints append — boilerplate
    // that arrived in an earlier batch never survives a later one
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    implicit val sqlCtx = spark.sqlContext
    val boiler = "subscribe to our newsletter for weekly updates"
    val input = MemoryStream[(Long, String)]
    var hist = Seq.empty[Long].toDF("fp")
    val results = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val deduped = TextOps.incrementalLineDedup(
          batch, hist, "text", "doc_id")
        results ++= deduped.select(col("id"), col("text_dedup"))
          .as[(Long, String)].collect()
        hist = hist.unionByName(TextOps.lineFingerprints(
            deduped.select(col("id").as("doc_id"),
              col("text_dedup").as("text")), "text"))
          .distinct().localCheckpoint()
        ()
      }
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, s"first batch unique body line\n$boiler")))
      q.processAllAvailable()
      input.addData(Seq(
        (10L, s"$boiler\nsecond batch fresh content here"),
        (11L, s"second batch fresh content here\nmore new words")))
      q.processAllAvailable()
      val got = results.toMap
      // batch 1 keeps everything (empty history)
      assert(got(1L) == s"first batch unique body line\n$boiler")
      // batch 2: the boilerplate is history-blocked even for id 10's
      // first occurrence; the fresh line repeated WITHIN the batch is
      // kept once by the (id, pos) election (id 10) and dropped at 11
      assert(got(10L) == "second batch fresh content here")
      assert(got(11L) == "more new words")
    } finally q.stop()
  }

  test("first-seen dedup across micro-batches, min-id winner within one") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SDoc]
    val q = StreamDedup.firstSeen(input.toDS(), fpF, orderF)
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    try {
      // batch 1: two copies of A (ids 5, 2) and one B — A's winner is
      // id 2 (min order), B passes
      input.addData(SDoc(5, "content A"), SDoc(2, "content A"),
        SDoc(7, "content B"))
      q.processAllAvailable()
      // batch 2: another copy of A (dropped — state remembers), a fresh C
      input.addData(SDoc(9, "content A"), SDoc(11, "content C"))
      q.processAllAvailable()
      val got = spark.table("sd_out").as[SDoc].collect().map(_.id).toSet
      assert(got == Set(2L, 7L, 11L))
    } finally q.stop()
  }

  test("history-seeded stream continues the batch dedup invariant") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SDoc]
    // the accumulated batch history holds content A's fingerprint
    val history = Seq(fpF(SDoc(0, "content A"))).toDS()
    val q = StreamDedup.firstSeen(input.toDS(), fpF, orderF,
        history = Some(history))
      .writeStream.format("memory").queryName("sd_hist")
      .outputMode("append").start()
    try {
      // A is suppressed by the seeded state; B is fresh and passes;
      // a second B copy in a later batch is dropped by live state
      input.addData(SDoc(1, "content A"), SDoc(2, "content B"))
      q.processAllAvailable()
      input.addData(SDoc(3, "content B"), SDoc(4, "content A"))
      q.processAllAvailable()
      val got = spark.table("sd_hist").as[SDoc].collect().map(_.id).toSet
      assert(got == Set(2L))
    } finally q.stop()
  }

  test("streaming curation chain (quality gate → dedup) matches batch") {
    // the q50 composition live: stateless quality projection + filter
    // composes with the stateful first-seen dedup in ONE streaming plan
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[SDoc]
    val gated = input.toDS()
      .withColumn("_nt", graft.functions.Text
        .qualityFeatures(col("text")).getField("n_tokens"))
      .filter(col("_nt") >= 3).drop("_nt").as[SDoc]
    val q = StreamDedup.firstSeen(gated, fpF, orderF)
      .writeStream.format("memory").queryName("sc_out")
      .outputMode("append").start()
    val docs = Seq(
      SDoc(1, "alpha beta gamma"), SDoc(2, "alpha beta gamma"), // dup of 1
      SDoc(3, "too short"),                                     // gated out
      SDoc(4, "delta epsilon zeta eta"))
    val late = Seq(
      SDoc(5, "alpha beta gamma"),                              // dup again
      SDoc(6, "theta iota kappa"))
    try {
      input.addData(docs)
      q.processAllAvailable()
      input.addData(late)
      q.processAllAvailable()
      val got = spark.table("sc_out").as[SDoc].collect().map(_.id).toSet
      // batch formulation: same gate, min-id election per fingerprint
      val batch = (docs ++ late)
        .filter(d => d.text.split(" ").length >= 3)
        .groupBy(fpF).values.map(_.minBy(_.id).id).toSet
      assert(got == batch, s"streamed $got != batch $batch")
    } finally q.stop()
  }

  test("checkpointed state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    // memory sink can't recover from a checkpoint — write parquet
    val ckDir = java.nio.file.Files.createTempDirectory("sd_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("sd_out").toString
    val input = MemoryStream[SDoc]
    def start() = StreamDedup.firstSeen(input.toDS(), fpF, orderF)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode("append").start()
    val q1 = start()
    try {
      input.addData(SDoc(1, "persistent content"))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      // the same fingerprint after restart must STAY deduplicated
      input.addData(SDoc(2, "persistent content"), SDoc(3, "new content"))
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir).as[SDoc]
        .collect().map(_.id).toSet
      assert(got == Set(1L, 3L))
    } finally q2.stop()
  }
}
