package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.operators.{CorpusWriter, TextOps}

class CorpusWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-cw-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def subdirs(p: String): Set[String] =
    Files.list(Paths.get(p)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet

  private def parquetFiles(p: String): Seq[String] =
    Files.list(Paths.get(p)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq

  test("writeSplits lays out split=/file_idx= dirs, one file each, " +
      "sorted by shuffle_key, routing exactly the plan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = tmpDir("splits")
    val splits = Seq("train" -> 900, "val" -> 50, "test" -> 50)
    CorpusWriter.writeSplits(docs, "doc_id", out, splits, nFiles = 3)

    assert(subdirs(out) == Set("split=train", "split=val", "split=test"))
    for (s <- Seq("train", "val", "test");
         fdirs = subdirs(s"$out/split=$s")) {
      assert(fdirs.subsetOf((0 until 3).map(i => s"file_idx=$i").toSet)
        && fdirs.nonEmpty)
      for (fd <- fdirs) {
        val files = parquetFiles(s"$out/split=$s/$fd")
        assert(files.size == 1, s"one parquet file per dir, got $files")
        // in-file order: shuffle_key ascending
        val keys = spark.read.parquet(files.head)
          .select("shuffle_key").as[Long].collect().toSeq
        assert(keys == keys.sorted, s"rows in $fd not in shuffle order")
      }
    }
    // round trip: every doc lands exactly once, in the planned split
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val plan = TextOps.splitAssign(docs, "doc_id", splits, nFiles = 3)
    val mismatched = back.select(col("doc_id"), col("split"),
        col("file_idx").cast("long").as("file_idx"))
      .join(plan.select(col("id").as("doc_id"),
        col("split").as("p_split"), col("file_idx").as("p_file")),
        Seq("doc_id"))
      .filter(col("split") =!= col("p_split") ||
        col("file_idx") =!= col("p_file"))
      .count()
    assert(mismatched == 0L)
  }

  test("writePacked streams packs contiguously per stratum/shard") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = tmpDir("packed")
    CorpusWriter.writePacked(docs, "text", "doc_id", "lang",
      budget = 2048, outDir = out, shards = 2)

    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(subdirs(out) == langs.map(l => s"lang=$l"))
    for (l <- langs; sd <- subdirs(s"$out/lang=$l")) {
      val files = parquetFiles(s"$out/lang=$l/$sd")
      assert(files.size == 1)
      val coords = spark.read.parquet(files.head)
        .select("pack_id", "pack_offset").as[(Long, Long)].collect().toSeq
      assert(coords == coords.sorted, s"pack stream out of order in $sd")
      // offsets stay inside the budget
      assert(coords.forall(_._2 < 2048))
    }
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // shard dir matches the pack_id's high bits
    val badShard = back
      .filter((col("pack_id") / lit(1L << 40)).cast("long") =!=
        col("shard").cast("long")).count()
    assert(badShard == 0L)
  }

  test("writeJsonlSplits: same routing as parquet, valid JSON lines") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val out = tmpDir("jsonl")
    val splits = Seq(("train", 900), ("val", 100))
    CorpusWriter.writeJsonlSplits(docs, "doc_id", out, splits, nFiles = 2)
    assert(subdirs(out) == Set("split=train", "split=val"))
    // every line parses back; the union round-trips the corpus
    val back = spark.read.json(spark.read.textFile(s"$out/*/*"))
    assert(back.count() == docs.count())
    assert(back.columns.sorted.toSeq == Seq("doc_id", "lang", "text"))
    val joined = back.join(docs.withColumnRenamed("text", "t2"),
      Seq("doc_id"))
    assert(joined.filter(col("text") =!= col("t2")).count() == 0)
    // in-file order follows the same decorrelated shuffle_key as the
    // parquet writer: line order within a file is the plan's order
    val plan = graft.operators.TextOps.splitAssign(docs, "doc_id",
      splits, nFiles = 2)
    val f0 = Files.list(Paths.get(s"$out/split=train/file_idx=0"))
      .iterator().asScala
      .filter(p => !p.getFileName.toString.startsWith("."))
      .map(_.toString).filter(_.contains("part-")).toSeq
    assert(f0.size == 1)
    val lineIds = spark.read.json(spark.read.textFile(f0.head))
      .select("doc_id").as[Long].collect().toSeq
    val expIds = plan.filter(col("split") === "train" &&
        col("file_idx") === 0)
      .orderBy(col("shuffle_key"), col("id")).select("id")
      .as[Long].collect().toSeq
    assert(lineIds == expIds)
  }

  test("layoutStats reports per-leaf-dir file counts and bytes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = tmpDir("stats")
    CorpusWriter.writeSplits(docs, "doc_id", out,
      Seq(("train", 900), ("val", 100)), nFiles = 2)
    val stats = CorpusWriter.layoutStats(spark, out)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // one parquet file per (split, file_idx) leaf, nonzero bytes
    val leaves = stats.keys.filter(_.contains("file_idx=")).toSeq
    assert(leaves.size == 4, s"got dirs ${stats.keys}")
    assert(stats.values.forall { case (nf, nb) => nf == 1L && nb > 0L })
    // sizes reconcile with the filesystem
    val onDisk = Files.walk(Paths.get(out)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.startsWith("."))
      .filterNot(_.getFileName.toString.startsWith("_"))
      .map(Files.size(_)).sum
    assert(stats.values.map(_._2).sum == onDisk)
  }

  test("diffDataCards: changed/added/removed/same between versions") {
    val out1 = tmpDir("cardA"); val out2 = tmpDir("cardB")
    CorpusWriter.writeDataCard(Seq(("s",
      Seq(("en", 10L), ("de", 4L)).toDF("lang", "n"))), out1)
    CorpusWriter.writeDataCard(Seq(("s",
      Seq(("en", 12L), ("fr", 2L)).toDF("lang", "n"))), out2)
    val diff = CorpusWriter.diffDataCards(
        spark.read.parquet(out1), spark.read.parquet(out2))
      .as[(String, String, String, Option[String], Option[String], String)]
      .collect().map(r => r._2 -> r).toMap
    assert(diff("en") == (("s", "en", "n", Some("10"), Some("12"),
      "changed")))
    assert(diff("de")._6 == "removed" && diff("fr")._6 == "added")
    // identical cards diff to all-same
    val same = CorpusWriter.diffDataCards(
      spark.read.parquet(out1), spark.read.parquet(out1))
    assert(same.filter(col("status") =!= "same").count() == 0)
  }

  test("writeDataCard melts heterogeneous audits into section dirs") {
    val out = tmpDir("card")
    val langStats = Seq(("en", 10L, 950L), ("de", 4L, 380L))
      .toDF("lang", "n_docs", "n_words")
    val hist = Seq((1L, 90L), (2L, 5L)).toDF("cluster_size", "n_clusters")
    CorpusWriter.writeDataCard(Seq(
      ("lang_profile", langStats), ("cluster_sizes", hist)), out)
    // on-disk evidence: one dir per section, exactly one parquet each
    assert(subdirs(out) == Set("section=lang_profile",
      "section=cluster_sizes"))
    assert(parquetFiles(s"$out/section=lang_profile").size == 1)
    // the melt: one row per (entity, non-key column), values as exact
    // integer text, ordered (entity, metric) within the section file
    val langRows = spark.read
      .parquet(parquetFiles(s"$out/section=lang_profile").head)
      .select("entity", "metric", "value")
      .as[(String, String, String)].collect().toSeq
    assert(langRows == Seq(
      ("de", "n_docs", "4"), ("de", "n_words", "380"),
      ("en", "n_docs", "10"), ("en", "n_words", "950")))
    val all = spark.read.parquet(out)
    assert(all.count() == 2 * 2 + 2 * 1)
    // a single-column section has no metrics to melt: loud error
    val e = intercept[IllegalArgumentException] {
      CorpusWriter.writeDataCard(
        Seq(("bad", Seq("x").toDF("only"))), tmpDir("card2"))
    }
    assert(e.getMessage.contains("needs a key column"))
  }

  test("publishSplits commits atomically; readCommitted round-trips") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(200).localCheckpoint()
    val out = tmpDir("pub") + "/corpus"
    CorpusWriter.publishSplits(docs, "doc_id", out,
      Seq("train" -> 900, "val" -> 100), nFiles = 2)
    // committed: manifest present, readCommitted returns the corpus
    assert(Files.exists(Paths.get(out, CorpusWriter.ManifestFile)))
    val back = CorpusWriter.readCommitted(spark, out)
    assert(back.count() == docs.count())
    // no staging dirs left behind
    val parent = Paths.get(out).getParent
    val leftovers = Files.list(parent).iterator().asScala
      .map(_.getFileName.toString).filter(_.contains("staging")).toSeq
    assert(leftovers.isEmpty, s"staging dirs left behind: $leftovers")
    // an unmanifested dir (plain writer) is refused
    val plain = tmpDir("plain")
    CorpusWriter.writeSplits(docs, "doc_id", plain,
      Seq("train" -> 1000), nFiles = 1)
    val e1 = intercept[IllegalStateException] {
      CorpusWriter.readCommitted(spark, plain)
    }
    assert(e1.getMessage.contains("never committed"))
  }

  test("a write killed mid-stream leaves the previous corpus intact " +
      "and the partial output invisible") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(100).localCheckpoint()
    val out = tmpDir("kill") + "/corpus"
    CorpusWriter.publishSplits(docs, "doc_id", out,
      Seq("train" -> 1000), nFiles = 1)
    val before = CorpusWriter.readCommitted(spark, out).count()
    // second publication dies AFTER writing real partial data
    val boom = intercept[RuntimeException] {
      CorpusWriter.publish(spark, out) { staging =>
        CorpusWriter.writeSplits(docs.limit(10), "doc_id", staging,
          Seq("train" -> 1000), nFiles = 1)
        throw new RuntimeException("executor lost mid-write")
      }
    }
    assert(boom.getMessage.contains("mid-write"))
    // the OLD corpus is still the committed one, bit-for-bit readable
    assert(CorpusWriter.readCommitted(spark, out).count() == before)
    val parent = Paths.get(out).getParent
    val leftovers = Files.list(parent).iterator().asScala
      .map(_.getFileName.toString).filter(_.contains("staging")).toSeq
    assert(leftovers.isEmpty, s"failed staging not cleaned: $leftovers")
    // a successful re-publish replaces the corpus and leaves no
    // .old-* aside-dirs behind (the rename-aside swap cleans up)
    CorpusWriter.publishSplits(docs.limit(25), "doc_id", out,
      Seq("train" -> 1000), nFiles = 1)
    assert(CorpusWriter.readCommitted(spark, out).count() == 25)
    val olds = Files.list(parent).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.contains(".old-") || n.contains("staging")).toSeq
    assert(olds.isEmpty, s"aside dirs left behind: $olds")
  }

  test("publishDataCard commits the card atomically") {
    val out = tmpDir("pubcard") + "/card"
    CorpusWriter.publishDataCard(Seq(
      ("lang_profile", Seq(("en", 10L), ("de", 4L)).toDF("lang", "n_docs"))),
      out)
    val back = CorpusWriter.readCommitted(spark, out)
    assert(back.count() == 2)
    assert(Files.exists(Paths.get(out, CorpusWriter.ManifestFile)))
  }

  test("readCommitted refuses a manifested tree with a mutilated file") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(50).localCheckpoint()
    val out = tmpDir("torn") + "/corpus"
    CorpusWriter.publishSplits(docs, "doc_id", out,
      Seq("train" -> 1000), nFiles = 1)
    // delete one manifested data file (a half-copied object-store tree)
    val victim = Files.walk(Paths.get(out)).iterator().asScala
      .find(p => p.toString.endsWith(".parquet")).get
    Files.delete(victim)
    val e = intercept[IllegalStateException] {
      CorpusWriter.readCommitted(spark, out)
    }
    assert(e.getMessage.contains("torn"))
  }
}
