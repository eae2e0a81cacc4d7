package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{BinAsset, ByteFeatures}

/** Binary-column plumbing: schema, decode stub determinism, batched
  * kernel correctness and batching invariance.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize + decode yields a typed metadata struct") {
    val df = Seq((1L, "abc"), (2L, "abcd")).toDF("id", "text")
    val m = Multimodal.synthesize(df, "text")
      .select($"id", Multimodal.decode($"payload").as("m"))
      .select($"id", $"m.media_type", $"m.width", $"m.height", $"m.n_frames")
      .as[(Long, String, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // n=3: image, w=64+3, h=64+21, f=1+3; n=4: audio, w=68, h=92, f=5
    assert(m(1L) == (("image", 67, 85, 4)))
    assert(m(2L) == (("audio", 68, 92, 5)))
  }

  test("byteFeatures computes exact histogram statistics") {
    val ds = Seq(
      BinAsset(1L, "abc".getBytes("UTF-8")), // 97,98,99: uniform over 3
      BinAsset(2L, Array[Byte](0, 0, 0, 0)), // constant: zero entropy
      BinAsset(3L, Array.empty[Byte])).toDS()
    val got = Multimodal.byteFeatures(ds).collect()
      .map(f => f.id -> f).toMap
    assert(got(1L).n_bytes == 3 && got(1L).mean_byte == 98.0)
    assert(math.abs(got(1L).byte_entropy - math.log(3.0) / math.log(2.0)) < 1e-9)
    assert(got(2L) == ByteFeatures(2L, 4L, 0.0, 0.0))
    assert(got(3L) == ByteFeatures(3L, 0L, 0.0, 0.0))
  }

  test("batched kernel output is invariant to batch size") {
    val ds = (1L to 200L).map(i =>
      BinAsset(i, s"payload-$i-${"x" * (i % 17).toInt}".getBytes("UTF-8"))).toDS()
    val b1 = Multimodal.byteFeatures(ds, batchSize = 1).collect().sortBy(_.id)
    val b64 = Multimodal.byteFeatures(ds, batchSize = 64).collect().sortBy(_.id)
    assert(b1.toSeq == b64.toSeq)
  }

  test("partitionForPayloads sizes partitions by bytes, not rows") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "text")
    val parts = Multimodal.partitionForPayloads(df,
      totalBytes = 10L << 30, targetBytesPerPartition = 1L << 30)
    assert(parts.rdd.getNumPartitions == 10)
  }
}
