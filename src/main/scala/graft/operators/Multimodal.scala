package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) assets as opaque `binary` columns with
  * a typed metadata struct — the 100 TB training-data-pipeline shape:
  * payloads stay byte-opaque to the engine, metadata is columnar and
  * prunable, and per-asset kernels run partition-wise in fixed-size
  * batches (the JVM analogue of `mapInPandas` batch processing: a real
  * implementation hands each batch to a native/vectorized decoder in one
  * call instead of crossing the boundary per row).
  *
  * The decode kernel is a STUB: this environment ships no media
  * libraries, so [[decode]] derives metadata deterministically from the
  * payload bytes (length + content) where a JPEG/WAV/MP4 header parser
  * would plug in. Everything around it — schema, batching, size-aware
  * partitioning — is the real contract and is tested.
  */
object Multimodal {

  /** Typed row for the batched byte-level kernels. */
  final case class BinAsset(id: Long, payload: Array[Byte])

  /** Byte-statistics features (real computation, not stubbed). */
  final case class ByteFeatures(id: Long, n_bytes: Long,
      mean_byte: Double, byte_entropy: Double)

  /** Deterministic fake payloads from a string column — stands in for
    * reading real media files in tests and demo queries.
    */
  def synthesize(df: DataFrame, textCol: String,
      out: String = "payload"): DataFrame =
    df.withColumn(out, col(textCol).cast("binary"))

  /** Decode STUB: binary payload → `struct(media_type, width, height,
    * n_frames)`. A real decoder parses container headers here; the fake
    * derives every field deterministically from the byte length so both
    * the engine and any external oracle can replicate it exactly.
    */
  def decode(bin: Column): Column = {
    val n = octet_length(bin).cast("long")
    struct(
      when(n % 3 === 0, "image").when(n % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      (lit(64) + n % 192).cast("int").as("width"),
      (lit(64) + (n * 7) % 192).cast("int").as("height"),
      (lit(1) + n % 30).cast("int").as("n_frames"))
  }

  /** Frame-sampling plan for video assets: every `everyK`-th frame index
    * from the decoded metadata, as an exploded (asset, frame_idx) row
    * set — the shape a downstream batched frame-decoder consumes. The
    * index arithmetic is real; the actual pixel fetch is the stubbed
    * batch kernel boundary (see [[byteFeatures]]).
    */
  def frameSampleIndices(nFrames: Column, everyK: Int): Column = {
    require(everyK >= 1)
    sequence(lit(0), nFrames.cast("int") - 1, lit(everyK))
  }

  /** Resize STUB: target dimensions clamped to the decoded aspect
    * ratio's nearest fit, plus a deterministic content digest of
    * (payload, target) standing in for the resampled bytes — a real
    * implementation hands the batch to an image library here. All the
    * Spark-side plumbing (metadata math, digest, schema) is real.
    */
  def resize(bin: Column, decoded: Column, targetW: Int,
      targetH: Int): Column = {
    val w = decoded.getField("width").cast("double")
    val h = decoded.getField("height").cast("double")
    // fit inside the target box, preserving aspect ratio
    val scale = least(lit(targetW) / w, lit(targetH) / h)
    struct(
      floor(w * scale).cast("int").as("out_w"),
      floor(h * scale).cast("int").as("out_h"),
      md5(concat(bin.cast("string"), lit(s":${targetW}x$targetH")))
        .as("content_digest"))
  }

  /** Partition-wise batched byte-statistics kernel. Rows are processed
    * in `batchSize` groups — the batch boundary is where a vectorized
    * native call (image decode, resample, embed) would sit; the byte
    * histogram/entropy math itself is real.
    */
  def byteFeatures(ds: Dataset[BinAsset],
      batchSize: Int = 64): Dataset[ByteFeatures] = {
    implicit val enc: Encoder[ByteFeatures] = Encoders.product[ByteFeatures]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one call per BATCH: swap this loop for a vectorized library
        // call over the whole batch when a real decoder is available
        batch.iterator.map { a =>
          val b = a.payload
          if (b == null || b.isEmpty) ByteFeatures(a.id, 0L, 0.0, 0.0)
          else {
            val hist = new Array[Long](256)
            var sum = 0L
            var i = 0
            while (i < b.length) {
              val v = b(i) & 0xff
              hist(v) += 1
              sum += v
              i += 1
            }
            var entropy = 0.0
            var j = 0
            while (j < 256) {
              if (hist(j) > 0) {
                val p = hist(j).toDouble / b.length
                entropy -= p * (math.log(p) / math.log(2.0))
              }
              j += 1
            }
            ByteFeatures(a.id, b.length.toLong, sum.toDouble / b.length, entropy)
          }
        }
      }
    }
  }

  /** Size-aware repartitioning for heavy payload columns: target a fixed
    * number of payload bytes per partition so one task never holds
    * multi-GB of binaries (row counts are meaningless when asset sizes
    * vary 1000×). `totalBytes` comes from table stats or a metadata sum.
    */
  def partitionForPayloads(df: DataFrame, totalBytes: Long,
      targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    df.repartition(parts)
  }
}
