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
  * Decode comes in two tiers. [[decodeAssets]] / [[resizeAssets]] decode
  * REAL images — JPEG/PNG/GIF/BMP via `javax.imageio` (JVM-builtin, no
  * external media libraries needed) — with deterministic nearest-
  * neighbor resampling, and fall back to the deterministic length-
  * derived stub for payloads that are not a decodable image (audio/video
  * containers would plug in at the same boundary). The pure-Column
  * [[decode]]/[[resize]] stubs remain the declarative, externally-
  * replayable tier used by SQL oracles.
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

  /** [[decodeAssets]] output row. `real_decode` says whether the
    * metadata came from actual pixels (ImageIO) or the deterministic
    * stub fallback; Option fields mirror the Column stub's null
    * propagation for null payloads.
    */
  final case class DecodedAsset(id: Long, media_type: String,
      width: Option[Int], height: Option[Int], n_frames: Option[Int],
      real_decode: Boolean)

  /** [[resizeAssets]] output row. */
  final case class ResizedAsset(id: Long, out_w: Option[Int],
      out_h: Option[Int], content_digest: Option[String],
      real_decode: Boolean)

  /** Container magic bytes for the formats ImageIO ships readers for —
    * the fast reject gate: a 100 TB mixed corpus must not pay ImageIO's
    * reader-registry scan + stream setup per NON-image payload (measured
    * 6× on the decode bench before this gate).
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M')

  /** Raster ceiling for real decodes: 64M pixels (≈256 MB ARGB). A
    * malformed/adversarial header can DECLARE any dimensions — the
    * reader would allocate the raster before noticing the payload ends,
    * and that OutOfMemoryError is not catchable as "not an image". So
    * dims are read from the HEADER first and bounds-checked before any
    * pixel allocation happens.
    */
  private val MaxPixels = 1L << 26
  // frame-count search budget: bounds the per-row header walk when the
  // reader can't report a count without scanning (animated GIF)
  private val MaxFrames = 4096

  /** Header-first ImageIO parse, null-safe and exception-safe:
    * None = not a decodable image (wrong magic, truncated, non-image
    * payload, or a header declaring super-[[MaxPixels]] dimensions).
    * Returns the first frame plus the container's frame count (animated
    * GIFs report their real frame count, not 1).
    */
  private def readImageInfo(payload: Array[Byte])
      : Option[(java.awt.image.BufferedImage, Int)] =
    if (payload == null || payload.length < 8 || !looksLikeImage(payload))
      None
    else
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            r.setInput(iis)
            try {
              val (w, h) = (r.getWidth(0), r.getHeight(0))
              if (w <= 0 || h <= 0 || w.toLong * h.toLong > MaxPixels) None
              else {
                // frame count: ask the cheap metadata question first
                // (`allowSearch = false` is O(1)); only when the reader
                // cannot answer without scanning, walk frame headers
                // under a fixed budget — a hostile container declaring
                // huge frame counts costs O(MaxFrames), not a full
                // per-row stream scan
                val n =
                  try {
                    val k = r.getNumImages(false)
                    if (k > 0) k
                    else {
                      var i = 1
                      try {
                        while (i < MaxFrames && { r.getHeight(i); true })
                          i += 1
                      } catch { case scala.util.control.NonFatal(_) => () }
                      i
                    }
                  } catch { case scala.util.control.NonFatal(_) => 1 }
                Option(r.read(0)).map(img => (img, n))
              }
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  private def readImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    readImageInfo(payload).map(_._1)

  /** The [[decode]] stub's field math on the JVM side — must stay
    * bit-identical to the Column expressions (shared oracle).
    */
  private def stubMeta(n: Long): (String, Int, Int, Int) = (
    if (n % 3 == 0) "image" else if (n % 3 == 1) "audio" else "video",
    (64 + n % 192).toInt, (64 + (n * 7) % 192).toInt, (1 + n % 30).toInt)

  private def md5Hex(chunks: Array[Byte]*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    chunks.foreach(md.update)
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Batched REAL decode: `javax.imageio` parses the payload (JPEG/PNG/
    * GIF/BMP); a payload that is not a decodable image falls back to the
    * deterministic length-derived stub (same values as [[decode]], so a
    * corpus with no real images is still exactly oracle-replayable).
    * Null payload mirrors the stub's null propagation ('video' type,
    * null dimensions).
    *
    * 100 TB shape: partition-wise, `batchSize` rows per kernel call (the
    * boundary a vectorized native decoder slots into); pair with
    * [[partitionForPayloads]] so a task never holds multi-GB of assets.
    */
  def decodeAssets(ds: Dataset[BinAsset],
      batchSize: Int = 64): Dataset[DecodedAsset] = {
    implicit val enc: Encoder[DecodedAsset] = Encoders.product[DecodedAsset]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          readImageInfo(a.payload) match {
            case Some((img, nFrames)) => DecodedAsset(a.id, "image",
              Some(img.getWidth), Some(img.getHeight), Some(nFrames),
              real_decode = true)
            case None if a.payload == null =>
              DecodedAsset(a.id, "video", None, None, None,
                real_decode = false)
            case None =>
              val (mt, w, h, f) = stubMeta(a.payload.length.toLong)
              DecodedAsset(a.id, mt, Some(w), Some(h), Some(f),
                real_decode = false)
          }
        }
      }
    }
  }

  /** Batched REAL resize: decode via ImageIO, aspect-fit into the target
    * box, deterministic NEAREST-NEIGHBOR resample (pure integer source
    * indexing — no Graphics2D rendering-hint nondeterminism), digest =
    * md5 over the resampled ARGB pixels in row-major big-endian order.
    * Non-image payloads fall back to the [[resize]] stub's exact math:
    * aspect-fit over the stub metadata and md5(payload ++ ":WxH") —
    * identical to the Column form for UTF-8 payloads.
    */
  def resizeAssets(ds: Dataset[BinAsset], targetW: Int, targetH: Int,
      batchSize: Int = 64): Dataset[ResizedAsset] = {
    require(targetW >= 1 && targetH >= 1)
    implicit val enc: Encoder[ResizedAsset] = Encoders.product[ResizedAsset]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          readImage(a.payload) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              val scale = math.min(targetW.toDouble / w, targetH.toDouble / h)
              val outW = math.max(1, math.floor(w * scale).toInt)
              val outH = math.max(1, math.floor(h * scale).toInt)
              val md = java.security.MessageDigest.getInstance("MD5")
              val px = new Array[Byte](4)
              var y = 0
              while (y < outH) {
                var x = 0
                while (x < outW) {
                  val v = img.getRGB((x.toLong * w / outW).toInt,
                    (y.toLong * h / outH).toInt)
                  px(0) = (v >>> 24).toByte; px(1) = (v >>> 16).toByte
                  px(2) = (v >>> 8).toByte; px(3) = v.toByte
                  md.update(px)
                  x += 1
                }
                y += 1
              }
              ResizedAsset(a.id, Some(outW), Some(outH),
                Some(md.digest().map(b => f"$b%02x").mkString),
                real_decode = true)
            case None if a.payload == null =>
              ResizedAsset(a.id, None, None, None, real_decode = false)
            case None =>
              val (_, w, h, _) = stubMeta(a.payload.length.toLong)
              val scale = math.min(targetW.toDouble / w, targetH.toDouble / h)
              ResizedAsset(a.id,
                Some(math.floor(w * scale).toInt),
                Some(math.floor(h * scale).toInt),
                Some(md5Hex(a.payload,
                  s":${targetW}x$targetH".getBytes("UTF-8"))),
                real_decode = false)
          }
        }
      }
    }
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

  /** [[dHashAssets]] output row: the 64-bit perceptual difference hash
    * (None for null/empty payloads, which have no pixel content).
    */
  final case class HashedAsset(id: Long, dhash: Option[Long],
      real_decode: Boolean)

  /** dHash grid: 8 rows of 8 horizontal comparisons over 9 sample
    * columns — the standard 64-bit difference hash.
    */
  private val DhW = 9
  private val DhH = 8

  /** 64-bit perceptual difference hash (dHash): nearest-neighbor-sample
    * the image to a 9×8 grayscale grid (integer luma
    * `(77R + 151G + 28B) >> 8` — no float rounding ambiguity), then
    * bit `y*8 + x` = 1 iff `luma(x,y) < luma(x+1,y)`. Two visually
    * near-identical images differ in few bits, so Hamming distance is
    * the image near-dup metric — feed the result to
    * [[Dedup.hammingPairs]] (the simhash banding) for the pair join.
    *
    * Non-image payloads take the deterministic stub tier (same
    * fallback contract as [[decodeAssets]]): the "raster" is the stub
    * metadata's W×H grid whose pixel (sx, sy) is payload byte
    * `(sy*W + sx) mod n` — sampled with the SAME nearest-neighbor
    * indexing, so the whole stub hash is externally replayable in SQL
    * (the q128 oracle). Null/empty payloads hash to None.
    */
  def dHashAssets(ds: Dataset[BinAsset],
      batchSize: Int = 64): Dataset[HashedAsset] = {
    implicit val enc: Encoder[HashedAsset] = Encoders.product[HashedAsset]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          readImage(a.payload) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              def luma(x: Int, y: Int): Int = {
                val v = img.getRGB((x.toLong * w / DhW).toInt,
                  (y.toLong * h / DhH).toInt)
                (77 * ((v >>> 16) & 0xff) + 151 * ((v >>> 8) & 0xff) +
                  28 * (v & 0xff)) >> 8
              }
              var hash = 0L
              var y = 0
              while (y < DhH) {
                var x = 0
                while (x < DhW - 1) {
                  if (luma(x, y) < luma(x + 1, y))
                    hash |= 1L << (y * 8 + x)
                  x += 1
                }
                y += 1
              }
              HashedAsset(a.id, Some(hash), real_decode = true)
            case None if a.payload == null || a.payload.isEmpty =>
              HashedAsset(a.id, None, real_decode = false)
            case None =>
              val n = a.payload.length
              val (_, w, h, _) = stubMeta(n.toLong)
              def luma(x: Int, y: Int): Int = {
                val sx = (x.toLong * w / DhW).toInt
                val sy = (y.toLong * h / DhH).toInt
                a.payload(((sy.toLong * w + sx) % n).toInt) & 0xff
              }
              var hash = 0L
              var y = 0
              while (y < DhH) {
                var x = 0
                while (x < DhW - 1) {
                  if (luma(x, y) < luma(x + 1, y))
                    hash |= 1L << (y * 8 + x)
                  x += 1
                }
                y += 1
              }
              HashedAsset(a.id, Some(hash), real_decode = false)
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
