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

  /** An in-memory PNG: 8x6, pixel (x,y) = opaque ARGB with R=x*30,
    * G=y*40, B=(x+y)*10 — known values for decode + resample asserts.
    */
  private def fixturePng(w: Int = 8, h: Int = 6): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0xFF000000 | (x * 30 << 16) | (y * 40 << 8) |
        ((x + y) * 10))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeAssets parses REAL PNG pixels; non-images take the stub") {
    val png = fixturePng()
    val txt = "not an image at all".getBytes("UTF-8") // n=19
    val ds = Seq(BinAsset(1L, png), BinAsset(2L, txt),
      BinAsset(3L, null)).toDS()
    val got = Multimodal.decodeAssets(ds).collect().map(d => d.id -> d).toMap
    assert(got(1L).media_type == "image" && got(1L).real_decode)
    assert(got(1L).width.contains(8) && got(1L).height.contains(6))
    // stub fallback must equal the Column stub exactly (n=19: audio,
    // 64+19, 64+133, 1+19)
    assert(!got(2L).real_decode && got(2L).media_type == "audio")
    assert(got(2L).width.contains(83) && got(2L).height.contains(197) &&
      got(2L).n_frames.contains(20))
    // null payload mirrors the Column stub's null propagation
    assert(got(3L).media_type == "video" && got(3L).width.isEmpty)
  }

  test("resizeAssets: real nearest-neighbor pixels, exact digest") {
    val png = fixturePng() // 8x6 → fit in 4x4 box: scale 0.5 → 4x3
    val ds = Seq(BinAsset(1L, png)).toDS()
    val got = Multimodal.resizeAssets(ds, 4, 4).collect().head
    assert(got.real_decode && got.out_w.contains(4) && got.out_h.contains(3))
    // replicate the kernel's resample by hand from the known fixture:
    // src = (x*8/4, y*6/3) = (2x, 2y); ARGB bytes big-endian row-major
    val md = java.security.MessageDigest.getInstance("MD5")
    for (y <- 0 until 3; x <- 0 until 4) {
      val (sx, sy) = (2 * x, 2 * y)
      val v = 0xFF000000 | (sx * 30 << 16) | (sy * 40 << 8) | ((sx + sy) * 10)
      md.update(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte))
    }
    val expect = md.digest().map(b => f"$b%02x").mkString
    assert(got.content_digest.contains(expect))
  }

  test("malformed image header (giant declared dims) falls back, no alloc") {
    // a 'BM' header declaring 100000x100000 pixels: dims are read from
    // the HEADER and bounds-checked BEFORE any raster allocation, so
    // this degrades to the deterministic stub instead of an
    // OutOfMemoryError killing the task
    val b = new Array[Byte](64)
    def put32(off: Int, v: Int): Unit = (0 until 4).foreach(i =>
      b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    b(0) = 'B'; b(1) = 'M'
    put32(2, b.length); put32(10, 54); put32(14, 40)
    put32(18, 100000); put32(22, 100000)
    b(26) = 1; b(28) = 24
    val got = Multimodal.decodeAssets(Seq(BinAsset(1L, b)).toDS())
      .collect().head
    // stub values for n=64: audio (64%3=1), w=128, h=128, f=5
    assert(!got.real_decode && got.media_type == "audio")
    assert(got.width.contains(128) && got.height.contains(128) &&
      got.n_frames.contains(5))
    val rz = Multimodal.resizeAssets(Seq(BinAsset(1L, b)).toDS(), 224, 224)
      .collect().head
    assert(!rz.real_decode && rz.out_w.contains(224))
  }

  test("resizeAssets stub fallback equals the Column resize exactly") {
    val txt = (1L to 40L).map(i => (i, s"payload ${"y" * (i % 23).toInt} $i"))
      .toDF("id", "text")
    val viaKernel = Multimodal.resizeAssets(
        Multimodal.synthesize(txt, "text")
          .select($"id", $"payload").as[BinAsset], 224, 224)
      .collect().map(r => (r.id, r.out_w.get, r.out_h.get,
        r.content_digest.get)).toSet
    val viaColumn = Multimodal.synthesize(txt, "text")
      .select($"id", $"payload", Multimodal.decode($"payload").as("m"))
      .select($"id", Multimodal.resize($"payload", $"m", 224, 224).as("r"))
      .select($"id", $"r.out_w", $"r.out_h", $"r.content_digest")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(viaKernel == viaColumn)
  }

  test("dHashAssets: real-image gradient bits match a pixel-level replay") {
    // horizontal ramp: luma strictly increases left-to-right on every
    // row, so ALL 64 gradient bits are 1 (luma(x,y) < luma(x+1,y))
    val w = 18; val h = 16
    val ramp = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      ramp.setRGB(x, y, 0xFF000000 | (x * 14 << 16) | (x * 14 << 8) |
        (x * 14))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ramp, "png", bos)
    val rampPng = bos.toByteArray
    val got = Multimodal.dHashAssets(Seq(BinAsset(1L, rampPng)).toDS())
      .collect().head
    assert(got.real_decode && got.dhash.contains(-1L)) // all 64 bits set

    // independent pixel-level replay of the fixture PNG's hash
    val png = fixturePng()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    var expect = 0L
    def luma(x: Int, y: Int): Int = {
      val v = img.getRGB(x.toLong.toInt * img.getWidth / 9,
        y * img.getHeight / 8)
      (77 * ((v >>> 16) & 0xff) + 151 * ((v >>> 8) & 0xff) +
        28 * (v & 0xff)) >> 8
    }
    for (y <- 0 until 8; x <- 0 until 8)
      if (luma(x, y) < luma(x + 1, y)) expect |= 1L << (y * 8 + x)
    val fx = Multimodal.dHashAssets(Seq(BinAsset(2L, png)).toDS())
      .collect().head
    assert(fx.real_decode && fx.dhash.contains(expect))
  }

  test("dHashAssets: a one-pixel change moves few bits (near-dup shape)") {
    val png = fixturePng(32, 32)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    img.setRGB(0, 0, 0xFFFFFFFF) // flip one corner pixel to white
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val near = bos.toByteArray
    val hs = Multimodal.dHashAssets(
      Seq(BinAsset(1L, png), BinAsset(2L, near)).toDS())
      .collect().map(a => a.id -> a.dhash.get).toMap
    val hamming = java.lang.Long.bitCount(hs(1L) ^ hs(2L))
    assert(hamming >= 1 && hamming <= 4) // one sampled cell, ≤2 bits/row
    // and the pair survives the pigeonhole banding join
    val pairs = graft.operators.Dedup.hammingPairs(
      Seq((1L, hs(1L)), (2L, hs(2L))).toDF("id", "h"), "h", "id",
      maxHamming = 4, pieces = 8, maxBucket = 0)
      .as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, hamming)))
  }

  test("dHashAssets stub tier replays byte sampling; empty/null hash None") {
    val payload = "abcdefghij".getBytes("UTF-8")
    val n = payload.length
    val w = 64 + n % 192; val h = 64 + (n * 7) % 192
    var expect = 0L
    def luma(x: Int, y: Int): Int =
      payload(((y * h / 8).toLong * w + (x * w / 9)).toInt % n) & 0xff
    for (y <- 0 until 8; x <- 0 until 8)
      if (luma(x, y) < luma(x + 1, y)) expect |= 1L << (y * 8 + x)
    val got = Multimodal.dHashAssets(Seq(
      BinAsset(1L, payload), BinAsset(2L, Array.empty[Byte]),
      BinAsset(3L, null)).toDS())
      .collect().map(a => a.id -> a).toMap
    assert(!got(1L).real_decode && got(1L).dhash.contains(expect))
    assert(got(2L).dhash.isEmpty && got(3L).dhash.isEmpty)
  }

  test("partitionForPayloads sizes partitions by bytes, not rows") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "text")
    val parts = Multimodal.partitionForPayloads(df,
      totalBytes = 10L << 30, targetBytesPerPartition = 1L << 30)
    assert(parts.rdd.getNumPartitions == 10)
  }
}
