package graft.tools

import graft.SparkSpec

/** Executable evidence for the DecadeSweep replica invariants (r19
  * VERDICT round-20 tasks 3/4): the `_DECADE_DONE` sentinel records
  * (sfDir, copies) and a changed configuration REBUILDS the replica;
  * a base key at or past the per-copy stride fails fast instead of
  * silently colliding copies.
  */
class DecadeSweepSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def writeFixture(dir: String, custkeyBase: Long): Unit = {
    import spark.implicits._
    // the PK/FK closure DecadeSweep replicates — one tiny table each
    Seq((1L, "r")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1L, "n")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((custkeyBase, "c"), (custkeyBase + 1, "c2"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "s")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "p")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L)).toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L)).toDF("event_id", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((1L, "d")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, 0.5)).toDF("vec_id", "v")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("the replica sentinel records (sfDir, copies): a changed copy " +
      "count rebuilds; an unchanged one reuses") {
    val sf = java.nio.file.Files.createTempDirectory("ds-sf").toString
    val out = java.nio.file.Files.createTempDirectory("ds-out").toString
    try {
      writeFixture(sf, custkeyBase = 10L)
      DecadeSweep.buildReplica(spark, sf, out, copies = 2)
      val n2 = spark.read.parquet(s"$out/customer.parquet").count()
      assert(n2 == 4L, s"copies=2 replica rows: $n2")
      val sentinel = java.nio.file.Paths.get(s"$out/_DECADE_DONE")
      val tag2 = new String(java.nio.file.Files.readAllBytes(sentinel))
      assert(tag2.trim == s"$sf|2", tag2)
      // same (sfDir, copies): the replica is reused, not rewritten
      val mtime = java.nio.file.Files.getLastModifiedTime(sentinel)
      DecadeSweep.buildReplica(spark, sf, out, copies = 2)
      assert(java.nio.file.Files.getLastModifiedTime(sentinel) == mtime,
        "unchanged config must reuse the replica")
      // changed copies: REBUILD (the r18 sweep's silent-stale hazard)
      DecadeSweep.buildReplica(spark, sf, out, copies = 3)
      val n3 = spark.read.parquet(s"$out/customer.parquet").count()
      assert(n3 == 6L, s"copies=3 replica rows after rebuild: $n3")
      assert(new String(java.nio.file.Files.readAllBytes(sentinel))
        .trim == s"$sf|3")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sf))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
  }

  test("a base key at or past the per-copy stride fails fast instead " +
      "of colliding copies") {
    val sf = java.nio.file.Files.createTempDirectory("ds-sf2").toString
    val out = java.nio.file.Files.createTempDirectory("ds-out2").toString
    try {
      writeFixture(sf, custkeyBase = 2000000000L) // > the 1e9 stride
      val e = intercept[IllegalArgumentException] {
        DecadeSweep.buildReplica(spark, sf, out, copies = 2)
      }
      assert(e.getMessage.contains("collide") &&
        e.getMessage.contains("c_custkey"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sf))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
  }
}
