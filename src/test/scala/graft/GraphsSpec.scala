package graft

import org.apache.spark.sql.functions._
import graft.operators.Graphs

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed star, dangling mass evaporates") {
    // 1 -> 3, 2 -> 3; node 3 dangles. iter1: r(3) = 150000 +
    // (1e6 + 1e6)*850//1000 = 1850000; sources fall to the base.
    // iter2: r(3) = 150000 + (150000+150000)*850//1000 = 405000.
    val e = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val it1 = Graphs.pageRank(e, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(it1 == Map(1L -> 150000L, 2L -> 150000L, 3L -> 1850000L))
    val it2 = Graphs.pageRank(e, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(it2 == Map(1L -> 150000L, 2L -> 150000L, 3L -> 405000L))
  }

  test("pageRank: cycle is a fixed point under pure propagation") {
    // d=1000: base 0, each node forwards its whole rank around the
    // 3-cycle — 1e6 everywhere at every iteration depth
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    for (k <- Seq(1, 4)) {
      val r = Graphs.pageRank(e, "src", "dst", iters = k,
        dampingPerMille = 1000).as[(Long, Long)].collect().toMap
      assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    }
  }

  test("pageRank: d=0 collapses to the uniform base for any graph") {
    val e = Seq((1L, 2L), (1L, 3L), (3L, 1L), (2L, 1L)).toDF("src", "dst")
    val r = Graphs.pageRank(e, "src", "dst", iters = 3,
      dampingPerMille = 0).as[(Long, Long)].collect().toMap
    assert(r.values.toSet == Set(1000000L) && r.size == 3)
  }

  test("pageRank: out-degree splits contributions with integer floors") {
    // 1 -> {2, 3}: each gets 1e6 div 2; 4 -> 2 adds a full share
    val e = Seq((1L, 2L), (1L, 3L), (4L, 2L)).toDF("src", "dst")
    val r = Graphs.pageRank(e, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) == 150000L + (500000L + 1000000L) * 850L / 1000L)
    assert(r(3L) == 150000L + 500000L * 850L / 1000L)
    assert(r(1L) == 150000L && r(4L) == 150000L)
  }

  test("pageRank: partitioning independence + reliable checkpoint parity") {
    val e = (0L until 120L).map(i => (i, (i * 7 + 1) % 120))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val base = Graphs.pageRank(e, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toSet
    val rep = Graphs.pageRank(e.repartition(13), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toSet
    assert(rep == base)
    val dir = java.nio.file.Files.createTempDirectory("graft-pr").toString
    val ckpt = Graphs.pageRank(e, "src", "dst", iters = 3,
      checkpointDir = Some(dir)).as[(Long, Long)].collect().toSet
    assert(ckpt == base)
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, s"no checkpoint data in $dir")
  }

  test("degreeStats: in/out per node, zero-filled on the missing side") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graphs.degreeStats(e, "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }
}
