package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-suite 10× decade sweep: runs EVERY `SparkEntry.queries` entry
  * at 1× (the given sf dir) and at 10× (the same tables replicated
  * with FK-consistently shifted keys), printing one JSON line per
  * query with both times and the growth ratio. The per-family decade
  * rows in BASELINE.md probe known-heavy chains; this sweep is the
  * net that catches a super-linear grower that never earned its own
  * row.
  *
  * Replication is key-shifted (copy i adds i·10⁹ to every PK/FK),
  * so joins keep resolving and per-key densities stay constant while
  * key cardinalities grow 10× — the same decade model as ScaleProbe.
  * Dimension tables (region, nation) are NOT replicated: group-bys
  * over them keep their cardinality, as they would at 100 TB.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   SPARK_GRAFT_DECADE_DIR=/root/repo/.decade/x10 \
  *   sbt "runMain graft.tools.DecadeSweep"            # all queries
  * Env:
  *   SPARK_GRAFT_COPIES       replication factor (default 10)
  *   SPARK_GRAFT_SWEEP_ONLY   comma-separated query-name filter
  *   SPARK_GRAFT_SWEEP_OUT    also append JSON lines to this file
  */
object DecadeSweep {
  // (table, columns to shift per copy) — the PK/FK closure of the
  // TESTDATA schema; dims region/nation are copied once, unshifted
  private val shiftCols: Seq[(String, Seq[String])] = Seq(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def buildReplica(spark: SparkSession, sfDir: String, outDir: String,
      copies: Int): Unit = {
    val done = new java.io.File(s"$outDir/_DECADE_DONE")
    if (done.exists()) return
    shiftCols.foreach { case (t, cols) =>
      val base = spark.read.parquet(s"$sfDir/$t.parquet")
      val out =
        if (cols.isEmpty) base
        else (0 until copies).map { i =>
          cols.foldLeft(base)((d, c) =>
            d.withColumn(c, col(c) + lit(i.toLong * 1000000000L)))
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"""{"replicated":"$t","copies":${
        if (cols.isEmpty) 1 else copies}}""")
    }
    done.getParentFile.mkdirs(); done.createNewFile(); ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_DECADE_DIR",
      "/root/repo/.decade/x10")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    buildReplica(spark, sfDir, outDir, copies)

    val only = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val sink = sys.env.get("SPARK_GRAFT_SWEEP_OUT").map(p =>
      new java.io.FileWriter(p, true))
    def loadavg: Double =
      scala.util.Try(scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0).toDouble).getOrElse(-1.0)

    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    println(s"""{"sweep_start":true,"n":${names.length},""" +
      s""""copies":$copies,"loadavg":$loadavg}""")
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      try {
        // 1× twice: the first pays per-query codegen/JIT warmup the
        // 10× side would otherwise inherit for free; min() is the
        // honest per-query base
        val w = time(q(spark, sfDir))
        val t1 = math.min(w, time(q(spark, sfDir)))
        val t10 = time(q(spark, outDir))
        val line = f"""{"q":"$n","sec_1x":$t1%.3f,"sec_10x":$t10%.3f,""" +
          f""""growth":${t10 / math.max(t1, 1e-9)}%.2f,""" +
          f""""loadavg":$loadavg%.2f}"""
        println(line)
        sink.foreach { s => s.write(line + "\n"); s.flush() }
      } catch {
        case e: Exception =>
          val line = s"""{"q":"$n","err":"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(120)
              .replace('"', '\'').replace('\n', ' ')}"}"""
          println(line)
          sink.foreach { s => s.write(line + "\n"); s.flush() }
      }
    }
    println(s"""{"sweep_end":true,"loadavg":$loadavg}""")
    sink.foreach(_.close())
    spark.stop()
  }
}
