package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Streams in the reference are user-registered named inputs
  * (reference: core/src/main/java/org/apache/flink/streaming/siddhi/SiddhiCEP.java:174-185);
  * here the equivalent registry entry is a named DataFrame per table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map { n =>
      val df = load(spark, dir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
}
