package graft.out

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Output shaping — the reference's `returns`/`returnAsMap`/`returnAsRow`
  * surface (SiddhiStream.java:301-391, StreamOutputHandler.java:62-113):
  * results leave the engine as Row streams, typed objects, maps, or a
  * tagged multi-output union.
  */
object Returns {

  /** `returns(outStreamId, Class[T])` ⇒ typed Dataset (A9 POJO path). */
  def as[T: Encoder](df: DataFrame): Dataset[T] = df.as[T]

  /** `returnAsMap` ⇒ single map<string,string> column (GenericRecord
    * path, utils/GenericRecord.java:24-55). Values stringified — the
    * reference's Map output is Object-valued; string is the lossless
    * lowest common denominator for heterogeneous columns.
    */
  def asMap(df: DataFrame): DataFrame = {
    val pairs = df.columns.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(map(pairs.toIndexedSeq: _*).as("record"))
  }

  /** B25: multiple output streams returned together as one tagged union
    * (`returns(List<String>)` ⇒ Tuple2<streamId, value>,
    * SiddhiStream.java:301-309): every per-stream DataFrame is tagged
    * with its out-stream id and union'd by name.
    */
  def tagged(outputs: (String, DataFrame)*): DataFrame =
    outputs.map { case (id, df) =>
      df.select(lit(id).as("_out_stream"), to_json(struct(col("*"))).as("value"))
    }.reduce(_.unionByName(_))
}
