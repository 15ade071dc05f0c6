package graft.sources

import org.apache.hadoop.io.{BytesWritable, NullWritable, Text}
import org.apache.hadoop.mapred.SequenceFileOutputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hadoop SequenceFile writers/readers — the reference's remaining
  * HDFS writer family
  * (samza-hdfs/src/main/scala/org/apache/samza/system/hdfs/writer/TextSequenceFileHdfsWriter.scala:1,
  * BinarySequenceFileHdfsWriter.scala:1, SequenceFileHdfsWriter.scala:1):
  * each task appends messages as NullWritable-keyed Text or
  * BytesWritable values. Spark-first mapping: the RDD Hadoop-IO API
  * IS the idiomatic route here (this is genuine per-partition
  * imperative IO, the case the RDD layer exists for) — one sequence
  * file per partition via `saveAsHadoopFile`, distributed read via
  * `sequenceFile`. Size the partitioning upstream exactly as for any
  * file sink ([[Sinks.plannedFileCount]]). Bucketed layouts compose
  * by writing each date-time bucket dir separately, as the
  * reference's Bucketer does around its writers. */
object SequenceFiles {

  /** Write one STRING column as a Text sequence file set under `dir`
    * (TextSequenceFileHdfsWriter analog). */
  def writeText(df: DataFrame, textCol: String, dir: String): Unit =
    df.select(col(textCol).cast("string")).rdd
      .map(r => (NullWritable.get(), new Text(if (r.isNullAt(0)) "" else r.getString(0))))
      .saveAsHadoopFile(dir, classOf[NullWritable], classOf[Text],
        classOf[SequenceFileOutputFormat[NullWritable, Text]])

  /** Write one BINARY column as a BytesWritable sequence file set
    * under `dir` (BinarySequenceFileHdfsWriter analog — the
    * serialized-message form the generic SequenceFileHdfsWriter
    * produces; serialize upstream with to_avro-style encoders or
    * the engine's own serde). */
  def writeBinary(df: DataFrame, binCol: String, dir: String): Unit =
    df.select(col(binCol).cast("binary")).rdd
      .map { r =>
        val b = if (r.isNullAt(0)) Array.emptyByteArray
          else r.getAs[Array[Byte]](0)
        (NullWritable.get(), new BytesWritable(b))
      }
      .saveAsHadoopFile(dir, classOf[NullWritable], classOf[BytesWritable],
        classOf[SequenceFileOutputFormat[NullWritable, BytesWritable]])

  /** Read a Text sequence file set as a one-column DataFrame
    * (`value` string). Hadoop reuses Writable instances per record —
    * the map materializes each to String before the iterator
    * advances, which is why this helper exists instead of pointing
    * users at raw `sequenceFile` (the classic reuse bug yields a file
    * of identical rows). */
  def readText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(dir, classOf[NullWritable], classOf[Text])
      .map(_._2.toString).toDF("value")
  }

  /** Read a BytesWritable sequence file set as a one-column DataFrame
    * (`value` binary). Same instance-reuse copy discipline as
    * [[readText]] (`copyBytes` truncates to the record length —
    * `getBytes` would leak the writable's padded buffer). */
  def readBinary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(dir, classOf[NullWritable], classOf[BytesWritable])
      .map(_._2.copyBytes()).toDF("value")
  }
}
