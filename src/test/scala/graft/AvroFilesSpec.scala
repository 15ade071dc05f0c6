package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AvroFiles, Tables}

/** Avro container-file writer/reader (the reference's
  * AvroDataFileHdfsWriter analog): schema mapping and an exact
  * round-trip over the real tables, including timestamp-micros and
  * array columns. */
class AvroFilesSpec extends SparkSpec {

  test("events round-trips through Avro container files exactly") {
    val s = spark
    val out = Files.createTempDirectory("graft-avro").toString + "/events"
    val events = Tables.load(s, sf001, "events")
      .limit(2000).repartition(3)
    val n = AvroFiles.write(events, out)
    assert(n == 2000)
    val back = AvroFiles.read(s, out)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val a = events.orderBy("event_id").collect().toSeq
    val b = back.orderBy("event_id")
      .select(events.columns.map(col).toIndexedSeq: _*).collect().toSeq
    assert(a == b)
  }

  test("array columns (embeddings) survive the round-trip") {
    val s = spark
    val out = Files.createTempDirectory("graft-avro").toString + "/emb"
    val emb = Tables.load(s, sf001, "embeddings").limit(200)
    AvroFiles.write(emb, out)
    val back = AvroFiles.read(s, out)
    val a = emb.orderBy("vec_id").collect().toSeq
    val b = back.orderBy("vec_id")
      .select(emb.columns.map(col).toIndexedSeq: _*).collect().toSeq
    assert(a == b)
  }

  test("one container file per partition") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft-avro").toString + "/p"
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(5)
    AvroFiles.write(df, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    assert(AvroFiles.read(s, out).count() == 100)
  }
}
