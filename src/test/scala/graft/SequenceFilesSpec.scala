package graft

import java.nio.file.Files

import graft.sources.{SequenceFiles, Tables}

/** SequenceFile writer family (Text/BytesWritable, the reference's
  * TextSequenceFileHdfsWriter / BinarySequenceFileHdfsWriter
  * analogs): exact round-trips, including the Writable instance-reuse
  * and padded-buffer traps the readers guard against. */
class SequenceFilesSpec extends SparkSpec {

  test("text sequence files round-trip the documents text exactly") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft-seq").toString + "/t"
    val docs = Tables.load(s, sf001, "documents").limit(300)
    SequenceFiles.writeText(docs.repartition(3), "text", out)
    val back = SequenceFiles.readText(s, out)
    assert(back.count() == 300)
    // multiset equality — sequence files carry no order
    val a = docs.select("text").as[String].collect().sorted.toSeq
    val b = back.as[String].collect().sorted.toSeq
    assert(a == b)
  }

  test("binary sequence files round-trip exact byte lengths") {
    val s = spark
    import s.implicits._
    // lengths straddle BytesWritable's buffer-doubling so a getBytes
    // (padded) bug would show as trailing zeros
    val blobs = (0 until 100)
      .map(i => Tuple1(Array.tabulate[Byte](i * 7 + 1)(j => (i + j).toByte)))
      .toDF("value")
    val out = Files.createTempDirectory("graft-seq").toString + "/b"
    SequenceFiles.writeBinary(blobs.repartition(4), "value", out)
    val back = SequenceFiles.readBinary(s, out).as[Array[Byte]].collect()
    assert(back.length == 100)
    val a = blobs.as[Array[Byte]].collect().map(_.toSeq).sortBy(_.length)
    val b = back.map(_.toSeq).sortBy(_.length)
    assert(a.toSeq == b.toSeq)
  }
}
