package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container-file writer/reader — the reference's primary
  * HDFS output format
  * (samza-hdfs/src/main/scala/org/apache/samza/system/hdfs/writer/AvroDataFileHdfsWriter.scala:1):
  * each task writes an Avro data file; readers get schema-tagged,
  * splittable records. Spark ships no avro DATA SOURCE on this box
  * (no spark-avro jar), so this maps the format directly onto the
  * core avro library over mapPartitions — one container file per
  * partition, written executor-side through the Hadoop FS API, so
  * the path distributes exactly like any file sink (no driver
  * funnel, no collect).
  *
  * Schema mapping is the standard Spark<->Avro one for the types the
  * engine's tables use: primitives, timestamp-micros (logical type on
  * long), and arrays of primitives. Every field is written as a
  * nullable union, matching Spark's default nullability. */
object AvroFiles {

  /** Avro schema for a Spark schema (record name `graft_record`). */
  def avroSchema(schema: StructType): Schema = {
    val fields = SchemaBuilder.record("graft_record")
      .namespace("graft.avro").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      fs.name(f.name).`type`(
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), fieldSchema(f.dataType))))
        .withDefault(null)
    }.endRecord()
  }

  private def fieldSchema(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case _: TimestampType | _: TimestampNTZType =>
      // timestamp-micros logical type on long — the Avro-standard
      // encoding; reader side restores TimestampType
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case _: DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, _) => Schema.createArray(fieldSchema(et))
    case other => throw new IllegalArgumentException(
      s"AvroFiles: unsupported Spark type $other")
  }

  /** The Spark schema an Avro record schema maps back to. */
  def sparkSchema(avro: Schema): StructType = StructType(
    avro.getFields.asScala.toSeq.map { f =>
      StructField(f.name, sparkType(unwrapNullable(f.schema())),
        nullable = true)
    })

  private def unwrapNullable(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date")
        DateType
      else IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   => ArrayType(sparkType(
      unwrapNullable(s.getElementType)))
    case other => throw new IllegalArgumentException(
      s"AvroFiles: unsupported Avro type $other")
  }

  /** Write `df` as Avro container files under `dir` — one
    * `part-NNNNN.avro` per partition, written on the executors.
    * Size the partitioning upstream (repartition /
    * [[Sinks.plannedFileCount]]) exactly as for parquet. Returns the
    * row count written. */
  def write(df: DataFrame, dir: String): Long = {
    val schemaJson = avroSchema(df.schema).toString
    val sparkSchemaB = df.schema
    val hconfSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val fsPath = new org.apache.hadoop.fs.Path(dir)
    fsPath.getFileSystem(hconfSer.value).mkdirs(fsPath)
    val counts = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.avro")
      val fs = path.getFileSystem(hconfSer.value)
      val out = fs.create(path, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      var n = 0L
      try {
        it.foreach { row =>
          w.append(toRecord(row, sparkSchemaB, schema)); n += 1
        }
      } finally w.close() // closes the stream too
      Iterator.single(n)
    }.collect()
    counts.sum
  }

  private def toRecord(row: Row, st: StructType,
      schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, if (row.isNullAt(i)) null
        else toAvroValue(row.get(i), f.dataType))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType): Any = dt match {
    case _: TimestampType =>
      // micros since epoch, matching the logical type
      val t = v.asInstanceOf[java.sql.Timestamp]
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case _: TimestampNTZType =>
      val t = v.asInstanceOf[java.time.LocalDateTime]
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case _: DateType =>
      v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
    case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(e => if (e == null) null else toAvroValue(e, et))
        .asJava
    case _ => v
  }

  /** Read a dir of Avro container files back as a DataFrame. The
    * schema comes from the first file's embedded writer schema; each
    * file decodes executor-side (binaryFiles distributes whole files,
    * which is exactly the container-file granularity). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hconf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    require(files.nonEmpty, s"AvroFiles.read: no .avro files under $dir")
    val first = new DataFileStream[GenericRecord](
      fs.open(files.head), new GenericDatumReader[GenericRecord]())
    val writerSchema = try first.getSchema finally first.close()
    val st = sparkSchema(writerSchema)
    val schemaJson = writerSchema.toString
    val rows = spark.sparkContext
      .binaryFiles(files.map(_.toString).mkString(","))
      .flatMap { case (_, pds) =>
        val schema = new Schema.Parser().parse(schemaJson)
        val stLocal = sparkSchema(schema)
        val in = new DataFileStream[GenericRecord](pds.open(),
          new GenericDatumReader[GenericRecord](schema))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = in.hasNext; if (!h) in.close(); h
          }
          def next(): Row = fromRecord(in.next(), stLocal)
        }
      }
    spark.createDataFrame(rows, st)
  }

  private def fromRecord(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.map { f =>
      fromAvroValue(rec.get(f.name), f.dataType)
    }.toSeq)

  private def fromAvroValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case _: TimestampType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case _: DateType =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Integer].longValue))
      case StringType => v.toString // avro Utf8 → String
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
        arr
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala.toSeq
          .map(fromAvroValue(_, et))
      case _ => v
    }
}
