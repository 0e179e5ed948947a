package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC *file* source — the reference's easy-format Arrow reader
  * (`exec/store/easy/arrow/ArrowFormatPluginConfig.java`, reader
  * `ArrowRecordReader.java`): query result exports and inter-engine
  * handoffs stored as Arrow record batches.
  *
  * Spark-first shape: files are listed once on the driver (names only),
  * the PATH list is distributed, and each task decodes its files' record
  * batches through the official `org.apache.arrow.vector` API (already on
  * Spark's classpath — Spark itself speaks Arrow for pandas/Connect
  * interchange). Rows stream out of an iterator batch by batch, so task
  * memory is O(batch + file buffer), and per-file parallelism scales with
  * the file count — the same distribution contract as the easy-format
  * readers in the reference. Like those readers, this is a
  * row-materializing conversion (no pushdown INTO the arrow file; Spark
  * prunes/filters the produced rows in the plan above).
  */
object ArrowFiles {

  private def toSparkType(f: Field): DataType = f.getType match {
    case i: ArrowType.Int => i.getBitWidth match {
      case 64 => LongType
      case 32 => IntegerType
      case 16 => ShortType
      case 8 => ByteType
      case w => throw new UnsupportedOperationException(s"int$w arrow field ${f.getName}")
    }
    case fp: ArrowType.FloatingPoint => fp.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
      case p => throw new UnsupportedOperationException(s"fp $p arrow field ${f.getName}")
    }
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Binary => BinaryType
    case t => throw new UnsupportedOperationException(
      s"arrow type $t of field ${f.getName} not supported by the easy reader")
  }

  private def listArrowFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stat = fs.getFileStatus(path)
    val files =
      if (stat.isDirectory) fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(path)
    files.map(_.toString).filter(p => p.endsWith(".arrow") || p.endsWith(".arrows") ||
      !p.substring(p.lastIndexOf('/') + 1).startsWith(".")).sorted
  }

  /** Schema of the files at `dir` (reads one footer on the driver). */
  def schemaOf(spark: SparkSession, dir: String): StructType = {
    val first = listArrowFiles(spark, dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no arrow files under $dir"))
    val alloc = new RootAllocator()
    try {
      val r = new ArrowFileReader(
        new ByteArrayReadableSeekableByteChannel(readBytesLocal(first,
          org.apache.spark.sql.graft.Bridge.hadoopConf(spark))), alloc)
      try StructType(r.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
        .map(f => StructField(f.getName, toSparkType(f), f.isNullable)))
      finally r.close()
    } finally alloc.close()
  }

  /** All record batches of all files under `dir` as a DataFrame. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schema = schemaOf(spark, dir)
    val files = listArrowFiles(spark, dir)
    import spark.implicits._
    val parallelism = math.min(math.max(files.size, 1),
      spark.sparkContext.defaultParallelism)
    // ship the SESSION Hadoop conf (spark.hadoop.* — object-store creds,
    // defaultFS) into the read tasks; a bare executor-side Configuration()
    // resolves the wrong FileSystem on any non-local scheme
    val hconf = org.apache.spark.sql.graft.Bridge.serializableHadoopConf(spark)
    spark.createDataset(files).repartition(parallelism)
      .mapPartitions(paths =>
        paths.flatMap(p => fileRows(p, schema, hconf.value)))(Encoders.row(schema))
  }

  /** Lazy row iterator over one file's record batches; the reader and its
    * allocator close when the iterator exhausts (or the file is empty). */
  private def fileRows(file: String, schema: StructType,
                       conf: org.apache.hadoop.conf.Configuration): Iterator[Row] = {
    val alloc = new RootAllocator()
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(readBytesLocal(file, conf)), alloc)
    val root = reader.getVectorSchemaRoot
    val nFields = schema.size
    new Iterator[Row] {
      private var rowIdx = 0
      private var batchRows = 0
      private var closed = false
      private def advance(): Unit =
        while (!closed && rowIdx >= batchRows) {
          if (reader.loadNextBatch()) { batchRows = root.getRowCount; rowIdx = 0 }
          else { reader.close(); alloc.close(); closed = true }
        }
      override def hasNext: Boolean = { advance(); !closed }
      override def next(): Row = {
        advance()
        if (closed) throw new NoSuchElementException
        val vals = new Array[Any](nFields)
        var i = 0
        while (i < nFields) {
          vals(i) = root.getVector(i).getObject(rowIdx) match {
            case null => null
            case t: org.apache.arrow.vector.util.Text => t.toString
            case other => other
          }
          i += 1
        }
        rowIdx += 1
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }
  }

  // whole-file slurp against the CALLER-supplied Hadoop conf (session conf
  // on the driver, a shipped SerializableConfiguration in tasks — never a
  // bare Configuration(), which drops spark.hadoop.* credentials)
  private def readBytesLocal(file: String,
                             conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val path = new org.apache.hadoop.fs.Path(file)
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen.toInt
    val in = fs.open(path)
    try { val buf = new Array[Byte](len); in.readFully(0, buf); buf }
    finally in.close()
  }

  // ---------- writer (the reference plugin also exports arrow) ----------

  private def toArrowField(f: StructField): pojo.Field = {
    val t: ArrowType = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case ShortType => new ArrowType.Int(16, true)
      case ByteType => new ArrowType.Int(8, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BooleanType => ArrowType.Bool.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case dt => throw new UnsupportedOperationException(
        s"column ${f.name}: $dt has no easy arrow mapping")
    }
    new pojo.Field(f.name, pojo.FieldType.nullable(t), null)
  }

  /** Write `df` as one Arrow IPC file per partition under `dir` (each task
    * streams its rows out in `batchRows`-sized record batches — O(batch)
    * task memory, per-partition parallelism, unique task filenames). */
  def write(df: DataFrame, dir: String, batchRows: Int = 4096): Unit = {
    val schema = df.schema
    schema.fields.foreach(toArrowField) // validate mapping on the driver
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(dir))
    val hconf = org.apache.spark.sql.graft.Bridge
      .serializableHadoopConf(df.sparkSession)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val path = new org.apache.hadoop.fs.Path(
          dir, s"part-${java.util.UUID.randomUUID()}.arrow")
        val fs = path.getFileSystem(hconf.value)
        val alloc = new RootAllocator()
        // arrow Field/Schema are not java-serializable: rebuild them in the
        // task from the shipped StructType
        val root = VectorSchemaRoot.create(
          new pojo.Schema(schema.fields.map(toArrowField).toSeq.asJava), alloc)
        val out = fs.create(path)
        val ch = java.nio.channels.Channels.newChannel(out)
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
        try {
          w.start()
          while (rows.hasNext) {
            root.allocateNew()
            var n = 0
            while (n < batchRows && rows.hasNext) {
              val r = rows.next()
              var i = 0
              while (i < schema.size) {
                val v = root.getVector(i)
                if (r.isNullAt(i)) setNull(v, n)
                else setValue(v, n, r.get(i))
                i += 1
              }
              n += 1
            }
            root.setRowCount(n)
            w.writeBatch()
          }
          w.end()
        } finally { w.close(); root.close(); alloc.close() }
      }
    }
  }

  private def setNull(v: org.apache.arrow.vector.ValueVector, i: Int): Unit = v match {
    case x: org.apache.arrow.vector.BigIntVector => x.setNull(i)
    case x: org.apache.arrow.vector.IntVector => x.setNull(i)
    case x: org.apache.arrow.vector.SmallIntVector => x.setNull(i)
    case x: org.apache.arrow.vector.TinyIntVector => x.setNull(i)
    case x: org.apache.arrow.vector.Float8Vector => x.setNull(i)
    case x: org.apache.arrow.vector.Float4Vector => x.setNull(i)
    case x: org.apache.arrow.vector.VarCharVector => x.setNull(i)
    case x: org.apache.arrow.vector.BitVector => x.setNull(i)
    case x: org.apache.arrow.vector.VarBinaryVector => x.setNull(i)
    case other => throw new UnsupportedOperationException(other.getClass.getName)
  }

  private def setValue(v: org.apache.arrow.vector.ValueVector, i: Int, value: Any): Unit =
    (v, value) match {
      case (x: org.apache.arrow.vector.BigIntVector, l: java.lang.Long) => x.setSafe(i, l)
      case (x: org.apache.arrow.vector.IntVector, n: java.lang.Integer) => x.setSafe(i, n)
      case (x: org.apache.arrow.vector.SmallIntVector, n: java.lang.Short) => x.setSafe(i, n)
      case (x: org.apache.arrow.vector.TinyIntVector, n: java.lang.Byte) => x.setSafe(i, n)
      case (x: org.apache.arrow.vector.Float8Vector, d: java.lang.Double) => x.setSafe(i, d)
      case (x: org.apache.arrow.vector.Float4Vector, f: java.lang.Float) => x.setSafe(i, f)
      case (x: org.apache.arrow.vector.VarCharVector, s: String) =>
        x.setSafe(i, s.getBytes("UTF-8"))
      case (x: org.apache.arrow.vector.BitVector, b: java.lang.Boolean) =>
        x.setSafe(i, if (b) 1 else 0)
      case (x: org.apache.arrow.vector.VarBinaryVector, b: Array[Byte]) => x.setSafe(i, b)
      case (other, vv) => throw new UnsupportedOperationException(
        s"${other.getClass.getName} <- ${vv.getClass.getName}")
    }
}
