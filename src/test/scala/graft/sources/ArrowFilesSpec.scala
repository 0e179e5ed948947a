package graft.sources

import java.nio.file.Files

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The Arrow IPC easy-format reader (reference `exec/store/easy/arrow`):
  * files written with the official Arrow java API round-trip through
  * `ArrowFiles.read` — schema, values, nulls, multiple batches, multiple
  * files. */
class ArrowFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import scala.jdk.CollectionConverters._

  private def arrowSchema: Schema = new Schema(Seq(
    new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
    new Field("name", FieldType.nullable(ArrowType.Utf8.INSTANCE), null),
    new Field("score", FieldType.nullable(
      new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)).asJava)

  /** Write `batches` (seq of row-seqs) as one Arrow IPC file. */
  private def writeArrowFile(path: String,
                             batches: Seq[Seq[(Long, Option[String], Double)]]): Unit = {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val ch = java.nio.channels.Channels.newChannel(new java.io.FileOutputStream(path))
    val w = new ArrowFileWriter(root, null, ch)
    try {
      w.start()
      batches.foreach { rows =>
        root.allocateNew()
        val ids = root.getVector("id").asInstanceOf[BigIntVector]
        val names = root.getVector("name").asInstanceOf[VarCharVector]
        val scores = root.getVector("score").asInstanceOf[Float8Vector]
        rows.zipWithIndex.foreach { case ((id, name, score), i) =>
          ids.setSafe(i, id)
          name match {
            case Some(s) => names.setSafe(i, s.getBytes("UTF-8"))
            case None => names.setNull(i)
          }
          scores.setSafe(i, score)
        }
        root.setRowCount(rows.size)
        w.writeBatch()
      }
      w.end()
    } finally { w.close(); root.close(); alloc.close() }
  }

  test("arrow IPC files round-trip: schema, values, nulls, batches, files") {
    val dir = Files.createTempDirectory("graft_arrow").toString
    writeArrowFile(s"$dir/a.arrow", Seq(
      Seq((1L, Some("alpha"), 1.5), (2L, None, 2.5)),
      Seq((3L, Some("gamma"), 3.5))))
    writeArrowFile(s"$dir/b.arrow", Seq(
      Seq((4L, Some("delta"), 4.5))))

    assert(ArrowFiles.schemaOf(spark, dir) == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))))

    val got = ArrowFiles.read(spark, dir).orderBy("id").collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
    assert(got == Seq(
      (1L, Some("alpha"), 1.5), (2L, None, 2.5),
      (3L, Some("gamma"), 3.5), (4L, Some("delta"), 4.5)))

    // the produced frame is a normal DataFrame: filters/aggs plan over it
    val agg = ArrowFiles.read(spark, dir).where(col("score") > 2.0)
      .agg(sum(col("id"))).collect().head.getLong(0)
    assert(agg == 9L)
  }

  test("writer round-trip: DataFrame -> arrow files -> DataFrame, all easy types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_arrow_w").toString + "/out"
    val df = spark.range(0, 1000).select(
      col("id"),
      (col("id") % 100).cast("int").as("i"),
      (col("id") % 10).cast("smallint").as("s"),
      (col("id") % 5).cast("tinyint").as("b"),
      (col("id") * 1.5).as("d"),
      (col("id") * 0.5).cast("float").as("f"),
      concat(lit("row-"), col("id")).as("t"),
      (col("id") % 2 === 0).as("flag"),
      when(col("id") % 7 === 0, lit(null)).otherwise(concat(lit("n"), col("id"))).as("maybe"))
    ArrowFiles.write(df, dir, batchRows = 128)
    val back = ArrowFiles.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b, s"writer round-trip diverged: ${a.take(2)} vs ${b.take(2)}")
    // multiple part files (one per non-empty partition), batched writes
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(files.nonEmpty)
  }

  test("unsupported arrow types fail loudly at schema time, not as task errors") {
    val dir = Files.createTempDirectory("graft_arrow_bad").toString
    val alloc = new RootAllocator()
    val schema = new Schema(Seq(
      new Field("d", FieldType.nullable(new ArrowType.Decimal(10, 2, 128)), null)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val ch = java.nio.channels.Channels.newChannel(
      new java.io.FileOutputStream(s"$dir/d.arrow"))
    val w = new ArrowFileWriter(root, null, ch)
    try { w.start(); root.setRowCount(0); w.writeBatch(); w.end() }
    finally { w.close(); root.close(); alloc.close() }
    val ex = intercept[UnsupportedOperationException] {
      ArrowFiles.schemaOf(spark, dir)
    }
    assert(ex.getMessage.contains("d"), ex.getMessage)
  }
}
