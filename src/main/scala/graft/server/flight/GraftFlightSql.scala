package graft.server.flight

import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Flight SQL semantics behind [[GraftFlightServer]]'s wire dispatch: the
  * prepared-statement registry and the catalog-metadata command results
  * (`CommandGetCatalogs` / `CommandGetDbSchemas` / `CommandGetTables` /
  * `CommandGetTableTypes` / `CommandGetSqlInfo`) a stock ADBC/Flight SQL
  * client probes on connect.
  *
  * Reference shape: `services/arrow-flight/src/main/java/com/dremio/
  * service/flight/DremioFlightProducer.java:89` (command dispatch),
  * `:236` (prepared statements); catalog commands are served there by a
  * producer-side metadata provider — here they are plain DataFrames over
  * the session catalog, so Spark supplies the Arrow result path and the
  * same grant-visibility filtering as ListFlights applies.
  *
  * Result schemas follow the published FlightSql.proto column contracts
  * (`catalog_name`, `db_schema_name`, `table_name`, `table_type`,
  * `table_schema`); `GetSqlInfo`'s dense-union value column cannot be
  * expressed as a DataFrame, so that one batch is hand-built with
  * arrow-vector and serialized through the same IPC framing as every
  * other stream.
  */
private[flight] object GraftFlightSql {

  // ---- prepared statements ----------------------------------------------

  /** A prepared statement is re-executable until closed (Flight SQL
    * contract) — unlike ad-hoc statement tickets, which die at first
    * DoGet. The SQL text is re-planned per execution so each run sees
    * current data; the handle is owned by the principal that prepared
    * it. */
  final case class Prepared(sql: String, owner: Option[String], bornMs: Long)
  private val prepared = TrieMap.empty[String, Prepared]
  private val MaxPrepared = 1000

  def createPrepared(sql: String, owner: Option[String]): String = {
    reap()
    val handle = java.util.UUID.randomUUID().toString
    prepared.put(handle, Prepared(sql, owner, System.currentTimeMillis()))
    handle
  }
  def getPrepared(handle: String): Option[Prepared] = prepared.get(handle)
  def closePrepared(handle: String): Unit = { prepared.remove(handle); () }
  private def reap(): Unit = {
    val cutoff = System.currentTimeMillis() - 60 * 60 * 1000L
    prepared.filterInPlace((_, p) => p.bornMs >= cutoff)
    if (prepared.size > MaxPrepared)
      prepared.toSeq.sortBy(_._2.bornMs)
        .take(prepared.size - MaxPrepared)
        .foreach { case (k, _) => prepared.remove(k) }
  }

  // ---- catalog commands --------------------------------------------------

  /** The single catalog name this engine exposes over Flight SQL. */
  val CatalogName = "spark_catalog"

  /** SQL LIKE-style search pattern (%, _) → anchored regex. */
  private def patternRegex(p: String): String =
    "^" + p.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.^$*+?()|{}[]".indexOf(c) >= 0 => "\\" + c
      case c => c.toString
    } + "$"
  private def matches(pat: Option[String], s: String): Boolean =
    pat.forall(p => s.matches(patternRegex(p)))

  def catalogsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(CatalogName).toDF("catalog_name")
  }

  def dbSchemasDf(spark: SparkSession, cmd: PbSql.GetDbSchemas): DataFrame = {
    import spark.implicits._
    val dbs =
      if (!cmd.catalog.forall(_ == CatalogName)) Seq.empty[String]
      else spark.catalog.listDatabases().collect().map(_.name).toSeq
        .filter(n => matches(cmd.pattern, n)).sorted
    dbs.map(n => (CatalogName, n)).toDF("catalog_name", "db_schema_name")
  }

  def tableTypesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("TABLE", "VIEW").toDF("table_type")
  }

  /** One row per visible dataset; `table_schema` (IPC-encapsulated Arrow
    * schema bytes) only when the client asked for it. Grant visibility
    * mirrors ListFlights: while enforcement is on, only datasets the
    * caller can SELECT appear. */
  def tablesDf(root: SparkSession, session: SparkSession,
               cmd: PbSql.GetTables): DataFrame = {
    import root.implicits._
    val p = graft.auth.Privileges
    val principal = p.principalOf(session)
    def visible(name: String): Boolean =
      !p.enforcing || principal.exists(u =>
        p.allowed(u, "select", p.normObj(name)))
    val rows: Seq[(String, String, String, String, Array[Byte])] =
      if (!cmd.catalog.forall(c => c == CatalogName || c.isEmpty)) Seq.empty
      else root.catalog.listTables().collect().toSeq
        .filter { t =>
          val db = Option(t.database).getOrElse("")
          matches(cmd.dbPattern, db) && matches(cmd.tablePattern, t.name) &&
            visible(t.name)
        }
        .flatMap { t =>
          val tableType =
            if (t.tableType != null && t.tableType.toUpperCase.contains("VIEW")) "VIEW"
            else "TABLE"
          if (cmd.tableTypes.nonEmpty && !cmd.tableTypes.contains(tableType)) None
          else {
            val schemaBytes =
              if (!cmd.includeSchema) Array.emptyByteArray
              else
                try GraftFlightServer.schemaIpcBytesOf(root.table(t.name))
                catch { case _: Exception => Array.emptyByteArray }
            Some((CatalogName, Option(t.database).getOrElse(""),
              t.name, tableType, schemaBytes))
          }
        }
        .sortBy(r => (r._2, r._3))
    val df = rows.toDF("catalog_name", "db_schema_name", "table_name",
      "table_type", "table_schema")
    if (cmd.includeSchema) df else df.drop("table_schema")
  }

  /** CommandGetPrimaryKeys / Get{Imported,Exported}Keys /
    * GetCrossReference: this engine declares no key constraints (Spark
    * tables carry none), so the results are EMPTY — but with the spec's
    * column contract, because ADBC probes these on connect and chokes on
    * a refused RPC where an empty relation is the correct answer. */
  def primaryKeysDf(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("catalog_name", StringType), StructField("db_schema_name", StringType),
        StructField("table_name", StringType), StructField("column_name", StringType),
        StructField("key_name", StringType), StructField("key_sequence", IntegerType))))
  }
  def foreignKeysDf(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("pk_catalog_name", StringType), StructField("pk_db_schema_name", StringType),
        StructField("pk_table_name", StringType), StructField("pk_column_name", StringType),
        StructField("fk_catalog_name", StringType), StructField("fk_db_schema_name", StringType),
        StructField("fk_table_name", StringType), StructField("fk_column_name", StringType),
        StructField("key_sequence", IntegerType), StructField("fk_key_name", StringType),
        StructField("pk_key_name", StringType),
        // spec says uint8; Spark's closest Arrow-expressible type is int8
        StructField("update_rule", ByteType), StructField("delete_rule", ByteType))))
  }

  // ---- GetSqlInfo (dense-union result, hand-built) -----------------------

  /** FlightSql.proto SqlInfo keys served. */
  private val ServerName = 0    // string
  private val ServerVersion = 1 // string
  private val ArrowVersion = 2  // string
  private val ReadOnly = 3      // bool

  /** The GetSqlInfo result as (IPC schema frame payloads): one schema
    * header + one record batch, framed exactly like every other stream.
    * Schema per the spec: info_name uint32 not null,
    * value dense_union<string_value, bool_value>.
    * Returns (schema, encapsulated IPC batch messages). */
  def sqlInfoIpc(requested: Seq[Int])
      : (org.apache.arrow.vector.types.pojo.Schema, Seq[Array[Byte]]) = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{UInt4Vector, VarCharVector, BitVector, VectorSchemaRoot, VectorUnloader}
    import org.apache.arrow.vector.complex.DenseUnionVector
    import org.apache.arrow.vector.holders.{NullableVarCharHolder, NullableBitHolder}
    import org.apache.arrow.vector.ipc.message.MessageSerializer
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}

    val infos: Seq[(Int, Either[String, Boolean])] = Seq(
      ServerName -> Left("graft"),
      ServerVersion -> Left("0.1.0"),
      ArrowVersion -> Left("18.3.0"),
      ReadOnly -> Right(false),
    ).filter { case (k, _) => requested.isEmpty || requested.contains(k) }

    val allocator = new RootAllocator()
    try {
      val nameVec = new UInt4Vector(
        new Field("info_name",
          new FieldType(false, new ArrowType.Int(32, false), null), null),
        allocator)
      val duv = DenseUnionVector.empty("value", allocator)
      val strId = duv.registerNewTypeId(Field.nullable("string_value", ArrowType.Utf8.INSTANCE))
      val boolId = duv.registerNewTypeId(Field.nullable("bool_value", ArrowType.Bool.INSTANCE))
      duv.addVector(strId, new VarCharVector("string_value", allocator))
      duv.addVector(boolId, new BitVector("bool_value", allocator))
      duv.allocateNew(); nameVec.allocateNew()
      infos.zipWithIndex.foreach { case ((key, value), i) =>
        nameVec.setSafe(i, key)
        value match {
          case Left(s) =>
            duv.setTypeId(i, strId)
            val h = new NullableVarCharHolder
            val bytes = s.getBytes(StandardCharsets.UTF_8)
            val buf = allocator.buffer(bytes.length.toLong)
            try {
              buf.writeBytes(bytes)
              h.isSet = 1; h.buffer = buf; h.start = 0; h.end = bytes.length
              duv.setSafe(i, h)
            } finally buf.close()
          case Right(b) =>
            duv.setTypeId(i, boolId)
            val h = new NullableBitHolder
            h.isSet = 1; h.value = if (b) 1 else 0
            duv.setSafe(i, h)
        }
      }
      nameVec.setValueCount(infos.size); duv.setValueCount(infos.size)
      val root = new VectorSchemaRoot(java.util.List.of(
        nameVec.asInstanceOf[org.apache.arrow.vector.FieldVector],
        duv.asInstanceOf[org.apache.arrow.vector.FieldVector]))
      try {
        val batch = new VectorUnloader(root).getRecordBatch
        try {
          val out = new java.io.ByteArrayOutputStream()
          MessageSerializer.serialize(
            new org.apache.arrow.vector.ipc.WriteChannel(
              java.nio.channels.Channels.newChannel(out)), batch)
          (root.getSchema, Seq(out.toByteArray))
        } finally batch.close()
      } finally root.close()
    } finally allocator.close()
  }
}
