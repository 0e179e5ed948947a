package graft.server.flight

import java.nio.charset.StandardCharsets

/** Hand-framed codecs for the Arrow **Flight SQL** messages this endpoint
  * speaks (public `FlightSql.proto`, github.com/apache/arrow
  * format/FlightSql.proto), layered on [[Pb]]'s wire primitives.
  *
  * Flight SQL rides plain Flight: every command is a `google.protobuf.Any`
  * serialized into `FlightDescriptor.cmd` (or a DoGet ticket), so the only
  * extra framing beyond the flat command messages is the Any envelope
  * {1: type_url, 2: value}. The reference's endpoint implements the same
  * dual dispatch — Any-wrapped Flight SQL commands with a raw-SQL
  * descriptor fallback (`services/arrow-flight/src/main/java/com/dremio/
  * service/flight/DremioFlightProducer.java:217-236`).
  */
object PbSql {

  /** Canonical type_url prefix clients emit; readers accept any host
    * prefix and match on the fully-qualified message name. */
  private val Pkg = "arrow.flight.protocol.sql."
  def typeUrl(msg: String): String = "type.googleapis.com/" + Pkg + msg

  /** google.protobuf.Any {1: type_url, 2: value} → (message name within
    * the Flight SQL package, value bytes); None when the bytes are not an
    * Any carrying a Flight SQL message (→ legacy raw-SQL fallback). */
  def readAny(b: Array[Byte]): Option[(String, Array[Byte])] =
    try {
      val r = new Pb.Reader(b)
      var url = ""; var value = Array.emptyByteArray
      while (r.hasNext) r.nextTag() match {
        case (1, 2) => url = r.readString()
        case (2, 2) => value = r.readBytes()
        case (_, w) => r.skip(w)
      }
      val fq = url.substring(url.lastIndexOf('/') + 1)
      if (fq.startsWith(Pkg)) Some((fq.substring(Pkg.length), value)) else None
    } catch { case _: Exception => None }

  def writeAny(msg: String, value: Array[Byte]): Array[Byte] =
    new Pb.Writer().string(1, typeUrl(msg)).bytes(2, value).result

  // ---- statement commands ------------------------------------------------

  /** CommandStatementQuery {1: query, 2: transaction_id}. */
  def readStatementQuery(b: Array[Byte]): String = {
    val r = new Pb.Reader(b); var q = ""
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => q = r.readString()
      case (_, w) => r.skip(w)
    }
    q
  }
  def writeStatementQuery(query: String): Array[Byte] =
    new Pb.Writer().string(1, query).result

  /** TicketStatementQuery {1: statement_handle} — what GetFlightInfo
    * returns inside the endpoint ticket for an ad-hoc statement. */
  def writeTicketStatementQuery(handle: Array[Byte]): Array[Byte] =
    new Pb.Writer().bytes(1, handle).result
  def readHandle(b: Array[Byte]): Array[Byte] = {
    val r = new Pb.Reader(b); var h = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => h = r.readBytes()
      case (_, w) => r.skip(w)
    }
    h
  }

  /** CommandPreparedStatementQuery {1: prepared_statement_handle} — field
    * layout is identical to TicketStatementQuery / the two prepared-
    * statement action requests' handle field, so [[readHandle]] serves
    * them all. */
  def writePreparedStatementQuery(handle: Array[Byte]): Array[Byte] =
    new Pb.Writer().bytes(1, handle).result

  /** ActionCreatePreparedStatementRequest {1: query, 2: transaction_id}. */
  def readCreatePreparedRequest(b: Array[Byte]): String = readStatementQuery(b)
  def writeCreatePreparedRequest(query: String): Array[Byte] =
    writeStatementQuery(query)

  /** ActionCreatePreparedStatementResult {1: prepared_statement_handle,
    * 2: dataset_schema (IPC-encapsulated), 3: parameter_schema}. */
  def writeCreatePreparedResult(handle: Array[Byte], datasetSchema: Array[Byte],
                                parameterSchema: Array[Byte]): Array[Byte] =
    new Pb.Writer().bytes(1, handle).bytes(2, datasetSchema)
      .bytes(3, parameterSchema).result
  def readCreatePreparedResult(b: Array[Byte])
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val r = new Pb.Reader(b)
    var h = Array.emptyByteArray; var ds = Array.emptyByteArray
    var ps = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => h = r.readBytes()
      case (2, 2) => ds = r.readBytes()
      case (3, 2) => ps = r.readBytes()
      case (_, w) => r.skip(w)
    }
    (h, ds, ps)
  }

  // ---- catalog commands --------------------------------------------------

  /** CommandGetDbSchemas {1: catalog, 2: db_schema_filter_pattern}. */
  final case class GetDbSchemas(catalog: Option[String], pattern: Option[String])
  def readGetDbSchemas(b: Array[Byte]): GetDbSchemas = {
    val r = new Pb.Reader(b)
    var cat: Option[String] = None; var pat: Option[String] = None
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => cat = Some(r.readString())
      case (2, 2) => pat = Some(r.readString())
      case (_, w) => r.skip(w)
    }
    GetDbSchemas(cat, pat)
  }

  /** CommandGetTables {1: catalog, 2: db_schema_filter_pattern,
    * 3: table_name_filter_pattern, 4: repeated table_types,
    * 5: include_schema}. */
  final case class GetTables(catalog: Option[String], dbPattern: Option[String],
                             tablePattern: Option[String], tableTypes: Seq[String],
                             includeSchema: Boolean)
  def readGetTables(b: Array[Byte]): GetTables = {
    val r = new Pb.Reader(b)
    var cat: Option[String] = None; var dp: Option[String] = None
    var tp: Option[String] = None; val tts = Seq.newBuilder[String]
    var inc = false
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => cat = Some(r.readString())
      case (2, 2) => dp = Some(r.readString())
      case (3, 2) => tp = Some(r.readString())
      case (4, 2) => tts += r.readString()
      case (5, 0) => inc = r.readVarint() != 0L
      case (_, w) => r.skip(w)
    }
    GetTables(cat, dp, tp, tts.result(), inc)
  }
  def writeGetTables(t: GetTables): Array[Byte] = {
    val w = new Pb.Writer()
    // FlightSql.proto declares the filters `optional` (explicit presence):
    // Some("") must hit the wire, so no default-elision here
    t.catalog.foreach(w.stringAlways(1, _))
    t.dbPattern.foreach(w.stringAlways(2, _))
    t.tablePattern.foreach(w.stringAlways(3, _))
    t.tableTypes.foreach(w.stringAlways(4, _))
    w.int(5, if (t.includeSchema) 1L else 0L).result
  }

  /** CommandGetXdbcTypeInfo {1: optional int32 data_type} — the
    * ODBC/JDBC type-mapping probe ADBC drivers issue on connect. */
  /** CommandGetPrimaryKeys: (catalog?, db_schema?, table). The spec
    * marks `table` required — absent/empty means an empty result, never
    * "all tables" (ADBC probes with real names only). */
  def readGetPrimaryKeys(b: Array[Byte]): Option[String] = {
    val r = new Pb.Reader(b)
    var table: Option[String] = None
    while (r.hasNext) r.nextTag() match {
      case (3, 2) => table = Some(r.readString()).filter(_.nonEmpty)
      case (_, w) => r.skip(w)
    }
    table
  }

  def writeGetPrimaryKeys(table: String): Array[Byte] =
    new Pb.Writer().stringAlways(3, table).result

  def readGetXdbcTypeInfo(b: Array[Byte]): Option[Int] = {
    val r = new Pb.Reader(b); var dt: Option[Int] = None
    while (r.hasNext) r.nextTag() match {
      case (1, 0) => dt = Some(r.readVarint().toInt)
      case (_, w) => r.skip(w)
    }
    dt
  }
  def writeGetXdbcTypeInfo(dataType: Option[Int]): Array[Byte] = {
    val w = new Pb.Writer()
    dataType.foreach(dt => w.int(1, dt.toLong))
    w.result
  }

  /** DoPutPreparedStatementResult {1: optional bytes
    * prepared_statement_handle} — the ack for a parameter-binding DoPut
    * (acceptPutPreparedStatementQuery); Any-wrapped in the PutResult's
    * app_metadata per the Flight SQL contract. */
  def writeDoPutPreparedResult(handle: Array[Byte]): Array[Byte] =
    new Pb.Writer().bytes(1, handle).result

  /** CommandGetSqlInfo {1: repeated uint32 info} — packed (proto3
    * default) AND unpacked encodings both accepted, as protobuf requires
    * of readers. Empty list = "everything you know". */
  def readGetSqlInfo(b: Array[Byte]): Seq[Int] = {
    val r = new Pb.Reader(b); val out = Seq.newBuilder[Int]
    while (r.hasNext) r.nextTag() match {
      case (1, 2) =>
        val packed = r.readBytes()
        val pr = new Pb.Reader(packed)
        while (pr.hasNext) out += pr.readVarint().toInt
      case (1, 0) => out += r.readVarint().toInt
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  // ---- DoAction / DoPut envelope messages (Flight.proto) -----------------

  /** Action {1: type, 2: body}. */
  /** ActionCancelQueryRequest {1: bytes info} → the serialized FlightInfo
    * whose endpoints name the query to cancel. */
  def readCancelQueryRequest(b: Array[Byte]): Array[Byte] = {
    val r = new Pb.Reader(b); var info = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => info = r.readBytes()
      case (_, w) => r.skip(w)
    }
    info
  }
  def writeCancelQueryRequest(info: Array[Byte]): Array[Byte] =
    new Pb.Writer().bytes(1, info).result

  /** ActionCancelQueryResult {1: CancelResult enum}: 1 = CANCELLED,
    * 2 = CANCELLING, 3 = NOT_CANCELLABLE. */
  def writeCancelQueryResult(status: Int): Array[Byte] =
    new Pb.Writer().int(1, status.toLong).result
  def readCancelQueryResult(b: Array[Byte]): Int = {
    val r = new Pb.Reader(b); var s = 0
    while (r.hasNext) r.nextTag() match {
      case (1, 0) => s = r.readVarint().toInt
      case (_, w) => r.skip(w)
    }
    s
  }

  final case class Action(tpe: String, body: Array[Byte])
  def readAction(b: Array[Byte]): Action = {
    val r = new Pb.Reader(b); var t = ""; var body = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => t = r.readString()
      case (2, 2) => body = r.readBytes()
      case (_, w) => r.skip(w)
    }
    Action(t, body)
  }
  def writeAction(a: Action): Array[Byte] =
    new Pb.Writer().string(1, a.tpe).bytes(2, a.body).result

  /** arrow.flight.protocol.Result {1: body}. */
  def writeResult(body: Array[Byte]): Array[Byte] =
    new Pb.Writer().bytes(1, body).result
  def readResultBody(b: Array[Byte]): Array[Byte] = {
    val r = new Pb.Reader(b); var body = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => body = r.readBytes()
      case (_, w) => r.skip(w)
    }
    body
  }

  /** FlightData {1: flight_descriptor, 2: data_header, 3: app_metadata,
    * 1000: data_body} — the read direction, for DoPut. */
  final case class FlightData(descriptor: Option[Pb.FlightDescriptor],
                              dataHeader: Array[Byte], appMetadata: Array[Byte],
                              dataBody: Array[Byte])
  def readFlightData(b: Array[Byte]): FlightData = {
    val r = new Pb.Reader(b)
    var desc: Option[Pb.FlightDescriptor] = None
    var header = Array.emptyByteArray; var meta = Array.emptyByteArray
    var body = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => desc = Some(Pb.readDescriptor(r.readBytes()))
      case (2, 2) => header = r.readBytes()
      case (3, 2) => meta = r.readBytes()
      case (1000, 2) => body = r.readBytes()
      case (_, w) => r.skip(w)
    }
    FlightData(desc, header, meta, body)
  }

  /** PutResult {1: app_metadata}. */
  def writePutResult(appMetadata: Array[Byte]): Array[Byte] =
    new Pb.Writer().bytes(1, appMetadata).result
  def readPutResult(b: Array[Byte]): Array[Byte] = {
    val r = new Pb.Reader(b); var m = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => m = r.readBytes()
      case (_, w) => r.skip(w)
    }
    m
  }

  /** DoPutUpdateResult {1: record_count} — the app_metadata of the
    * PutResult acknowledging a CommandStatementUpdate (raw bytes, not
    * Any-wrapped, matching the flight-sql reference producers). -1 =
    * unknown count. */
  def writeDoPutUpdateResult(recordCount: Long): Array[Byte] =
    new Pb.Writer().int(1, recordCount).result
  def readDoPutUpdateResult(b: Array[Byte]): Long = {
    val r = new Pb.Reader(b); var n = 0L
    while (r.hasNext) r.nextTag() match {
      case (1, 0) => n = r.readVarint()
      case (_, w) => r.skip(w)
    }
    n
  }

  /** Convenience: UTF-8 string bytes. */
  def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
}
