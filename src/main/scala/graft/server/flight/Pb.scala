package graft.server.flight

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal protobuf wire codec for the handful of Arrow Flight RPC
  * messages this endpoint speaks (public `Flight.proto`,
  * github.com/apache/arrow format/Flight.proto). The sandbox has no
  * protoc/grpc-java artifacts, so the messages are framed by hand —
  * they are all flat (varint / length-delimited fields), which is the
  * entire wire format needed.
  *
  * Only the two wire types Flight uses are implemented: VARINT (0) and
  * LEN (2). Unknown fields are skipped on read (forward compatibility,
  * exactly what protobuf requires of readers).
  */
object Pb {

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def varintRaw(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        out.write(((v & 0x7f) | 0x80).toInt); v = v >>> 7
      }
      out.write(v.toInt)
      this
    }
    private def tag(field: Int, wire: Int): Unit = varintRaw((field.toLong << 3) | wire)

    /** varint field (int32/int64/uint64/bool/enum). Zero is protobuf
      * default → omitted. */
    def int(field: Int, v: Long): this.type = {
      if (v != 0L) { tag(field, 0); varintRaw(v) }
      this
    }
    def bytes(field: Int, b: Array[Byte]): this.type = {
      if (b.nonEmpty) { tag(field, 2); varintRaw(b.length.toLong); out.write(b) }
      this
    }
    /** LEN field emitted even when empty — REQUIRED for repeated-field
      * elements, where proto3 default-skipping does not apply (an empty
      * path segment must survive the round trip). */
    def bytesAlways(field: Int, b: Array[Byte]): this.type = {
      tag(field, 2); varintRaw(b.length.toLong); out.write(b); this
    }
    def string(field: Int, s: String): this.type =
      bytes(field, s.getBytes(StandardCharsets.UTF_8))
    def stringAlways(field: Int, s: String): this.type =
      bytesAlways(field, s.getBytes(StandardCharsets.UTF_8))
    def message(field: Int, m: Array[Byte]): this.type = bytes(field, m)

    def result: Array[Byte] = out.toByteArray
  }

  /** Pull-reader over one message's fields. */
  final class Reader(buf: Array[Byte], from: Int, until: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = from

    def hasNext: Boolean = pos < until

    private def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        require(pos < until, "pb: truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "pb: varint too long")
      }
      v
    }

    /** Advance to the next field: (fieldNumber, wireType). */
    def nextTag(): (Int, Int) = {
      val t = varint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def readVarint(): Long = varint()
    def readBytes(): Array[Byte] = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= until, "pb: truncated bytes field")
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b
    }
    def readString(): String = new String(readBytes(), StandardCharsets.UTF_8)
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 2 => readBytes(); ()
      case 5 => pos += 4
      case 1 => pos += 8
      case w => throw new IllegalArgumentException(s"pb: unsupported wire type $w")
    }
  }

  // ---- Flight message encoders/decoders --------------------------------

  /** FlightDescriptor: {1: type enum (1=PATH, 2=CMD), 2: cmd bytes,
    * 3: repeated path}. */
  final case class FlightDescriptor(descType: Int, cmd: Array[Byte], path: Seq[String])
  def readDescriptor(b: Array[Byte]): FlightDescriptor = {
    val r = new Reader(b)
    var t = 0; var cmd = Array.emptyByteArray; val path = Seq.newBuilder[String]
    while (r.hasNext) r.nextTag() match {
      case (1, 0) => t = r.readVarint().toInt
      case (2, 2) => cmd = r.readBytes()
      case (3, 2) => path += r.readString()
      case (_, w) => r.skip(w)
    }
    FlightDescriptor(t, cmd, path.result())
  }
  def writeDescriptor(d: FlightDescriptor): Array[Byte] =
    d.path.foldLeft(new Writer().int(1, d.descType.toLong).bytes(2, d.cmd)) {
      (w, p) => w.stringAlways(3, p) // repeated: empty segments must survive
    }.result

  /** Ticket: {1: bytes}. */
  def writeTicket(t: Array[Byte]): Array[Byte] = new Writer().bytes(1, t).result
  def readTicket(b: Array[Byte]): Array[Byte] = {
    val r = new Reader(b); var t = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (1, 2) => t = r.readBytes()
      case (_, w) => r.skip(w)
    }
    t
  }

  /** Ticket bytes of every endpoint in a serialized FlightInfo —
    * FlightInfo {3: repeated FlightEndpoint{1: Ticket{1: bytes}}}. The
    * read side of [[writeFlightInfo]], used by CancelQuery (the client
    * proves which query by returning the FlightInfo it was issued). */
  def readFlightInfoTickets(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val r = new Reader(b)
    while (r.hasNext) r.nextTag() match {
      case (3, 2) =>
        val er = new Reader(r.readBytes())
        while (er.hasNext) er.nextTag() match {
          case (1, 2) => out += readTicket(er.readBytes())
          case (_, w) => er.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  /** FlightEndpoint: {1: Ticket, 2: repeated Location{1: uri}}. */
  def writeEndpoint(ticket: Array[Byte], locations: Seq[String]): Array[Byte] =
    locations.foldLeft(new Writer().message(1, writeTicket(ticket))) { (w, uri) =>
      w.message(2, new Writer().string(1, uri).result)
    }.result

  /** FlightInfo: {1: schema (encapsulated IPC Schema message bytes),
    * 2: FlightDescriptor, 3: repeated FlightEndpoint, 4: total_records,
    * 5: total_bytes}. -1 totals = unknown, encoded as 64-bit varints. */
  def writeFlightInfo(schemaIpc: Array[Byte], descriptor: Array[Byte],
                      endpoints: Seq[Array[Byte]],
                      totalRecords: Long, totalBytes: Long): Array[Byte] = {
    val w = new Writer().bytes(1, schemaIpc).message(2, descriptor)
    endpoints.foreach(e => w.message(3, e))
    w.int(4, totalRecords).int(5, totalBytes).result
  }

  /** SchemaResult: {1: schema}. */
  def writeSchemaResult(schemaIpc: Array[Byte]): Array[Byte] =
    new Writer().bytes(1, schemaIpc).result

  /** FlightData: {2: data_header (flatbuffer Message, unframed),
    * 3: app_metadata, 1000: data_body}. The descriptor (field 1) is only
    * sent on the first frame of a DoPut, which this read-only endpoint
    * does not accept. */
  def writeFlightData(dataHeader: Array[Byte], dataBody: Array[Byte]): Array[Byte] =
    new Writer().bytes(2, dataHeader).bytes(1000, dataBody).result

  /** HandshakeRequest/Response: {1: protocol_version, 2: payload}. */
  def writeHandshake(payload: Array[Byte]): Array[Byte] =
    new Writer().bytes(2, payload).result
  def readHandshakePayload(b: Array[Byte]): Array[Byte] = {
    val r = new Reader(b); var p = Array.emptyByteArray
    while (r.hasNext) r.nextTag() match {
      case (2, 2) => p = r.readBytes()
      case (_, w) => r.skip(w)
    }
    p
  }

  /** BasicAuth (Flight.proto): {2: username, 3: password} — the payload
    * of a client handshake in basic-auth mode. */
  def readBasicAuth(b: Array[Byte]): Option[(String, String)] = {
    val r = new Reader(b); var u: String = null; var p: String = null
    try {
      while (r.hasNext) r.nextTag() match {
        case (2, 2) => u = r.readString()
        case (3, 2) => p = r.readString()
        case (_, w) => r.skip(w)
      }
    } catch { case _: Exception => return None }
    Option(u).zip(Option(p))
  }

  /** ActionType: {1: type, 2: description}. */
  def writeActionType(tpe: String, description: String): Array[Byte] =
    new Writer().string(1, tpe).string(2, description).result
}
