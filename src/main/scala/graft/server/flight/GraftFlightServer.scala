package graft.server.flight

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.channels.Channels
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.sparkproject.connect.grpc
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}

/** Arrow Flight endpoint: the reference's fourth wire protocol
  * (`services/arrow-flight/src/main/java/com/dremio/service/flight/
  * DremioFlightProducer.java:89` getFlightInfo, :117 getStream). A
  * Flight client submits SQL as a CMD FlightDescriptor, gets a
  * FlightInfo whose endpoint ticket names the planned statement (eager
  * commands execute exactly once, at submission), and DoGet
  * streams the result as Arrow record batches — the columnar bulk-
  * extraction path ADBC/pyarrow clients default to.
  *
  * The sandbox ships no arrow-flight or grpc-java artifacts, so this
  * speaks the PUBLIC protocol from first principles:
  *  - transport: the gRPC runtime Spark Connect shades
  *    (`org.sparkproject.connect.grpc`), serving the literal
  *    `arrow.flight.protocol.FlightService` service/method names with a
  *    raw byte marshaller;
  *  - messages: hand-framed protobuf per the public Flight.proto
  *    ([[Pb]]);
  *  - data plane: real Arrow IPC — the schema/batch flatbuffer metadata
  *    and buffer bodies come from arrow-vector's MessageSerializer and
  *    Spark's own columnar result path (Bridge.arrowBatches), split into
  *    FlightData {data_header, data_body} frames exactly as
  *    arrow-java's flight-core frames them.
  *
  * Auth mirrors the reference Flight endpoint: `authorization: Basic`
  * headers are verified against [[graft.auth.Privileges]] and exchanged
  * for a bearer token (the `authenticate_basic_token` flow); while
  * enforcement is ON, statements require a valid principal and run with
  * it bound, so row policies/masking/grants all apply on this wire too.
  *
  * Scale: a thin protocol adapter like the other three front ends —
  * plans execute on the cluster; the result streams batch-by-batch off
  * `toLocalIterator` (one partition in driver memory at a time), never a
  * collected row array.
  */
object GraftFlightServer {

  private val ServiceName = "arrow.flight.protocol.FlightService"

  @volatile private var running: Option[grpc.Server] = None
  @volatile private var boundPort: Option[Int] = None

  // ---- gRPC plumbing ----------------------------------------------------

  private object BytesMarshaller extends grpc.MethodDescriptor.Marshaller[Array[Byte]] {
    override def stream(b: Array[Byte]): InputStream = new ByteArrayInputStream(b)
    override def parse(in: InputStream): Array[Byte] = in.readAllBytes()
  }

  private def method(name: String, mt: grpc.MethodDescriptor.MethodType)
      : grpc.MethodDescriptor[Array[Byte], Array[Byte]] =
    grpc.MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setFullMethodName(s"$ServiceName/$name")
      .setType(mt).build()

  private val AuthHeader =
    grpc.Metadata.Key.of("authorization", grpc.Metadata.ASCII_STRING_MARSHALLER)
  /** Request's authorization header, carried into handlers. */
  private val CtxAuth: grpc.Context.Key[String] = grpc.Context.key("graft-flight-auth")

  // ---- auth -------------------------------------------------------------

  private def unauthenticated(msg: String): grpc.StatusRuntimeException =
    grpc.Status.UNAUTHENTICATED.withDescription(msg).asRuntimeException()

  /** Validate Basic credentials and mint a bearer token (global token
    * table), or None when the header is not Basic / invalid. */
  private def mintBearer(root: SparkSession, header: String): Option[String] =
    if (header == null || !header.regionMatches(true, 0, "Basic ", 0, 6)) None
    else {
      val raw = new String(Base64.getDecoder.decode(header.substring(6).trim),
        StandardCharsets.UTF_8)
      val i = raw.indexOf(':')
      if (i < 0) None
      else
        try Some(graft.auth.Privileges.login(root.newSession(),
          raw.substring(0, i), raw.substring(i + 1)))
        catch { case _: SecurityException => None }
    }

  /** Bind the caller's principal (Basic or Bearer header) onto `session`.
    * Throws UNAUTHENTICATED for a present-but-invalid header, or for a
    * missing one while enforcement is on. */
  private def bindPrincipal(root: SparkSession, session: SparkSession): Unit = {
    val header = CtxAuth.get()
    val p = graft.auth.Privileges
    header match {
      case null | "" =>
        if (p.enforcing)
          throw unauthenticated("flight: statement requires credentials " +
            "(authorization: Basic or Bearer) while auth enforcement is on")
      case h if h.regionMatches(true, 0, "Basic ", 0, 6) =>
        mintBearer(root, h) match {
          case Some(tok) => session.conf.set(p.TokenConf, tok)
          case None => throw unauthenticated("flight: invalid basic credentials")
        }
        if (p.principalOf(session).isEmpty)
          throw unauthenticated("flight: invalid basic credentials")
      case h if h.regionMatches(true, 0, "Bearer ", 0, 7) =>
        session.conf.set(p.TokenConf, h.substring(7).trim)
        if (p.principalOf(session).isEmpty)
          throw unauthenticated("flight: unknown or expired bearer token")
      case _ => throw unauthenticated("flight: unsupported authorization scheme")
    }
  }

  // ---- Arrow IPC framing --------------------------------------------------

  /** Encapsulated IPC Schema message ([continuation][len][flatbuffer]) —
    * the `FlightInfo.schema` / `SchemaResult.schema` wire form. */
  private def schemaIpcBytes(schema: org.apache.arrow.vector.types.pojo.Schema)
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(
      new org.apache.arrow.vector.ipc.WriteChannel(Channels.newChannel(out)), schema)
    out.toByteArray
  }

  /** Unframed flatbuffer Message bytes for the schema — the
    * `FlightData.data_header` form of the stream's first frame. */
  private def schemaHeaderBytes(schema: org.apache.arrow.vector.types.pojo.Schema)
      : Array[Byte] = {
    val bb = org.apache.arrow.vector.ipc.message.MessageSerializer
      .serializeMetadata(schema,
        org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT)
    val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
  }

  /** Split one encapsulated IPC message (what Bridge.arrowBatches emits)
    * into (metadata flatbuffer, body) — the FlightData frame pair. */
  private[flight] def splitIpcMessage(msg: Array[Byte]): (Array[Byte], Array[Byte]) = {
    def le32(off: Int): Int =
      (msg(off) & 0xff) | ((msg(off + 1) & 0xff) << 8) |
        ((msg(off + 2) & 0xff) << 16) | ((msg(off + 3) & 0xff) << 24)
    require(msg.length >= 8, "ipc: truncated message")
    val (metaLen, metaStart) =
      if (le32(0) == -1) (le32(4), 8) // v5 framing: continuation marker
      else (le32(0), 4)               // legacy framing
    val meta = java.util.Arrays.copyOfRange(msg, metaStart, metaStart + metaLen)
    val body = java.util.Arrays.copyOfRange(msg, metaStart + metaLen, msg.length)
    (meta, body)
  }

  // ---- statement handling -------------------------------------------------

  private def statementOf(root: SparkSession, sql: String): DataFrame = {
    val session = root.newSession()
    bindPrincipal(root, session)
    graft.Graft.sql(session, sql)
  }

  /** GetFlightInfo plans (and, for eager commands, executes) the
    * statement ONCE; the ticket names the planned result so DoGet
    * streams it without re-executing — a `CREATE LAKE` submitted over
    * Flight must not run twice. Entries expire after 10 minutes and die
    * at first use; an unknown ticket falls back to SQL-in-ticket
    * (stateless DoGet, reference getStream shape) for pure reads. */
  private final case class Pending(df: DataFrame, owner: Option[String], bornMs: Long)
  private val pending = scala.collection.concurrent.TrieMap.empty[String, Pending]
  private val MaxPending = 1000
  private def reapPending(): Unit = {
    val cutoff = System.currentTimeMillis() - 10 * 60 * 1000L
    pending.filterInPlace((_, p) => p.bornMs >= cutoff)
    // size backstop: clients that plan but never DoGet must not pin
    // unbounded plans — oldest tickets expire first
    if (pending.size > MaxPending)
      pending.toSeq.sortBy(_._2.bornMs)
        .take(pending.size - MaxPending)
        .foreach { case (k, _) => pending.remove(k) }
  }

  private def fail(obs: StreamObserver[Array[Byte]], t: Throwable): Unit = t match {
    case s: grpc.StatusRuntimeException => obs.onError(s)
    case e =>
      obs.onError(grpc.Status.INVALID_ARGUMENT
        .withDescription(Option(e.getMessage).getOrElse(e.toString).take(600))
        .asRuntimeException())
  }

  // ---- service ------------------------------------------------------------

  private def service(root: SparkSession): grpc.ServerServiceDefinition = {
    val getFlightInfo = method("GetFlightInfo", grpc.MethodDescriptor.MethodType.UNARY)
    val getSchema = method("GetSchema", grpc.MethodDescriptor.MethodType.UNARY)
    val doGet = method("DoGet", grpc.MethodDescriptor.MethodType.SERVER_STREAMING)
    val handshake = method("Handshake", grpc.MethodDescriptor.MethodType.BIDI_STREAMING)
    val listFlights = method("ListFlights", grpc.MethodDescriptor.MethodType.SERVER_STREAMING)
    val listActions = method("ListActions", grpc.MethodDescriptor.MethodType.SERVER_STREAMING)

    def sqlOf(desc: Pb.FlightDescriptor): String =
      if (desc.descType == 2 && desc.cmd.nonEmpty)
        new String(desc.cmd, StandardCharsets.UTF_8)
      else if (desc.descType == 1 && desc.path.nonEmpty)
        // PATH descriptor names a catalog dataset (the reference serves
        // both shapes) — quote each segment so odd names can't inject
        "SELECT * FROM " +
          desc.path.map(p => "`" + p.replace("`", "``") + "`").mkString(".")
      else throw grpc.Status.INVALID_ARGUMENT.withDescription(
        "flight: submit a CMD descriptor (SQL bytes) or a PATH descriptor " +
          "(catalog dataset)").asRuntimeException()

    val infoHandler = ServerCalls.asyncUnaryCall(
      new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte], obs: StreamObserver[Array[Byte]]): Unit =
          try {
            reapPending()
            val desc = Pb.readDescriptor(req)
            val session = root.newSession()
            bindPrincipal(root, session)
            val df = graft.Graft.sql(session, sqlOf(desc))
            val schema = org.apache.spark.sql.graft.Bridge.arrowSchema(df)
            val ticket = java.util.UUID.randomUUID().toString
            pending.put(ticket, Pending(df,
              graft.auth.Privileges.principalOf(session).map(_.name),
              System.currentTimeMillis()))
            val endpoint = Pb.writeEndpoint(
              ticket.getBytes(StandardCharsets.UTF_8),
              Seq(s"grpc://localhost:${boundPort.getOrElse(0)}"))
            obs.onNext(Pb.writeFlightInfo(schemaIpcBytes(schema), req,
              Seq(endpoint), totalRecords = -1L, totalBytes = -1L))
            obs.onCompleted()
          } catch { case t: Throwable => fail(obs, t) }
      })

    val schemaHandler = ServerCalls.asyncUnaryCall(
      new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte], obs: StreamObserver[Array[Byte]]): Unit =
          try {
            val df = statementOf(root, sqlOf(Pb.readDescriptor(req)))
            val schema = org.apache.spark.sql.graft.Bridge.arrowSchema(df)
            obs.onNext(Pb.writeSchemaResult(schemaIpcBytes(schema)))
            obs.onCompleted()
          } catch { case t: Throwable => fail(obs, t) }
      })

    val doGetHandler = ServerCalls.asyncServerStreamingCall(
      new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte], obs: StreamObserver[Array[Byte]]): Unit =
          try {
            val tk = new String(Pb.readTicket(req), StandardCharsets.UTF_8)
            require(tk.nonEmpty, "flight: empty ticket")
            val df = pending.remove(tk) match {
              case Some(p) =>
                // the planned statement belongs to the principal that
                // submitted it — a different caller must not stream it
                val session = root.newSession()
                bindPrincipal(root, session)
                val caller = graft.auth.Privileges.principalOf(session).map(_.name)
                if (p.owner != caller)
                  throw unauthenticated(
                    "flight: ticket was issued to a different principal")
                p.df
              case None => statementOf(root, tk) // stateless SQL-in-ticket
            }
            // flow control: honor the transport's readiness signal so a
            // slow client backpressures the batch iterator instead of the
            // whole result buffering in gRPC — the "streams off
            // toLocalIterator" property would otherwise be a lie for any
            // consumer slower than the cluster
            val sObs = obs.asInstanceOf[
              org.sparkproject.connect.grpc.stub.ServerCallStreamObserver[Array[Byte]]]
            def send(frame: Array[Byte]): Boolean = {
              while (!sObs.isReady) {
                if (sObs.isCancelled) return false
                Thread.sleep(1)
              }
              sObs.onNext(frame); true
            }
            val schema = org.apache.spark.sql.graft.Bridge.arrowSchema(df)
            val t0 = System.nanoTime()
            var live = send(Pb.writeFlightData(schemaHeaderBytes(schema),
              Array.emptyByteArray))
            val it = org.apache.spark.sql.graft.Bridge.arrowBatches(df)
            while (live && it.hasNext) {
              val (header, body) = splitIpcMessage(it.next())
              live = send(Pb.writeFlightData(header, body))
            }
            // the RDD stream path bypasses Dataset actions, so the
            // QueryExecutionListener never fires — feed the wire-first
            // jobs service explicitly (principal rides the df's session)
            graft.catalog.QueryHistory.record("flightDoGet",
              df.queryExecution, System.nanoTime() - t0, None)
            if (live) obs.onCompleted()
          } catch { case t: Throwable => fail(obs, t) }
      })

    val handshakeHandler = ServerCalls.asyncBidiStreamingCall(
      new ServerCalls.BidiStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(obs: StreamObserver[Array[Byte]])
            : StreamObserver[Array[Byte]] = {
          // header-based basic auth is validated by the interceptor (which
          // attaches the bearer token to the response headers); the
          // handshake body itself just acks. The basic-token client
          // (pyarrow authenticate_basic_token) writes NO request messages
          // — it half-closes immediately and reads the headers — so the
          // validity check and the header-flushing response both live in
          // onCompleted. A Basic header that fails to mint is refused
          // loudly there.
          val header = CtxAuth.get()
          val isBasic = header != null && header.regionMatches(true, 0, "Basic ", 0, 6)
          new StreamObserver[Array[Byte]] {
            private var responded = false
            private def respond(payload: Array[Byte]): Unit = {
              responded = true
              obs.onNext(Pb.writeHandshake(payload))
            }
            override def onNext(req: Array[Byte]): Unit = {
              // legacy protobuf BasicAuth payload (Flight.proto) support:
              // the minted token rides back in the response payload
              val viaPayload = Pb.readBasicAuth(Pb.readHandshakePayload(req))
                .flatMap { case (u, p) =>
                  try Some(graft.auth.Privileges.login(root.newSession(), u, p))
                  catch { case _: SecurityException => None }
                }
              respond(viaPayload.map(_.getBytes(StandardCharsets.UTF_8))
                .getOrElse(Array.emptyByteArray))
            }
            override def onError(t: Throwable): Unit = ()
            override def onCompleted(): Unit = {
              if (isBasic && mintBearer(root, header).isEmpty)
                obs.onError(unauthenticated("flight: invalid basic credentials"))
              else {
                // a response message forces initial metadata (the bearer
                // header) onto the wire — trailers-only would skip it
                if (!responded) respond(Array.emptyByteArray)
                obs.onCompleted()
              }
            }
          }
        }
      })

    // ListFlights: one FlightInfo per catalog dataset (PATH descriptor +
    // SELECT * ticket) — the reference's dataset enumeration. Metadata is
    // listed over the server's own session (clones would hide its temp
    // views, same choice as the REST catalog API); statements still
    // execute on per-call cloned sessions.
    val listFlightsHandler = ServerCalls.asyncServerStreamingCall(
      new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte], obs: StreamObserver[Array[Byte]]): Unit =
          try {
            bindPrincipal(root, root.newSession()) // auth gate only
            root.catalog.listTables().collect().take(500).foreach { t =>
              try {
                val df = root.table(t.name)
                val schema = org.apache.spark.sql.graft.Bridge.arrowSchema(df)
                val ident = "`" + t.name.replace("`", "``") + "`"
                val desc = Pb.writeDescriptor(
                  Pb.FlightDescriptor(1, Array.emptyByteArray, Seq(t.name)))
                val endpoint = Pb.writeEndpoint(
                  s"SELECT * FROM $ident".getBytes(StandardCharsets.UTF_8),
                  Seq(s"grpc://localhost:${boundPort.getOrElse(0)}"))
                obs.onNext(Pb.writeFlightInfo(schemaIpcBytes(schema), desc,
                  Seq(endpoint), totalRecords = -1L, totalBytes = -1L))
              } catch { case _: Exception => () } // unreadable entry → skip
            }
            obs.onCompleted()
          } catch { case t: Throwable => fail(obs, t) }
      })

    val emptyStream = ServerCalls.asyncServerStreamingCall(
      new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte], obs: StreamObserver[Array[Byte]]): Unit =
          obs.onCompleted()
      })

    grpc.ServerServiceDefinition.builder(ServiceName)
      .addMethod(getFlightInfo, infoHandler)
      .addMethod(getSchema, schemaHandler)
      .addMethod(doGet, doGetHandler)
      .addMethod(handshake, handshakeHandler)
      .addMethod(listFlights, listFlightsHandler)
      .addMethod(listActions, emptyStream)
      .build()
  }

  /** Captures the authorization header into the call context; on
    * Handshake, valid Basic credentials are exchanged for a bearer token
    * returned in the response headers (the `authenticate_basic_token`
    * contract). */
  private final class AuthInterceptor(root: SparkSession) extends grpc.ServerInterceptor {
    override def interceptCall[Req, Resp](
        call: grpc.ServerCall[Req, Resp], headers: grpc.Metadata,
        next: grpc.ServerCallHandler[Req, Resp]): grpc.ServerCall.Listener[Req] = {
      val auth = headers.get(AuthHeader)
      val isHandshake =
        call.getMethodDescriptor.getFullMethodName == s"$ServiceName/Handshake"
      val wrapped =
        if (!isHandshake || auth == null) call
        else new grpc.ForwardingServerCall.SimpleForwardingServerCall[Req, Resp](call) {
          // clients read the minted token from initial OR trailing
          // metadata — attach to both so a trailers-only path still works
          private lazy val bearer = mintBearer(root, auth)
          override def sendHeaders(h: grpc.Metadata): Unit = {
            bearer.foreach(tok => h.put(AuthHeader, s"Bearer $tok"))
            super.sendHeaders(h)
          }
          override def close(status: grpc.Status, trailers: grpc.Metadata): Unit = {
            if (status.isOk)
              bearer.foreach(tok => trailers.put(AuthHeader, s"Bearer $tok"))
            super.close(status, trailers)
          }
        }
      grpc.Contexts.interceptCall(
        grpc.Context.current().withValue(CtxAuth, auth), wrapped, headers, next)
    }
  }

  // ---- lifecycle ----------------------------------------------------------

  def start(spark: SparkSession): Int = synchronized {
    boundPort.getOrElse {
      val srv = grpc.netty.NettyServerBuilder
        .forAddress(new InetSocketAddress("localhost", 0))
        .addService(grpc.ServerInterceptors.intercept(
          service(spark), new AuthInterceptor(spark)))
        .build().start()
      running = Some(srv)
      boundPort = Some(srv.getPort)
      srv.getPort
    }
  }

  def port: Option[Int] = boundPort

  def stop(): Unit = synchronized {
    running.foreach(_.shutdownNow())
    running = None
    boundPort = None
  }
}
