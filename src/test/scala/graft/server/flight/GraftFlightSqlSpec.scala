package graft.server.flight

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Flight SQL command layer over loopback with a REAL third-party
  * transport: pyarrow.flight carries the hand-framed
  * `google.protobuf.Any`-wrapped Flight SQL commands ([[PbSql]]) that a
  * stock ADBC/Flight SQL client emits — CommandStatementQuery, the
  * prepared-statement DoAction lifecycle, the catalog commands, and
  * DoPut ingest. The sandbox ships no ADBC driver, so the commands are
  * framed by our own codec and the RESPONSES are decoded by it too —
  * both directions of the public wire shape are asserted against a
  * third-party peer. */
class GraftFlightSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val pyflight: Boolean =
    try new ProcessBuilder("python3", "-c", "import pyarrow.flight")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  private lazy val script: String = {
    val f = Files.createTempFile("flightsql_client", ".py")
    Files.writeString(f,
      """import sys, json, base64
        |import pyarrow as pa
        |import pyarrow.flight as fl
        |
        |args = sys.argv[1:]
        |port, mode = args[0], args[1]
        |rest = args[2:]
        |client = fl.connect(f"grpc://localhost:{port}")
        |opts = None
        |if len(rest) >= 3 and rest[-3] == "basic":
        |    pair = client.authenticate_basic_token(rest[-2].encode(), rest[-1].encode())
        |    opts = fl.FlightCallOptions(headers=[pair])
        |    rest = rest[:-3]
        |
        |def show(reader):
        |    table = reader.read_all()
        |    print("RESULT " + json.dumps({
        |        "cols": table.schema.names,
        |        "rows": sorted(json.dumps(r, default=str, sort_keys=True)
        |                       for r in table.to_pylist())}))
        |
        |try:
        |    if mode == "cmd":
        |        desc = fl.FlightDescriptor.for_command(base64.b64decode(rest[0]))
        |        info = client.get_flight_info(desc, opts) if opts else client.get_flight_info(desc)
        |        tk = info.endpoints[0].ticket
        |        print("TICKET " + base64.b64encode(tk.ticket).decode())
        |        show(client.do_get(tk, opts) if opts else client.do_get(tk))
        |    elif mode == "ticket":
        |        tk = fl.Ticket(base64.b64decode(rest[0]))
        |        show(client.do_get(tk, opts) if opts else client.do_get(tk))
        |    elif mode == "action":
        |        act = fl.Action(rest[0], base64.b64decode(rest[1]) if len(rest) > 1 else b"")
        |        it = client.do_action(act, opts) if opts else client.do_action(act)
        |        for r in it:
        |            print("RESULTBODY " + base64.b64encode(r.body.to_pybytes()).decode())
        |        print("ACTION_DONE")
        |    elif mode == "put":
        |        path, n = rest[0], int(rest[1])
        |        table = pa.table({"id": pa.array(range(n), pa.int64()),
        |                          "v": pa.array([f"row{i}" for i in range(n)])})
        |        desc = fl.FlightDescriptor.for_path(path)
        |        w, meta = client.do_put(desc, table.schema, opts) if opts else client.do_put(desc, table.schema)
        |        w.write_table(table)
        |        w.done_writing()
        |        buf = meta.read()
        |        print("PUTMETA " + (buf.to_pybytes().decode() if buf is not None else "none"))
        |        w.close()
        |    elif mode == "info":
        |        desc = fl.FlightDescriptor.for_command(base64.b64decode(rest[0]))
        |        info = client.get_flight_info(desc, opts) if opts else client.get_flight_info(desc)
        |        print("INFO_FIELDS " + json.dumps(info.schema.names))
        |    elif mode == "update":
        |        desc = fl.FlightDescriptor.for_command(base64.b64decode(rest[0]))
        |        w, meta = client.do_put(desc, pa.schema([]), opts) if opts else client.do_put(desc, pa.schema([]))
        |        w.done_writing()
        |        buf = meta.read()
        |        print("UPDATEMETA " + (base64.b64encode(buf.to_pybytes()).decode() if buf is not None else "none"))
        |        w.close()
        |    elif mode == "putcmd":
        |        # DoPut against an Any-wrapped command descriptor (parameter
        |        # binding): rest[0]=b64 command, rest[1]=JSON {names, cols}
        |        desc = fl.FlightDescriptor.for_command(base64.b64decode(rest[0]))
        |        spec = json.loads(rest[1])
        |        arrays = []
        |        for col in spec["cols"]:
        |            if all(isinstance(v, int) for v in col):
        |                arrays.append(pa.array(col, pa.int64()))
        |            else:
        |                arrays.append(pa.array([str(v) for v in col], pa.string()))
        |        table = pa.table(dict(zip(spec["names"], arrays)))
        |        w, meta = client.do_put(desc, table.schema, opts) if opts else client.do_put(desc, table.schema)
        |        w.write_table(table)
        |        w.done_writing()
        |        buf = meta.read()
        |        print("PUTMETA " + (base64.b64encode(buf.to_pybytes()).decode() if buf is not None else "none"))
        |        w.close()
        |    elif mode == "cancel":
        |        # GetFlightInfo for a command, CancelQuery with the issued
        |        # FlightInfo, then try the (revoked) ticket, then cancel again
        |        def varint(n):
        |            out = b""
        |            while True:
        |                lo = n & 0x7F; n >>= 7
        |                out += bytes([lo | 0x80]) if n else bytes([lo])
        |                if not n: return out
        |        def ld(field, payload):
        |            return bytes([field << 3 | 2]) + varint(len(payload)) + payload
        |        desc = fl.FlightDescriptor.for_command(base64.b64decode(rest[0]))
        |        info = client.get_flight_info(desc, opts) if opts else client.get_flight_info(desc)
        |        ser = info.serialize()
        |        req = ld(1, ser.to_pybytes() if hasattr(ser, "to_pybytes") else bytes(ser))
        |        anyb = (ld(1, b"type.googleapis.com/arrow.flight.protocol.sql.ActionCancelQueryRequest")
        |                + ld(2, req))
        |        def cancel_once():
        |            act = fl.Action("CancelQuery", anyb)
        |            for r in (client.do_action(act, opts) if opts else client.do_action(act)):
        |                print("CANCELBODY " + base64.b64encode(r.body.to_pybytes()).decode())
        |        cancel_once()
        |        try:
        |            tk = info.endpoints[0].ticket
        |            (client.do_get(tk, opts) if opts else client.do_get(tk)).read_all()
        |            print("TICKET_STILL_LIVE")
        |        except Exception as e:
        |            print("TICKET_REVOKED " + str(e)[:120])
        |        cancel_once()
        |    elif mode == "listactions":
        |        for a in client.list_actions(opts) if opts else client.list_actions():
        |            print("ACTIONTYPE " + a.type)
        |except fl.FlightUnauthenticatedError as e:
        |    print("UNAUTHENTICATED " + str(e)[:120])
        |except fl.FlightError as e:
        |    print("FLIGHT_ERROR " + str(e)[:300])
        |except Exception as e:
        |    # pyarrow maps some gRPC statuses (NOT_FOUND, INVALID_ARGUMENT)
        |    # to plain Arrow exceptions rather than FlightError subclasses
        |    print("CLIENT_ERROR " + type(e).__name__ + " " + str(e)[:300])
        |""".stripMargin)
    f.toString
  }

  /** Run the client; returns combined output. */
  private def runClient(args: String*): String = {
    val pb = new ProcessBuilder(("python3" +: script +: args): _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    p.waitFor()
    out
  }

  private def port: Int =
    GraftFlightServer.port.getOrElse(GraftFlightServer.start(spark))
  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)
  private def firstLine(out: String, prefix: String): String =
    out.linesIterator.find(_.startsWith(prefix))
      .getOrElse(fail(s"no '$prefix' line in: ${out.take(600)}"))
      .stripPrefix(prefix)

  test("CommandStatementQuery executes ad-hoc SQL; ticket is an Any-wrapped TicketStatementQuery") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val q = s"SELECT r_regionkey, r_name FROM parquet.`$sf/region.parquet` ORDER BY r_regionkey"
    val cmd = PbSql.writeAny("CommandStatementQuery", PbSql.writeStatementQuery(q))
    val out = runClient(port.toString, "cmd", b64(cmd))
    // the ticket the server minted parses as Any(TicketStatementQuery)
    val ticket = unb64(firstLine(out, "TICKET "))
    PbSql.readAny(ticket) match {
      case Some(("TicketStatementQuery", v)) =>
        assert(PbSql.readHandle(v).nonEmpty, "empty statement handle")
      case other => fail(s"ticket was not Any(TicketStatementQuery): $other")
    }
    val got = firstLine(out, "RESULT ")
    assert(got.contains(""""cols": ["r_regionkey", "r_name"]"""), got.take(300))
    val want = spark.sql(q).collect()
    assert(got.contains(s""""rows": """) && want.length == 5)
    want.foreach { r =>
      assert(got.contains(s"""\\"r_name\\": \\"${r.getString(1)}\\""""), got.take(600))
    }
  }

  test("prepared statement lifecycle: create via DoAction, execute twice, close, stale handle refused") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val prepRunsBefore = graft.catalog.QueryHistory.records
      .count(_.action == "flightPreparedQuery")
    val q = s"SELECT count(*) AS n FROM parquet.`$sf/nation.parquet`"
    val createBody = PbSql.writeAny("ActionCreatePreparedStatementRequest",
      PbSql.writeCreatePreparedRequest(q))
    val created = runClient(port.toString, "action", "CreatePreparedStatement", b64(createBody))
    val resultBody = unb64(firstLine(created, "RESULTBODY "))
    val (handle, datasetSchema, paramSchema) = PbSql.readAny(resultBody) match {
      case Some(("ActionCreatePreparedStatementResult", v)) =>
        PbSql.readCreatePreparedResult(v)
      case other => fail(s"result was not Any(ActionCreatePreparedStatementResult): $other")
    }
    assert(handle.nonEmpty && paramSchema.isEmpty)
    // the dataset schema is a real IPC-encapsulated Arrow schema
    assert(datasetSchema.nonEmpty, "prepared SELECT must report its dataset schema")
    val schema = org.apache.arrow.vector.ipc.message.MessageSerializer.deserializeSchema(
      new org.apache.arrow.vector.ipc.ReadChannel(
        java.nio.channels.Channels.newChannel(
          new java.io.ByteArrayInputStream(datasetSchema))))
    assert(schema.getFields.size() == 1 && schema.getFields.get(0).getName == "n")

    // execute twice through the Any(CommandPreparedStatementQuery) ticket:
    // prepared statements are re-executable until closed
    val execTicket = PbSql.writeAny("CommandPreparedStatementQuery",
      PbSql.writePreparedStatementQuery(handle))
    (1 to 2).foreach { _ =>
      val out = runClient(port.toString, "ticket", b64(execTicket))
      assert(firstLine(out, "RESULT ").contains("\\\"n\\\": 25"), out.take(400))
    }
    // each execution lands in the jobs service with the prepared marker
    // (reference jobs-service prepared/executed distinction)
    val prepRuns = graft.catalog.QueryHistory.records
      .count(_.action == "flightPreparedQuery") - prepRunsBefore
    assert(prepRuns == 2, s"expected 2 flightPreparedQuery records, got $prepRuns")

    val closeBody = PbSql.writeAny("ActionClosePreparedStatementRequest",
      PbSql.writeTicketStatementQuery(handle)) // same {1: handle} layout
    val closed = runClient(port.toString, "action", "ClosePreparedStatement", b64(closeBody))
    assert(closed.contains("ACTION_DONE"), closed.take(300))
    val stale = runClient(port.toString, "ticket", b64(execTicket))
    assert(stale.contains("unknown prepared"), stale.take(300))
  }

  test("catalog commands: GetCatalogs, GetDbSchemas, GetTables (+schema), GetTableTypes") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    spark.sql("DROP TABLE IF EXISTS flightsql_cat_t")
    spark.sql("CREATE TABLE flightsql_cat_t STORED AS PARQUET AS " +
      "SELECT id, CAST(id AS STRING) AS s FROM range(7)")
    try {
      val cats = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetCatalogs", Array.emptyByteArray)))
      assert(firstLine(cats, "RESULT ").contains("spark_catalog"), cats.take(300))

      val dbs = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetDbSchemas", Array.emptyByteArray)))
      val dbsGot = firstLine(dbs, "RESULT ")
      assert(dbsGot.contains("db_schema_name") && dbsGot.contains("default"), dbsGot.take(300))

      val tables = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetTables", PbSql.writeGetTables(
          PbSql.GetTables(None, None, Some("flightsql_cat_%"), Nil,
            includeSchema = false)))))
      val tGot = firstLine(tables, "RESULT ")
      assert(tGot.contains("flightsql_cat_t") && tGot.contains("TABLE"), tGot.take(400))

      // include_schema=true serves IPC schema bytes per table
      val withSchema = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetTables", PbSql.writeGetTables(
          PbSql.GetTables(None, None, Some("flightsql_cat_t"), Nil,
            includeSchema = true)))))
      val wsGot = firstLine(withSchema, "RESULT ")
      assert(wsGot.contains("table_schema"), wsGot.take(400))

      val types = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetTableTypes", Array.emptyByteArray)))
      val tyGot = firstLine(types, "RESULT ")
      assert(tyGot.contains("TABLE") && tyGot.contains("VIEW"), tyGot.take(300))

      // without the spec-required table filter → empty relation with the
      // spec's columns (ADBC probes these; a refused RPC would be wrong)
      val pks = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetPrimaryKeys", Array.emptyByteArray)))
      val pkGot = firstLine(pks, "RESULT ")
      assert(pkGot.contains("key_sequence") && pkGot.contains(""""rows": []"""),
        pkGot.take(300))
      // a lake view whose table DECLARES a primary key reports it, one
      // row per column with 1-based sequence (ALTER LAKE ... ADD PRIMARY KEY)
      val pkDir = java.nio.file.Files.createTempDirectory("graft_fsql_pk").toString + "/t"
      spark.sql(s"CREATE LAKE '$pkDir' AS SELECT id, CAST(id AS STRING) AS nm FROM range(5)")
      spark.sql(s"ALTER LAKE '$pkDir' ADD PRIMARY KEY (id, nm)")
      spark.sql(s"CREATE LAKE VIEW flightsql_pk_v FROM '$pkDir'")
      val pks2 = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetPrimaryKeys",
          PbSql.writeGetPrimaryKeys("flightsql_pk_v"))))
      val pk2Got = firstLine(pks2, "RESULT ")
      assert(pk2Got.contains("pk_flightsql_pk_v") &&
        pk2Got.contains("""\"column_name\": \"id\"""") &&
        pk2Got.contains("""\"column_name\": \"nm\"""") &&
        pk2Got.contains("""\"key_sequence\": 2"""),
        pk2Got.take(500))
      val fks = runClient(port.toString, "cmd",
        b64(PbSql.writeAny("CommandGetImportedKeys", Array.emptyByteArray)))
      val fkGot = firstLine(fks, "RESULT ")
      assert(fkGot.contains("pk_table_name") && fkGot.contains("update_rule") &&
        fkGot.contains(""""rows": []"""), fkGot.take(400))
    } finally spark.sql("DROP TABLE IF EXISTS flightsql_cat_t")
  }

  test("GetSqlInfo serves the dense-union info batch a stock client decodes") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val out = runClient(port.toString, "cmd",
      b64(PbSql.writeAny("CommandGetSqlInfo", Array.emptyByteArray)))
    val got = firstLine(out, "RESULT ")
    assert(got.contains(""""cols": ["info_name", "value"]"""), got.take(300))
    assert(got.contains("graft") && got.contains("0.1.0"), got.take(400))
  }

  test("ListActions advertises the prepared-statement lifecycle") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val out = runClient(port.toString, "listactions")
    assert(out.contains("ACTIONTYPE CreatePreparedStatement") &&
      out.contains("ACTIONTYPE ClosePreparedStatement") &&
      out.contains("ACTIONTYPE CancelQuery"), out.take(300))
  }

  test("CancelQuery revokes an issued statement ticket; re-cancel is NOT_CANCELLABLE") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val cmd = PbSql.writeAny("CommandStatementQuery",
      PbSql.writeStatementQuery("SELECT id, id * 2 AS twice FROM range(5)"))
    val out = runClient(port.toString, "cancel", b64(cmd))
    val bodies = out.linesIterator.filter(_.startsWith("CANCELBODY "))
      .map(l => java.util.Base64.getDecoder.decode(l.stripPrefix("CANCELBODY ")))
      .toSeq
    assert(bodies.size == 2, out.take(400))
    def statusOf(b: Array[Byte]): Int =
      PbSql.readAny(b) match {
        case Some(("ActionCancelQueryResult", v)) => PbSql.readCancelQueryResult(v)
        case other => fail(s"unexpected cancel result: $other")
      }
    assert(statusOf(bodies(0)) == 1, "first cancel must report CANCELLED")   // CANCELLED
    assert(out.contains("TICKET_REVOKED"), out.take(400))
    assert(statusOf(bodies(1)) == 3, "re-cancel must report NOT_CANCELLABLE")
  }

  test("DoPut ingests into a lake table; DoGet reads the rows back exactly") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val dir = Files.createTempDirectory("flight_put").toString + "/t"
    val put = runClient(port.toString, "put", dir, "123")
    assert(firstLine(put, "PUTMETA ") == """{"rows":123}""", put.take(400))
    // append a second batch onto the now-existing lake table
    val put2 = runClient(port.toString, "put", dir, "7")
    assert(firstLine(put2, "PUTMETA ") == """{"rows":7}""", put2.take(400))
    val back = spark.sql(s"SELECT count(*) AS n, sum(id) AS s FROM lake_scan('$dir')")
      .collect().head
    assert(back.getLong(0) == 130)
    assert(back.getLong(1) == (0 until 123).sum + (0 until 7).sum)
    // and over the wire too
    val rd = runClient(port.toString, "cmd",
      b64(PbSql.writeAny("CommandStatementQuery", PbSql.writeStatementQuery(
        s"SELECT count(*) AS n FROM lake_scan('$dir')"))))
    assert(firstLine(rd, "RESULT ").contains("\\\"n\\\": 130"), rd.take(300))
  }

  test("prepared DDL never executes at GetFlightInfo — only DoGet runs it, once") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val dir = Files.createTempDirectory("flight_prep_ddl").toString + "/t"
    val createBody = PbSql.writeAny("ActionCreatePreparedStatementRequest",
      PbSql.writeCreatePreparedRequest(
        s"CREATE LAKE '$dir' AS SELECT id FROM range(9)"))
    val created = runClient(port.toString, "action", "CreatePreparedStatement", b64(createBody))
    val (handle, ds, _) = PbSql.readAny(unb64(firstLine(created, "RESULTBODY "))) match {
      case Some(("ActionCreatePreparedStatementResult", v)) => PbSql.readCreatePreparedResult(v)
      case other => fail(s"unexpected action result: $other")
    }
    assert(ds.isEmpty, "a prepared command reports no dataset schema")
    assert(!graft.sources.SnapshotTable.isLakeTable(dir),
      "preparing a DDL must not execute it")
    val execTicket = PbSql.writeAny("CommandPreparedStatementQuery",
      PbSql.writePreparedStatementQuery(handle))
    val info = runClient(port.toString, "info", b64(execTicket))
    assert(info.contains("INFO_FIELDS"), info.take(300))
    assert(!graft.sources.SnapshotTable.isLakeTable(dir),
      "GetFlightInfo on a prepared DDL must not execute it")
    runClient(port.toString, "ticket", b64(execTicket))
    assert(graft.sources.SnapshotTable.isLakeTable(dir), "DoGet executes the DDL")
    assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$dir')").head().getLong(0) == 9)
  }

  test("CommandStatementUpdate over DoPut runs DML and acks with DoPutUpdateResult") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val dir = Files.createTempDirectory("flight_upd").toString + "/t"
    spark.sql(s"CREATE LAKE '$dir' AS SELECT id, id * 2 AS v FROM range(50)")
    val upd = PbSql.writeAny("CommandStatementUpdate", PbSql.writeStatementQuery(
      s"DELETE FROM LAKE '$dir' WHERE id >= 40"))
    val out = runClient(port.toString, "update", b64(upd))
    val meta = unb64(firstLine(out, "UPDATEMETA "))
    assert(PbSql.readDoPutUpdateResult(meta) == -1L) // count unknown, spec-legal
    assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$dir')")
      .head().getLong(0) == 40)
  }

  test("prepared-statement parameter binding: DoPut params, execute, rebind, refuse mismatches") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    // prepare a `?`-parameterized query (reference
    // acceptPutPreparedStatementQuery, DremioFlightProducer.java:437)
    val q = s"SELECT n_name FROM parquet.`$sf/nation.parquet` WHERE n_nationkey = ?"
    val created = runClient(port.toString, "action", "CreatePreparedStatement",
      b64(PbSql.writeAny("ActionCreatePreparedStatementRequest",
        PbSql.writeCreatePreparedRequest(q))))
    val (handle, _, _) = PbSql.readAny(unb64(firstLine(created, "RESULTBODY "))) match {
      case Some(("ActionCreatePreparedStatementResult", v)) => PbSql.readCreatePreparedResult(v)
      case other => fail(s"unexpected action result: $other")
    }
    val cmd = PbSql.writeAny("CommandPreparedStatementQuery",
      PbSql.writePreparedStatementQuery(handle))

    // bind [3], execute → the row with key 3, same as inline literal
    val bind3 = runClient(port.toString, "putcmd", b64(cmd),
      """{"names":["p0"],"cols":[[3]]}""")
    assert(firstLine(bind3, "PUTMETA ").nonEmpty, bind3.take(400))
    val want3 = spark.sql(q.replace("?", "3")).head().getString(0)
    val got3 = firstLine(runClient(port.toString, "ticket", b64(cmd)), "RESULT ")
    assert(got3.contains(s"""\\"n_name\\": \\"$want3\\""""), got3.take(400))

    // rebind [7] → a DIFFERENT result (params substitute per execution)
    runClient(port.toString, "putcmd", b64(cmd), """{"names":["p0"],"cols":[[7]]}""")
    val want7 = spark.sql(q.replace("?", "7")).head().getString(0)
    val got7 = firstLine(runClient(port.toString, "ticket", b64(cmd)), "RESULT ")
    assert(got7.contains(s"""\\"n_name\\": \\"$want7\\"""") && want3 != want7, got7.take(400))

    // a multi-row binding is refused for a query execution
    runClient(port.toString, "putcmd", b64(cmd),
      """{"names":["p0"],"cols":[[1,2]]}""")
    val multi = runClient(port.toString, "ticket", b64(cmd))
    assert(multi.contains("exactly one parameter row"), multi.take(400))

    // arity mismatch: two markers, one bound value → refused at execution
    val q2 = s"SELECT n_name FROM parquet.`$sf/nation.parquet` " +
      "WHERE n_nationkey = ? AND n_regionkey = ?"
    val created2 = runClient(port.toString, "action", "CreatePreparedStatement",
      b64(PbSql.writeAny("ActionCreatePreparedStatementRequest",
        PbSql.writeCreatePreparedRequest(q2))))
    val (handle2, _, _) = PbSql.readAny(unb64(firstLine(created2, "RESULTBODY "))) match {
      case Some(("ActionCreatePreparedStatementResult", v)) => PbSql.readCreatePreparedResult(v)
      case other => fail(s"unexpected action result: $other")
    }
    val cmd2 = PbSql.writeAny("CommandPreparedStatementQuery",
      PbSql.writePreparedStatementQuery(handle2))
    runClient(port.toString, "putcmd", b64(cmd2), """{"names":["p0"],"cols":[[3]]}""")
    val short = runClient(port.toString, "ticket", b64(cmd2))
    assert(!short.contains("RESULT "), short.take(400))
  }

  test("parameterized prepared UPDATE over DoPut runs once per bound row") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val dir = Files.createTempDirectory("flight_pupd").toString + "/t"
    spark.sql(s"CREATE LAKE '$dir' AS SELECT id, CAST(0 AS BIGINT) AS v FROM range(10)")
    val created = runClient(port.toString, "action", "CreatePreparedStatement",
      b64(PbSql.writeAny("ActionCreatePreparedStatementRequest",
        PbSql.writeCreatePreparedRequest(
          s"UPDATE LAKE '$dir' SET v = 1 WHERE id = ?"))))
    val (handle, _, _) = PbSql.readAny(unb64(firstLine(created, "RESULTBODY "))) match {
      case Some(("ActionCreatePreparedStatementResult", v)) => PbSql.readCreatePreparedResult(v)
      case other => fail(s"unexpected action result: $other")
    }
    // CommandPreparedStatementUpdate with a 3-row batch = 3 executions
    val upd = PbSql.writeAny("CommandPreparedStatementUpdate",
      PbSql.writePreparedStatementQuery(handle))
    val out = runClient(port.toString, "putcmd", b64(upd),
      """{"names":["p0"],"cols":[[2,5,8]]}""")
    assert(firstLine(out, "PUTMETA ").nonEmpty, out.take(400))
    assert(spark.sql(s"SELECT sum(v) AS s FROM lake_scan('$dir')")
      .head().getLong(0) == 3L, "each bound row must drive one execution")
  }

  test("CommandGetXdbcTypeInfo serves the ODBC type-mapping probe, filterable by code") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val all = runClient(port.toString, "cmd",
      b64(PbSql.writeAny("CommandGetXdbcTypeInfo",
        PbSql.writeGetXdbcTypeInfo(None))))
    val got = firstLine(all, "RESULT ")
    assert(got.contains("type_name") && got.contains("VARCHAR") &&
      got.contains("BIGINT") && got.contains("TIMESTAMP"), got.take(500))
    // data_type filter narrows to one code (12 = VARCHAR)
    val one = firstLine(runClient(port.toString, "cmd",
      b64(PbSql.writeAny("CommandGetXdbcTypeInfo",
        PbSql.writeGetXdbcTypeInfo(Some(12))))), "RESULT ")
    assert(one.contains("VARCHAR") && !one.contains("BIGINT"), one.take(400))
  }

  test("GetSqlInfo breadth: quoting, identifier case, null ordering, keyword list") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val out = runClient(port.toString, "cmd",
      b64(PbSql.writeAny("CommandGetSqlInfo", Array.emptyByteArray)))
    val got = firstLine(out, "RESULT ")
    // 504 IDENTIFIER_QUOTE_CHAR = ` ; 503/505 case-insensitive (1);
    // 507 nulls sorted low (1); 508 keyword list decodes as a real list
    assert(got.contains(""""info_name\": 504""") && got.contains("""`"""), got.take(900))
    assert(got.contains(""""info_name\": 503"""), got.take(900))
    assert(got.contains(""""info_name\": 508""") && got.contains("QUALIFY"), got.take(1200))
  }

  test("sys_prepared_statements: handle visible on create, gone on close; idle expiry reaps") {
    val h = GraftFlightSql.createPrepared("SELECT 1 AS one", Some("sysps_user"))
    try {
      graft.catalog.InfoSchema.register(spark)
      val row = spark.sql(
        s"SELECT owner, statement, bound_param_rows FROM sys_prepared_statements WHERE handle = '$h'")
        .collect()
      assert(row.length == 1 && row.head.getString(0) == "sysps_user" &&
        row.head.getString(1) == "SELECT 1 AS one" && row.head.getInt(2) == 0)
      // binding params surfaces in the view
      GraftFlightSql.getPrepared(h).get.params.set(Seq(Array[Any](1L)))
      assert(spark.sql(
        s"SELECT bound_param_rows FROM sys_prepared_statements WHERE handle = '$h'")
        .head().getInt(0) == 1)
    } finally GraftFlightSql.closePrepared(h)
    assert(spark.sql(
      s"SELECT * FROM sys_prepared_statements WHERE handle = '$h'").count() == 0)

    // idle expiry: age the handle's lastUsed past the idle window — the
    // next lookup reaps it and the refusal names the policy
    val h2 = GraftFlightSql.createPrepared("SELECT 2 AS two", None)
    GraftFlightSql.getPrepared(h2).get.lastUsedMs
      .set(System.currentTimeMillis() - GraftFlightSql.IdleExpiryMs - 1000)
    assert(GraftFlightSql.getPrepared(h2).isEmpty, "idle handles reap on lookup")
    assert(GraftFlightSql.expiryHint.contains("minutes idle"))
  }

  test("bulk DoPut spills to staged Arrow files and lands via a distributed read") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    val before = GraftFlightServer.spilledPuts.get
    val dir = Files.createTempDirectory("flight_put_spill").toString + "/t"
    val put = runClient(port.toString, "put", dir, "20000")
    assert(firstLine(put, "PUTMETA ") == """{"rows":20000}""", put.take(400))
    assert(GraftFlightServer.spilledPuts.get > before,
      "ingest-shaped DoPut must take the staged spill path, not driver memory")
    val back = spark.sql(s"SELECT count(*) AS n, sum(id) AS s FROM lake_scan('$dir')")
      .collect().head
    assert(back.getLong(0) == 20000 && back.getLong(1) == (0L until 20000L).sum)
  }

  test("DoPut under enforcement: refused without INSERT, lands with it") {
    assume(pyflight, "pyarrow.flight not available in this environment")
    import graft.auth.Privileges
    Privileges.clear()
    val dir = Files.createTempDirectory("flight_put_auth").toString + "/t"
    try {
      spark.sql("CREATE USER fp_admin PASSWORD 'pp' ADMIN")
      spark.sql("CREATE USER fp_bob PASSWORD 'bp'")
      spark.sql("ALTER AUTH ENFORCE ON")
      val anon = runClient(port.toString, "put", dir, "5")
      assert(anon.contains("UNAUTHENTICATED") || anon.contains("FLIGHT_ERROR"),
        anon.take(400))
      val denied = runClient(port.toString, "put", dir, "5", "basic", "fp_bob", "bp")
      assert(denied.contains("lacks INSERT") || denied.contains("FLIGHT_ERROR"),
        denied.take(400))
      assert(!graft.sources.SnapshotTable.isLakeTable(dir),
        "refused DoPut must not create the table")
      spark.sql("AUTHENTICATE USER fp_admin PASSWORD 'pp'")
      spark.sql(s"GRANT INSERT ON '$dir' TO USER fp_bob")
      val ok = runClient(port.toString, "put", dir, "5", "basic", "fp_bob", "bp")
      assert(firstLine(ok, "PUTMETA ") == """{"rows":5}""", ok.take(400))
    } finally {
      Privileges.clear()
      spark.conf.unset(graft.auth.Privileges.TokenConf)
      spark.conf.unset(graft.auth.Privileges.UserConf)
    }
  }
}
