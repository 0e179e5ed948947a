package graft.server.flight

import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz of the Flight SQL codecs layered on [[Pb]] — the Any
  * envelope, the prepared-statement result, GetTables (repeated
  * table_types — the field shape that bit the r9 Pb codec), and the
  * packed/unpacked duality of CommandGetSqlInfo's repeated uint32.
  * Deterministic seeds: a failure is a repro, not a flake. */
class PbSqlSpec extends AnyFunSuite {

  private def rnd(seed: Long) = new scala.util.Random(seed)
  private def randBytes(r: scala.util.Random, max: Int = 3000): Array[Byte] = {
    val b = new Array[Byte](r.nextInt(max + 1)); r.nextBytes(b); b
  }
  private def randStr(r: scala.util.Random): String =
    r.alphanumeric.take(r.nextInt(40)).mkString

  test("Any envelope round-trips and rejects foreign packages (200 seeds)") {
    val r = rnd(0xA27L)
    (1 to 200).foreach { i =>
      val msg = "Command" + randStr(r)
      val value = randBytes(r)
      PbSql.readAny(PbSql.writeAny(msg, value)) match {
        case Some((m, v)) =>
          assert(m == msg, s"iter $i")
          assert(v.toSeq == value.toSeq, s"iter $i")
        case None => fail(s"iter $i: self-framed Any did not parse")
      }
    }
    // a non-Flight-SQL Any (different package) must fall through to the
    // legacy raw-SQL path, not dispatch
    val foreign = new Pb.Writer()
      .string(1, "type.googleapis.com/google.protobuf.Empty")
      .bytes(2, Array[Byte](1, 2, 3)).result
    assert(PbSql.readAny(foreign).isEmpty)
    // raw SQL text (the legacy descriptor) must not parse as an Any
    assert(PbSql.readAny("SELECT 1".getBytes("UTF-8")).isEmpty)
  }

  test("statement / handle messages round-trip (valueless and huge)") {
    val r = rnd(0x51a7L)
    (1 to 100).foreach { _ =>
      val q = randStr(r) + " SELECT * FROM " + randStr(r)
      assert(PbSql.readStatementQuery(PbSql.writeStatementQuery(q)) == q)
      val h = randBytes(r, 20000)
      assert(PbSql.readHandle(PbSql.writeTicketStatementQuery(h)).toSeq == h.toSeq)
      assert(PbSql.readHandle(PbSql.writePreparedStatementQuery(h)).toSeq == h.toSeq)
    }
    assert(PbSql.readStatementQuery(PbSql.writeStatementQuery("")) == "")
    assert(PbSql.readHandle(PbSql.writeTicketStatementQuery(Array.emptyByteArray)).isEmpty)
  }

  test("ActionCreatePreparedStatementResult round-trips all three fields (100 seeds)") {
    val r = rnd(0xCAFEL)
    (1 to 100).foreach { i =>
      val h = randBytes(r, 100)
      val ds = randBytes(r)
      val ps = randBytes(r)
      val (h2, ds2, ps2) = PbSql.readCreatePreparedResult(
        PbSql.writeCreatePreparedResult(h, ds, ps))
      assert(h2.toSeq == h.toSeq && ds2.toSeq == ds.toSeq && ps2.toSeq == ps.toSeq,
        s"iter $i")
    }
  }

  test("GetTables round-trips: optional filters, REPEATED table_types, include_schema (200 seeds)") {
    val r = rnd(0x6e7L)
    (1 to 200).foreach { i =>
      val t = PbSql.GetTables(
        catalog = if (r.nextBoolean()) Some(randStr(r)) else None,
        dbPattern = if (r.nextBoolean()) Some(randStr(r)) else None,
        tablePattern = if (r.nextBoolean()) Some(randStr(r)) else None,
        tableTypes = Seq.fill(r.nextInt(4))(
          if (r.nextInt(5) == 0) "" else randStr(r)), // empty segments survive
        includeSchema = r.nextBoolean())
      val back = PbSql.readGetTables(PbSql.writeGetTables(t))
      assert(back == t, s"iter $i: $back != $t")
    }
  }

  test("CommandGetSqlInfo accepts packed AND unpacked repeated uint32") {
    // packed (proto3 default): one LEN field of concatenated varints
    val packedPayload = {
      val w = new Pb.Writer()
      Seq(0L, 1L, 127L, 128L, 3L).foreach(w.varintRaw)
      new Pb.Writer().bytes(1, w.result).result
    }
    assert(PbSql.readGetSqlInfo(packedPayload) == Seq(0, 1, 127, 128, 3))
    // unpacked (proto2-style writers): one varint field per element
    val unpacked = new Pb.Writer().int(1, 7L).int(1, 2L).result
    assert(PbSql.readGetSqlInfo(unpacked) == Seq(7, 2))
    assert(PbSql.readGetSqlInfo(Array.emptyByteArray).isEmpty)
  }

  test("Action / Result / FlightData / PutResult round-trip (100 seeds)") {
    val r = rnd(0xD0D0L)
    (1 to 100).foreach { i =>
      val a = PbSql.Action(randStr(r), randBytes(r))
      val a2 = PbSql.readAction(PbSql.writeAction(a))
      assert(a2.tpe == a.tpe && a2.body.toSeq == a.body.toSeq, s"iter $i")

      val body = randBytes(r)
      assert(PbSql.readResultBody(PbSql.writeResult(body)).toSeq == body.toSeq, s"iter $i")

      val meta = randBytes(r, 200)
      assert(PbSql.readPutResult(PbSql.writePutResult(meta)).toSeq == meta.toSeq, s"iter $i")

      // FlightData as the server reads it from a DoPut client: the write
      // side only frames {2, 1000}, so descriptor presence is framed by
      // hand here
      val desc = Pb.FlightDescriptor(1, Array.emptyByteArray, Seq(randStr(r)))
      val header = randBytes(r); val dataBody = randBytes(r)
      val frame = {
        val w = new Pb.Writer()
        w.message(1, Pb.writeDescriptor(desc))
        w.bytes(2, header)
        w.bytes(1000, dataBody)
        w.result
      }
      val fd = PbSql.readFlightData(frame)
      assert(fd.descriptor.exists(_.path == desc.path), s"iter $i")
      assert(fd.dataHeader.toSeq == header.toSeq, s"iter $i")
      assert(fd.dataBody.toSeq == dataBody.toSeq, s"iter $i")
    }
  }

  test("DoPutUpdateResult round-trips including the -1 unknown-count sentinel") {
    Seq(-1L, 0L, 1L, 127L, 128L, 1000000L, Long.MaxValue).foreach { n =>
      assert(PbSql.readDoPutUpdateResult(PbSql.writeDoPutUpdateResult(n)) == n, s"n=$n")
    }
  }
}
