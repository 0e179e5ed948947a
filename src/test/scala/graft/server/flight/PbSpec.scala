package graft.server.flight

import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz of the hand-rolled Flight protobuf codec: whatever the
  * writer frames, the reader recovers — across sizes that cross every
  * varint length boundary — and unknown fields skip cleanly (the
  * forward-compatibility rule protobuf readers must obey). Deterministic
  * seeds, so a failure is a repro, not a flake. */
class PbSpec extends AnyFunSuite {

  private def rnd(seed: Long) = new scala.util.Random(seed)
  private def randBytes(r: scala.util.Random, max: Int = 3000): Array[Byte] = {
    val b = new Array[Byte](r.nextInt(max + 1)); r.nextBytes(b); b
  }
  private def randStr(r: scala.util.Random): String =
    r.alphanumeric.take(r.nextInt(40)).mkString

  test("FlightDescriptor round-trips: type, cmd bytes, path segments (200 seeds)") {
    val r = rnd(0xF11647L)
    (1 to 200).foreach { i =>
      val t = r.nextInt(3)
      val cmd = randBytes(r)
      val path = Seq.fill(r.nextInt(5))(randStr(r))
      val back = Pb.readDescriptor(
        Pb.writeDescriptor(Pb.FlightDescriptor(t, cmd, path)))
      assert(back.descType == t, s"seed iter $i")
      assert(back.cmd.toSeq == cmd.toSeq, s"seed iter $i")
      assert(back.path == path, s"seed iter $i")
    }
  }

  test("Ticket round-trips across varint length boundaries") {
    // 0, 1, 127/128 (1→2 byte varint), 16383/16384 (2→3), and beyond
    Seq(0, 1, 127, 128, 300, 16383, 16384, 70000).foreach { n =>
      val t = Array.tabulate[Byte](n)(i => (i * 31).toByte)
      assert(Pb.readTicket(Pb.writeTicket(t)).toSeq == t.toSeq, s"len $n")
    }
    val r = rnd(0x7ef2L)
    (1 to 100).foreach { _ =>
      val t = randBytes(r, 20000)
      assert(Pb.readTicket(Pb.writeTicket(t)).toSeq == t.toSeq)
    }
  }

  test("Handshake payload and BasicAuth round-trip") {
    val r = rnd(0xbead5L)
    (1 to 100).foreach { _ =>
      val p = randBytes(r)
      assert(Pb.readHandshakePayload(Pb.writeHandshake(p)).toSeq == p.toSeq)
    }
    // BasicAuth is read-side only (clients send it): frame one by hand
    val ba = new Pb.Writer().string(2, "alice").string(3, "p:w,d").result
    assert(Pb.readBasicAuth(ba).contains(("alice", "p:w,d")))
    assert(Pb.readBasicAuth(new Pb.Writer().string(2, "u").result).isEmpty)
  }

  test("readers skip unknown fields (forward compatibility)") {
    // descriptor plus unknown varint field 9, unknown LEN field 12,
    // unknown fixed32 field 13, unknown fixed64 field 14
    val w = new Pb.Writer()
      .int(1, 2).bytes(2, "SELECT 1".getBytes("UTF-8"))
      .int(9, 123456789L)
      .bytes(12, Array.fill[Byte](64)(7))
    val extra = w.result ++
      Array[Byte](((13 << 3) | 5).toByte, 1, 2, 3, 4) ++
      Array[Byte](((14 << 3) | 1).toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    val d = Pb.readDescriptor(extra)
    assert(d.descType == 2 && new String(d.cmd, "UTF-8") == "SELECT 1")
  }

  test("FlightData framing: header and body recoverable by a protobuf reader") {
    val r = rnd(0xf1d4L)
    (1 to 100).foreach { _ =>
      val header = randBytes(r); val body = randBytes(r, 20000)
      val framed = Pb.writeFlightData(header, body)
      val rd = new Pb.Reader(framed)
      var gotHeader = Array.emptyByteArray
      var gotBody = Array.emptyByteArray
      while (rd.hasNext) rd.nextTag() match {
        case (2, 2) => gotHeader = rd.readBytes()
        case (1000, 2) => gotBody = rd.readBytes()
        case (_, wire) => rd.skip(wire)
      }
      assert(gotHeader.toSeq == header.toSeq)
      assert(gotBody.toSeq == body.toSeq)
    }
  }

  test("truncated frames fail loudly, never return garbage") {
    val full = Pb.writeDescriptor(
      Pb.FlightDescriptor(2, Array.fill[Byte](100)(42), Seq("a", "b")))
    // every strict prefix either parses to a PREFIX of the fields or throws
    (1 until full.length).foreach { cut =>
      try {
        val d = Pb.readDescriptor(full.take(cut))
        assert(d.cmd.length <= 100)
      } catch {
        case _: IllegalArgumentException => () // "truncated" — the loud path
      }
    }
  }
}
