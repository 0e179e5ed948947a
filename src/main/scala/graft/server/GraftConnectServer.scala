package graft.server

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connect.service.SparkConnectService

/** Spark Connect endpoint: the gRPC + Arrow-columnar wire over a graft
  * session — the Spark-native answer to the reference's Arrow Flight SQL
  * server (`services/arrow-flight/src/main/java/com/dremio/service/flight/
  * DremioFlightProducer.java:89`). Where the Thrift endpoint
  * ([[GraftServer]]) ferries row-serialized results to JDBC/BI clients,
  * Connect streams Arrow record batches — the high-throughput columnar
  * path a Python/ADBC/Scala data-engineering client uses.
  *
  * The service runs in-process over the graft session's SparkContext.
  * Each remote client gets an isolated session cloned over the shared
  * context; those sessions read `spark.sql.extensions` from the context
  * conf (GraftSession.configure), so the full graft SQL surface — lake
  * DDL/DML, reflections, pipes — works over the wire unchanged.
  *
  * Scale: like the Thrift front end, this is a thin protocol adapter —
  * plans execute on the cluster exactly as in-process queries do. Arrow
  * batching means result fan-out cost is column-buffer copies, not
  * row-by-row serialization.
  */
object GraftConnectServer {

  @volatile private var boundPort: Option[Int] = None

  /** Start the Connect gRPC service over `spark`'s context (idempotent)
    * and return the bound port. The context conf carries
    * `spark.connect.grpc.binding.port=0` (GraftSession.configure), so the
    * OS assigns a free port and we read it back from the gRPC server —
    * no reserve/bind TOCTOU window at all (contrast
    * GraftServer.reservePort, where hive's conf snapshot forces a
    * pre-context reservation). */
  def start(spark: SparkSession): Int = synchronized {
    boundPort.getOrElse {
      SparkConnectService.start(spark.sparkContext)
      // the OS-assigned port lives on the (private[connect]) grpc server
      // handle, whose Scala signature also still names pre-shading io.grpc
      // types — reflection is the only clean access to it
      val srv = SparkConnectService.getClass.getMethod("server")
        .invoke(SparkConnectService)
      val p = srv.getClass.getMethod("getPort").invoke(srv)
        .asInstanceOf[java.lang.Integer].intValue()
      boundPort = Some(p)
      Services.note("spark-connect", p)
      p
    }
  }

  /** Bound port of the running endpoint, if any. */
  def port: Option[Int] = boundPort

  def stop(): Unit = synchronized {
    if (boundPort.nonEmpty) {
      Services.clear("spark-connect")
      SparkConnectService.stop(None, None)
      boundPort = None
    }
  }
}
