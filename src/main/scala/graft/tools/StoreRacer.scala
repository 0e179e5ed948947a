package graft.tools

import org.apache.spark.sql.SparkSession

/** Durable-store arbitration racer — one PROCESS in the two-coordinator
  * contention tier (DurableStoreSpec's scale test spawns this as a real
  * second JVM via scripts/run-main.sh): hammers [[graft.catalog.GraftStore]]
  * `saveOrThrow` on a shared store dir, reloading on every conflict, and
  * reports wins/conflicts as one parseable stdout line.
  *
  * The invariant the spec derives from the reports: every SUCCESSFUL save
  * takes exactly one fresh generation (the claim-file CAS — reference
  * `services/datastore`'s serialization guarantee, here under a true
  * process boundary, not a same-JVM lock), so
  * winsA + winsB == final generation + 1. A lost claim never mutates the
  * store and surfaces as ConcurrentModificationException.
  */
object StoreRacer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: StoreRacer <storeDir> <section> <rounds> <writerId>")
    val Array(storeDir, section, roundsS, writerId) = args.take(4)
    val rounds = roundsS.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName(s"store-racer-$writerId")
      .config("spark.ui.enabled", "false")
      .config(graft.catalog.GraftStore.DirConf, storeDir)
      .getOrCreate()
    val st = graft.catalog.GraftStore
    st.load(spark, section) // observe whatever generation exists at start
    var wins = 0
    var conflicts = 0
    var i = 0
    while (i < rounds) {
      val root = st.newObject
      root.put("writer", writerId)
      root.put("round", i)
      try { st.saveOrThrow(spark, section, root); wins += 1 }
      catch {
        case _: java.util.ConcurrentModificationException =>
          conflicts += 1
          st.load(spark, section) // resync to the foreign generation
      }
      i += 1
    }
    println(s"RACER $writerId wins=$wins conflicts=$conflicts")
    spark.stop()
  }
}
