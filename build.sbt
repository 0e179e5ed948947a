ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dremioossspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The Spark Connect JVM client ships in the distro's connect-repl dir (not
// the main jar dir, so the default unmanagedBase scan misses it). Test-only:
// the Connect endpoint loopback spec drives the server through the real
// client. Its grpc/netty are shaded (org.sparkproject.io.*) — no conflicts.
Test / unmanagedJars +=
  Attributed.blank(file("/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar"))
Test / fork := true
run / fork := true
// Driver contract: the bench/verify mains must end stdout with ONE raw JSON
// line. StdoutOutput passes the forked JVM's stdout/stderr straight through
// (no "[info] "/"[error] " prefixes), and showSuccess drops sbt's trailing
// "[success] Total time…" line that otherwise follows the JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Opt-in scale-stress tier: `sbt -Dgraft.scale=1 "testOnly *ScaleStressSpec"`
// forwards the flag into the forked test JVM (ScaleStressSpec gates on it).
Test / javaOptions ++= sys.props.get("graft.scale").map(v => s"-Dgraft.scale=$v").toSeq
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
