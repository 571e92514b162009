ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projetetlarienspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Live-service specs (PostgresLiveSpec/KafkaLiveSpec) need a JDBC/client
// driver that is deliberately NOT a dependency (zero-egress build, and
// the engine itself never links it — Sinks speak plain JDBC). Deploy-day
// recipe (LIVE.md): point this at a driver jar on disk; unset, it's a
// no-op and the specs cancel as before.
Test / unmanagedClasspath ++=
  sys.env.get("SPARK_GRAFT_PG_DRIVER").map(p => Attributed.blank(file(p))).toSeq
// Forked run output normally routes through sbt's logger, which prefixes
// every line with "[info] " — that prefix is why the bench harness's
// tail-parser never found a clean JSON line (r6-r9 "parsed": null: the
// tail literally contains `[info] {"metric":...}`). StdoutOutput pipes
// the child's stdout/stderr through unmodified.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and the "[success] Total time" banner otherwise prints AFTER the
// bench summary, so the summary wouldn't be stdout's final line.
showSuccess := false
// showSuccess is read by sbt's command layer, not a task — exclude it
// from the unused-key lint so every run doesn't print a [warn] block
Global / excludeLintKeys += showSuccess
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
