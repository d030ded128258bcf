ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rphoneticspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS")
  .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)

// `sbt oracleCheck`: dump every SparkEntry query at sf0.001 and compare
// against its DuckDB oracle (tools/compare_oracles.py emulates the
// driver's CORRECTNESS gate) — catches query/oracle drift at build time
// instead of driver time. Fails the task on any row/schema/hash mismatch.
lazy val oracleCheck = taskKey[Unit](
  "Verify at sf0.001 + DuckDB oracle comparison (driver-gate emulation)")
oracleCheck := Def.sequential(
  (Compile / runMain).toTask(
    " graft.Verify /root/testdata/sf0.001 target/oracle_check"),
  Def.task {
    import scala.sys.process._
    val ec = Process(
      Seq("python3", "tools/compare_oracles.py",
        "target/oracle_check", "/root/testdata/sf0.001"),
      baseDirectory.value).!
    if (ec != 0) sys.error(s"oracle comparison FAILED (exit $ec)")
  }
).value
