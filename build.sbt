ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nycgovernmenthiringauditdataplatformspark"
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
// The bench driver parses a JSON line from the tail of `sbt runMain`
// stdout. Two sbt behaviors have defeated that parse every round so
// far (BENCH_r*.json `parsed: null`): the logger prefixes forked-run
// output with "[info] ", and sbt appends "[success] Total time …"
// AFTER our final line. StdoutOutput passes the forked JVM's stdout
// through verbatim, and showSuccess drops the epilogue — so the last
// stdout line of a bench invocation is the raw JSON itself.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
// Scale-canary suite (graft.Slow tag, ~2-4 min) is excluded from plain
// `sbt test`; run it with `sbt -Dgraft.slow=1 slowTest`. The exclusion
// is conditional on the sysprop because ScalaTest treats a tag in both
// -n and -l as excluded — re-including via args alone cannot work.
Test / testOptions ++= (
  if (sys.props.contains("graft.slow")) Nil
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Slow")))
addCommandAlias("slowTest", "Test/testOnly graft.tools.ScaleCanarySpec")
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
  // 32 local executor threads shuffle and cache in one JVM; the box has
  // 128 GiB, so give the forked run/test JVMs real headroom (override
  // with SPARK_DRIVER_MEM)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
