ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ukprocurementdatapipelinespark"
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
  // 32 local executor threads share this heap; 8g showed GC-bound
  // run-to-run swings (q35: 9-20s) on the wide-row construct+parse
  // queries, 24g is stable on the 128 GiB test box
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ~125 registered queries x codegen classes: ONE compiled generation
  // is ~126 MiB of native code, which fits the default 240m cache —
  // but only since spark.sql.codegen.cache.maxEntries was raised to
  // cover the registry's ~1,600 distinct generated classes (Bench.scala
  // has the full story; at the default 100-entry cache every pass
  // recompiled everything and overflowed any cache size). 896m is
  // headroom, not a requirement: validate with
  //   SPARK_GRAFT_CODECACHE=240m sbt -batch "runMain graft.Bench"
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "896m")}",
)
