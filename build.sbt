ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awsmedallionetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // JDBC warehouse used as the publish-leg stand-in (the reference ships
  // gold to Redshift Serverless); present in the offline cache.
  "org.duckdb" % "duckdb_jdbc" % "1.0.0",
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
  // JVM default tz too: java.sql.Timestamp.valueOf-style literals are
  // interpreted in the JVM zone — must agree with the session zone.
  "-Duser.timezone=UTC",
  // Pin the heap explicitly: an inherited too-small heap turns the
  // 1M-shingle similarity stages into GC thrash (round-3 bench anomaly
  // suspect). 16g is sized for the sf0.1 heavy tail on a 128 GiB host;
  // override via SPARK_DRIVER_MEM for constrained machines.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Deterministic collector choice — the anomaly class we are chasing is
  // "same code, 14x slower"; removing ergonomics-picked GC variance makes
  // per-query gc_ms in BENCH_FULL.json comparable across hosts.
  "-XX:+UseG1GC",
  // A 159-query suite generates thousands of Janino classes; the JVM
  // default 240m code cache fills, the sweeper starts evicting compiled
  // methods, and a hot kernel silently reverts to the bytecode
  // interpreter (the round-5 driver bench showed 25x cpu inflation on
  // identical code). 512m keeps the whole suite's generated code resident.
  "-XX:ReservedCodeCacheSize=512m",
)
