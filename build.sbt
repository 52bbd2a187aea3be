ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "musifspark"
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
// Forked `runMain` output must reach stdout RAW: sbt's default logged
// strategy prefixes every line with `[info] `, which breaks the driver's
// one-JSON-line-on-stdout bench/verify contract (r1+r2 bench artifacts
// landed `parsed: null` with the JSON visible but prefixed in the tail).
outputStrategy := Some(StdoutOutput)
// …and sbt's own trailing "[success] Total time: …" line must not land
// AFTER the bench's final JSON line inside the driver's 2000-char output
// tail (r3: it did, and cost the tail window ~75 bytes).
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
  // 24g default (box has 128GiB): the scaling campaign's high-core sides
  // (local[32], 192 in-flight sort partitions) were GC-bound at 8g — max
  // heap is uncommitted until used, so tests are unaffected.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // r7 (measured, the single largest suite-level lever): Spark frees
  // broadcast vars, checkpoint blocks and codegen classloaders through
  // the GC-driven ContextCleaner — and with a 24g heap + UI off, a long
  // many-query run may not GC for MINUTES, so dead blocks and Janino
  // classes pile up in the block manager and metaspace until identical
  // queries run 5-10x slower late in the suite (q_simhash 10.7s vs 1.2s
  // in a fresh JVM). spark.cleaner.periodicGC.interval defaults to 30min;
  // at 60s the cleaner keeps up and a full 122-query sweep measured
  // 211.5s -> 144.7s (same code, same data, one JVM). MetaspaceSize lifts
  // the first GC-triggering metaspace watermark (default 21MB) above the
  // steady-state codegen footprint so class-space growth stops triggering
  // extra collections. Scale-neutral JVM hygiene: production drivers/
  // executors size these per deployment; nothing here depends on the
  // local core count or fixture size.
  "-XX:MetaspaceSize=1g",
  // 120s, not 60s: the cleaner lag stays inside the fast regime (the
  // unfixed probe only degraded after ~2-3 minutes of accumulation)
  // while halving how often a collection can land inside a timed query.
  "-Dspark.cleaner.periodicGC.interval=120s",
)
