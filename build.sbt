ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mcpvectordbspark"
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
// Forked runMain output goes RAW to stdout/stderr, not through sbt's
// logger: the logger prefixes every line with "[info] ", which defeats
// any consumer parsing Bench's final JSON summary line from the stdout
// tail (every BENCH_r*.json through round 15 recorded parsed:null for
// exactly this reason).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Pin the collector so bench cold times (GC-sensitive: one-time
  // codegen + index builds allocate heavily) are comparable across
  // boxes/JDK builds; Bench records the effective flags in its JSON.
  "-XX:+UseG1GC",
  // 196 queries x whole-stage codegen (plus the two quantized-forward
  // transformer queries' very large generated classes) overflow the
  // JDK-17 default 240 MB code cache late in a full two-pass bench on
  // a slow/loaded box (more methods cross the JIT thresholds there):
  // once full, the sweeper flushes hot compiled stages and the round-16
  // driver measured identical plans at cpu x4-6 with warm jit_ms x3-4
  // (dedup_minhash_incremental / docsim_incremental / docsim_topk).
  // 1 GiB of reserved (not committed) address space removes the cliff;
  // env-overridable like the heap.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
