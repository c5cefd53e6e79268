ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusionserverspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // embedded DB for the real-JDBC federation spec (resolves from the
  // offline cache; test-only — the library itself has no hard
  // dependency on any JDBC driver)
  "org.duckdb" % "duckdb_jdbc" % "1.0.0" % Test,
)
Test / fork := true
run / fork := true
// Arrow Flight endpoint (SURVEY §2.A9/A22): flight-core + its gRPC
// closure is NOT resolvable in this zero-egress build (see
// FLIGHT_BLOCKER.md for the reproducible failure), so the
// implementation compiles only when explicitly enabled on a machine
// that has the jars: sbt -Dgraft.flight=true [-Dgraft.flight.jars=dir]
Compile / unmanagedSourceDirectories ++= {
  if (sys.props.get("graft.flight").contains("true"))
    Seq(baseDirectory.value / "src" / "flight" / "scala")
  else Seq.empty
}
Compile / unmanagedJars ++= {
  sys.props.get("graft.flight.jars")
    .map(dir => (file(dir) ** "*.jar").classpath)
    .getOrElse(Seq.empty)
}
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
  // batch-throughput GC: G1's concurrent cycles add multi-second
  // pauses/variance to the 32-thread local bench; Parallel GC trades
  // latency (irrelevant here) for throughput and stable timings
  "-XX:+UseParallelGC",
)
// Two CONCURRENT forked test JVMs: the generative/replay block (the
// @Slow suites — oracle replays on generated corpora, differential
// fuzz, lifecycle fuzz; ~9 min) runs BESIDE the per-operator block
// (~7 min) instead of after it, so the full gate's wall is the max of
// the halves, not the sum — same tests, same coverage, same
// within-group co-residency as the single-JVM gate. Safe to run
// concurrently: every shared resource in the slow block is
// unique-per-instance (createTempDirectory spools/checkpoints,
// in-memory DuckDB), and the port-binding / warehouse-writing suites
// all stay in the fast group together, exactly as before. Suites
// still run sequentially WITHIN each JVM (no testForkedParallel) —
// the shared-SparkSession semantics are unchanged.
Test / testGrouping := {
  val slow = Set("graft.GeneratedCorpusSpec", "graft.DifferentialFuzzSpec",
    "graft.ProcessorFuzzSpec", "graft.IndexLifecycleFuzzSpec",
    "graft.DedupCacheLifecycleSpec", "graft.Round10CrossEngineFuzzSpec")
  // round-20 rebalance: the fast block outgrew the slow one (the
  // per-operator RoundNSpecs are ~half its wall of real Spark
  // actions), so the gate now runs THREE concurrent JVMs — slow
  // replay, the RoundNSpec block, and everything else. The RoundN
  // suites are pure-computation (SparkFixture + per-test temp dirs):
  // none binds a port or writes spark-warehouse, so the co-residency
  // rule below is preserved — port-binding / warehouse-writing suites
  // all remain together in the "fast" group.
  val opts = ForkOptions()
    .withWorkingDirectory(Option((Test / baseDirectory).value))
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val (s, rest) = (Test / definedTests).value.partition(t => slow(t.name))
  val (r, f) = rest.partition(t => t.name.matches("""graft\.Round\d+Spec"""))
  // the slow block is split THREE ways (round 21: six groups total —
  // 6 JVMs x local[4] on 32 cpus): GeneratedCorpusSpec alone (its
  // vector replay grew the write-back trajectories, 5:23 isolated),
  // DifferentialFuzzSpec alone (2:49 isolated — pairing it with
  // either neighbor re-created a >10-min pole under contention), and
  // the four fuzz/lifecycle suites (4:01 isolated) together
  val replayA = Set("graft.GeneratedCorpusSpec")
  val replayC = Set("graft.DifferentialFuzzSpec")
  val (sa, sRest) = s.partition(t => replayA(t.name))
  val (sc, sb) = sRest.partition(t => replayC(t.name))
  // the RoundNSpec block itself split in two (alternating by sorted
  // position — deterministic, stays balanced as suites are added):
  // measured round 20, the single round-ops JVM had become the
  // ~10-min pole
  val rSorted = r.sortBy(_.name)
  val (ra, rb) = rSorted.zipWithIndex.partition(_._2 % 2 == 0) match {
    case (a, b) => (a.map(_._1), b.map(_._1))
  }
  Seq(Tests.Group("slow-replay-a", sa, Tests.SubProcess(opts)),
    Tests.Group("slow-replay-b", sb, Tests.SubProcess(opts)),
    Tests.Group("slow-replay-c", sc, Tests.SubProcess(opts)),
    Tests.Group("round-ops-a", ra, Tests.SubProcess(opts)),
    Tests.Group("round-ops-b", rb, Tests.SubProcess(opts)),
    Tests.Group("fast", f, Tests.SubProcess(opts)))
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(9))
