package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness for bench-drift triage: run named SparkEntry queries
  * N times in isolation (fresh actions, cleared cache between reps)
  * and print per-rep wall times — separates real plan cost from the
  * run-to-run contention the full bench suite can add. Not part of
  * the driver contract.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DriftProfile t05_chunking t13_decontaminate_filter"
  */
object DriftProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q43_window_frames_ranks", "t05_chunking",
        "t13_decontaminate_filter")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      // warm (scan caches, codegen)
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val times = (1 to 5).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[drift] $n%-28s min=${times.min}%.3f " +
        f"median=${times.sorted.apply(2)}%.3f max=${times.max}%.3f " +
        times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
