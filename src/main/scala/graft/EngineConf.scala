package graft

import org.apache.spark.sql.SparkSession

/** Engine-wide performance knobs shared by every session builder
  * (Bench, Verify, the REST server, the dev harnesses) so a
  * measurement taken in one harness describes the others.
  *
  * Round-15 measurement (optimization guide §1: measure first, §1.2:
  * config is the LAST lever): byte-based AQE partition coalescing
  * (`parallelismFirst=false`, advisory 64m, cached-plan AQE on) cut
  * task counts 3-4x on the iterative graph operators (s47 2440→832
  * tasks) but made min-of-5 walls WORSE or flat across the suite
  * (d38 2.69→6.36 s, d39 4.28→8.16 s, s47 3.91→4.90 s, m27
  * 2.74→2.91 s): at local bench scale the wall is per-JOB scheduling
  * overhead, not per-task dispatch, and collapsing small exchanges to
  * one partition serializes the CPU inside each stage. The defaults
  * below therefore stay STOCK — the knobs exist so a production
  * deployment (where 100 MB-1 GB post-shuffle partitions are the §2.2
  * target) can turn byte-based sizing on without a rebuild, and so
  * the A/B above stays reproducible.
  *
  *   SPARK_GRAFT_COALESCE_PARALLELISM_FIRST — "false" activates
  *     byte-based AQE partition sizing (Spark default "true").
  *   SPARK_GRAFT_ADVISORY_PARTITION_BYTES — AQE's target post-shuffle
  *     partition size (Spark default 64m; guide §9 suggests 256m for
  *     batch ETL at scale).
  *   SPARK_GRAFT_CACHED_PLAN_AQE — "true" lets AQE re-plan inside
  *     cached plans (Spark default "false"); required for the two
  *     knobs above to reach the iterative operators, which cache
  *     every loop frame.
  */
object EngineConf {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_COALESCE_PARALLELISM_FIRST", "true"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"))
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_CACHED_PLAN_AQE", "false"))
}
