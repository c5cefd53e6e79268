package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness: time labeled sub-plans of a query at a
  * given SF dir. Not part of the driver contract.
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
    // warm
    docs.count()

    val docSets = graft.ops.ScaleOps.fanOut(docs)
      .select(col("doc_id").as("id"),
        graft.functions.ShingleHashes(col("text"), 3).as("sh_arr"))
      .where(size(col("sh_arr")) > 0)
    time("shingle sets (count)")(docSets.write.format("noop").mode("overwrite").save())
    val cached = docSets.cache()
    time("cache materialize")(cached.count())
    val sig = graft.pipeline.Dedup.minHashSignatures(cached, 64)
    time("minhash sigs")(sig.write.format("noop").mode("overwrite").save())
    val bands = 16; val rowsPerBand = 4
    val bandCols = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bh"))
    }
    val buckets = sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    time("buckets")(buckets.write.format("noop").mode("overwrite").save())
    val sized = buckets.withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .where(col("bucket_n") <= lit(1000))
    time("bucket cap window")(sized.write.format("noop").mode("overwrite").save())
    val l = sized.select(col("band"), col("bh"), col("id").as("id_a"))
    val r = sized.select(col("band"), col("bh"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates")(candidates.write.format("noop").mode("overwrite").save())
    // d02 stage profile
    import org.apache.spark.sql.functions.{collect_list => clist}
    val ds2 = graft.ops.ScaleOps.fanOut(docs).select(col("doc_id").as("id"),
      graft.functions.ShingleHashes(col("text"), 3).as("sh_arr")).cache()
    time("d02 docSets cache")(ds2.count())
    val post2 = ds2.select(explode(col("sh_arr")).as("shingle"), col("id"))
      .groupBy(col("shingle")).agg(clist(col("id")).as("ids"))
      .where(size(col("ids")) >= 2)
    time("d02 postings")(post2.write.format("noop").mode("overwrite").save())
    val inter2 = post2.select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    time("d02 pair counts")(inter2.write.format("noop").mode("overwrite").save())
    time("d02 full")(graft.pipeline.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.3,
        maxPostings = None) // profile the same exact plan the d02 bench runs
      .write.format("noop").mode("overwrite").save())
    ds2.unpersist()
    val full = graft.pipeline.Dedup.minHashLsh(docs, "text", "doc_id",
      3, 16, 4, 0.3)
    time("full minHashLsh")(full.write.format("noop").mode("overwrite").save())
    time("full again")(graft.pipeline.Dedup.minHashLsh(docs, "text", "doc_id",
      3, 16, 4, 0.3).write.format("noop").mode("overwrite").save())
    cached.unpersist()
    spark.stop()
  }
}
