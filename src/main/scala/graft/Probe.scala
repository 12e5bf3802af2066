package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc decomposition probe for single queries — NOT part of the driver
  * contract. `runMain graft.Probe` times labeled variants of a query in
  * one warmed session (same protocol as Bench: toRdd.count, min of two
  * timed runs after a warm-up) so a bench movement can be attributed to a
  * specific knob instead of guessed at. Findings land in the operator's
  * scaladoc (see ivfTopk for the r4 checkpoint/argmax decomposition). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val best = Seq(once(), once()).min
      println(f"PROBE $label%-28s ${best}%.3f s")
    }

    time("ivf_nprobe1") { operators.SketchQueries.ivfTopk(spark, sfDir, 1) }
    time("ivf_nprobe2") { operators.SketchQueries.ivfTopk(spark, sfDir, 2) }
    time("jaccard_pairs") { operators.TextQueries.dedupNgramJaccard(spark, sfDir) }
    time("cluster_full") { operators.Graphs.dedupCluster(spark, sfDir) }
    spark.stop()
  }
}
