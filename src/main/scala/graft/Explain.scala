package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: `runMain graft.Explain [query ...]` prints the
  * formatted physical plan for each named query (default: a representative
  * set) against sf0.01 — used to audit pushdown, pruning, join strategy
  * and exchange counts (SURVEY.md §5).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q03_join_agg", "occ_clean_pipeline",
        "dedup_ngram_jaccard", "sim_cosine_topk", "events_tumbling",
        "events_asof", "events_interval_join", "text_bm25_topk",
        "dedup_minhash_lsh", "graph_triangles", "sim_rp_topk",
        "occ_outlier_mad", "data_shuffle_shards")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
