package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
      .config("spark.sql.files.maxPartitionBytes", "1m")
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

    import org.apache.spark.sql.expressions.Window
    val docs = Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    def shingleAgg(parts: Int, md5On: Boolean): DataFrame = {
      val base = docs.repartition(parts, col("doc_id"))
        .select(col("doc_id"),
          posexplode(operators.Shingles.tokens(col("text"))).as(Seq("pos", "w")))
        .select(col("doc_id"),
          concat(col("w"), lit("_"), lead("w", 1).over(w), lit("_"),
            lead("w", 2).over(w)).as("sh"))
        .filter(col("sh").isNotNull)
      val hashed = if (md5On)
        base.withColumn("h", expr(
          "cast(conv(substring(md5(cast(sh as binary)), 1, 15), 16, 10) as bigint)"))
      else base.withColumn("h", length(col("sh")).cast("long"))
      hashed.groupBy("doc_id").agg(min(col("h")).as("m"))
    }
    time("shingle_md5_p32")(shingleAgg(32, md5On = true))
    time("shingle_md5_p16")(shingleAgg(16, md5On = true))
    time("shingle_md5_p8")(shingleAgg(8, md5On = true))
    time("shingle_md5_p6")(shingleAgg(6, md5On = true))
    time("shingle_md5_p4")(shingleAgg(4, md5On = true))
    time("shingle_md5_p2")(shingleAgg(2, md5On = true))
    time("shingle_md5_p1")(shingleAgg(1, md5On = true))
    time("shingle_nomd5_p32")(shingleAgg(32, md5On = false))
    time("shingle_nomd5_p1")(shingleAgg(1, md5On = false))
    // tokenizer only
    time("tok_only_p32") {
      docs.repartition(32, col("doc_id"))
        .select(col("doc_id"),
          posexplode(operators.Shingles.tokens(col("text"))).as(Seq("pos", "w")))
        .groupBy("doc_id").agg(count(lit(1)))
    }
    time("tok_only_p1") {
      docs.repartition(1, col("doc_id"))
        .select(col("doc_id"),
          posexplode(operators.Shingles.tokens(col("text"))).as(Seq("pos", "w")))
        .groupBy("doc_id").agg(count(lit(1)))
    }
    time("bipartite_aqe_on") { operators.Graphs.graphBipartiteComponents(spark, sfDir) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("bipartite_aqe_off") { operators.Graphs.graphBipartiteComponents(spark, sfDir) }
    time("pagerank_aqe_off") { operators.Graphs.queries("graph_pagerank")(spark, sfDir) }
    time("kcore_aqe_off") { operators.Graphs.queries("graph_kcore")(spark, sfDir) }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("pagerank_aqe_on") { operators.Graphs.queries("graph_pagerank")(spark, sfDir) }
    time("kcore_aqe_on") { operators.Graphs.queries("graph_kcore")(spark, sfDir) }
    // driver-side cost of a fresh read.parquet per reference (listing +
    // footer/schema inference) vs reusing one relation
    val t0 = System.nanoTime()
    (1 to 50).foreach { _ =>
      spark.read.parquet(s"$sfDir/lineitem.parquet").queryExecution.analyzed
    }
    println(f"PROBE fresh_read_parquet_x50      ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val rel = Tables.t(spark, sfDir, "lineitem")
    val t1 = System.nanoTime()
    (1 to 50).foreach { _ => rel.select(col("l_orderkey")).queryExecution.analyzed }
    println(f"PROBE reused_relation_x50         ${(System.nanoTime() - t1) / 1e9}%.3f s")
    val t2 = System.nanoTime()
    (1 to 20).foreach { _ =>
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(count(lit(1))).queryExecution.toRdd.count()
    }
    println(f"PROBE fresh_count_x20             ${(System.nanoTime() - t2) / 1e9}%.3f s")
    val t3 = System.nanoTime()
    (1 to 20).foreach { _ => rel.agg(count(lit(1))).queryExecution.toRdd.count() }
    println(f"PROBE reused_count_x20            ${(System.nanoTime() - t3) / 1e9}%.3f s")
    spark.stop()
  }
}
