package graft

import org.apache.spark.sql.SparkSession

/** Pin-sweep helper: prints `query<TAB>planned-shuffle-count` for every
  * SparkEntry query (the same full-tree count PlanAuditSpec gates on) so
  * new exchange pins can be written from measured plans instead of
  * guesses. Plans only — nothing executes except queries whose builders
  * run jobs at construction (the checkpointed iterative family). */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def n(plan: String, re: String) = re.r.findAllIn(plan).size
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val out = try {
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        val shuffles = n(plan, "Exchange ") - n(plan, "BroadcastExchange ") -
          n(plan, "ReusedExchange ")
        val bnlj = n(plan, "BroadcastNestedLoopJoin") + n(plan, "CartesianProduct")
        s"$name\t$shuffles\t$bnlj"
      } catch { case e: Throwable => s"$name\tERR\t${e.getClass.getSimpleName}" }
      println(out)
    }
    spark.stop()
  }
}
