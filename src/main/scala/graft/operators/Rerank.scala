package graft.operators

import graft.functions.TopKByScore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared top-k rerank for the similarity-search family.
  *
  * Takes scored candidates (qid, vec_id, dot) and keeps the k best per
  * query as (qid, vec_id, dot, rank) — semantics identical to
  * `ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) <= k`,
  * but planned as an ObjectHashAggregate over [[TopKByScore]]'s k-bounded
  * buffers: partials combine map-side and only O(k) rows per query ever
  * shuffle, where the window variant moves every candidate of a query
  * into a single task (a skew point at 10⁵+ queries × large clusters).
  */
object Rerank {

  def topK(cands: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKByScore(k))
    cands.groupBy("qid")
      .agg(topk(col("vec_id"), col("dot")).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col._1").as("vec_id"), col("col._2").as("dot"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
