package graft

import graft.operators.TextPrep
import org.apache.spark.sql.functions._

class TextPrepSpec extends SparkSpec {
  import spark.implicits._

  test("sequence packing: budget respected, every doc exactly once, stable") {
    val packed = TextPrep.dataPackSequences(spark, sf)
      .as[(Long, Long, Long, Long)].collect()

    // every document appears exactly once
    val docs = Tables.t(spark, sf, "documents").select("doc_id").as[Long].collect()
    assert(packed.map(_._2).sorted.toSeq === docs.sorted.toSeq)

    // no example exceeds the budget unless it is a single oversized doc
    val byExample = packed.groupBy(r => (r._1, r._4))
    for (((b, ex), rows) <- byExample) {
      val total = rows.map(_._3).sum
      assert(total <= TextPrep.PACK_BUDGET || rows.length == 1,
        s"bucket $b example $ex: $total tokens across ${rows.length} docs")
    }

    // greedy tightness: an example (other than the last of its bucket)
    // could not have absorbed the next example's first doc
    for ((b, rows) <- packed.groupBy(_._1)) {
      val exs = rows.groupBy(_._4).toSeq.sortBy(_._1)
      for (Seq((_, cur), (_, nxt)) <- exs.sliding(2)) {
        val curTotal = cur.map(_._3).sum
        val nextFirst = nxt.minBy(_._2)._3
        assert(curTotal + nextFirst > TextPrep.PACK_BUDGET,
          s"bucket $b: example could still fit the next doc (not greedy)")
      }
    }

    // deterministic under re-execution
    val again = TextPrep.dataPackSequences(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._2).toSeq === packed.sortBy(_._2).toSeq)
  }

  test("text_rarity: exact-duplicate docs share tokens, hapax drops to zero") {
    val docs = Seq(
      (1L, "aardvark zyzzyva qoph xylem"), // all hapax vs doc 3's words
      (2L, "aardvark zyzzyva qoph xylem"), // duplicate of 1 → nothing hapax
      (3L, "unique singleton words here")).toDF("doc_id", "text")
    // route through a temp dir-less path: call the internals directly
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val scored = toks.join(freq, Seq("w")).groupBy("doc_id")
      .agg((sum(when(col("c") === 1, 1L).otherwise(0L)).cast("double") / count(lit(1)))
        .as("hapax_frac"))
      .as[(Long, Double)].collect().toMap
    assert(scored(1L) === 0.0) // every token also in doc 2
    assert(scored(2L) === 0.0)
    assert(scored(3L) === 1.0) // every token unique to doc 3
  }
}
