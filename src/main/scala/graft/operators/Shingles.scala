package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-trigram shingling shared by the near-dup operators.
  *
  * Formulated as posexplode → window `lead` instead of a higher-order
  * `transform` lambda: HOFs evaluate on the interpreted path, while the
  * window + concat stay inside whole-stage codegen (measured ~4× faster at
  * sf0.1). The window partitions by doc_id, so a following
  * groupBy(doc_id) reuses the partitioning without another shuffle.
  */
object Shingles {

  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** (doc_id, sh) rows; trigrams at the tail are dropped via concat's
    * null propagation (concat_ws would silently shorten them instead).
    * Set `dedup` when downstream needs shingle *sets* (Jaccard sizes);
    * min-aggregations (MinHash) can skip it — duplicates don't move a min.
    */
  def trigramRows(docs: DataFrame, dedup: Boolean): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // r14: explicit-width doc_id repartition BEFORE the explode. The
    // window's own ENSURE_REQUIREMENTS exchange is tiny at bench scale,
    // so AQE coalesced it to ONE partition and every downstream
    // tokenize + md5 + partial-agg stage in every shingle consumer ran
    // single-task (guide §2.5: a single-split input file starves the
    // whole pipeline — repartition right after the read). hash(doc_id)
    // satisfies the window clustering, so this REPLACES that exchange
    // (and ships raw text once instead of exploded token rows).
    val par = graft.Ckpt.textPar(docs) // volume-aware floor: cores/4 beats 32 AND 1 locally (probed)
    val rows = docs
      .repartition(par, col("doc_id"))
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"),
        concat(col("w"), lit("_"), lead("w", 1).over(w), lit("_"), lead("w", 2).over(w)).as("sh"))
      .filter(col("sh").isNotNull)
    if (dedup) rows.dropDuplicates("doc_id", "sh") else rows
  }
}
