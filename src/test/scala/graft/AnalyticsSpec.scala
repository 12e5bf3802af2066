package graft

import graft.operators.{Analytics, TextRank}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("retention: offset-0 diagonal equals cohort sizes, cells never exceed it") {
    val cells = Analytics.eventsRetention(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(cells.nonEmpty)
    assert(cells.forall(_._2 >= 0)) // offsets never precede the cohort day
    val day0 = cells.filter(_._2 == 0L).map(c => c._1 -> c._3).toMap
    // every user is active on their own first day, so offset 0 exists for
    // every cohort and upper-bounds all later cells of that cohort
    for ((cohort, _, n) <- cells) {
      assert(day0.contains(cohort), s"cohort $cohort missing its day-0 cell")
      assert(n <= day0(cohort), s"cohort $cohort cell exceeds cohort size")
    }
    // diagonal total = distinct users
    val users = operators.DomainQueries.events(spark, sf)
      .select("user_id").distinct().count()
    assert(day0.values.sum === users)
  }

  test("top paths: dense rank, descending counts, recount of winner matches") {
    val rows = Analytics.eventsTopPaths(spark, sf)
      .orderBy("rn").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.map(_._3).toSeq === (1L to rows.length.toLong))
    assert(rows.map(_._2).toSeq.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    // independent recount of the winning path over raw events
    val (path, n, _) = rows.head
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "event_id")
    val recount = operators.DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .withColumn("e3", lead("event_type", 2).over(w))
      .withColumn("p", concat_ws(">", col("event_type"),
        lead("event_type", 1).over(w), col("e3")))
      .filter(col("e3").isNotNull && col("p") === path)
    assert(recount.count() === n)
  }

  test("shingle containment: pasted doc scores 1.0 against its container") {
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, small),                    // 6 distinct 5-grams
      (2L, s"$filler $small $filler2"), // contains every gram of doc 1
      (3L, (100 to 160).map(i => s"z$i").mkString(" ")) // disjoint
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("containment").toString
    docs.write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    val got = TextRank.dedupShingleContainment(spark, tmp)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (ds, db, _, c) = got.head
    assert(ds === 1L && db === 2L && c === 1.0)
  }
  private val filler2 = (61 to 99).map(i => s"y$i").mkString(" ")

  test("random projection: hand-computed dot for one vector matches") {
    val out = Analytics.simRandomProjection(spark, sf)
    val row = out.filter(col("vec_id") === 7).collect().head
    val emb = Tables.t(spark, sf, "embeddings").filter(col("vec_id") === 7)
      .select("embedding").as[Array[Float]].head()
    assert(emb.length === 64)
    for (p <- 0 until 8) {
      val expected = emb.zipWithIndex.map { case (x, j) =>
        math.floor(x.toDouble * 1048576).toLong * ((p * 73 + j * 37) % 17 - 8)
      }.sum.toDouble / 1048576.0
      assert(row.getDouble(1 + p) === expected, s"p$p mismatch")
    }
    assert(out.count() === Tables.t(spark, sf, "embeddings").count())
  }
}
