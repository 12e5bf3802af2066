package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Stats-hygienic localCheckpoint for iterative DataFrame loops.
  *
  * `Dataset.localCheckpoint` truncates LINEAGE but deliberately carries
  * the origin plan's `Statistics` onto the resulting [[LogicalRDD]] leaf
  * (so one checkpoint doesn't blind the optimizer). In an open-ended
  * loop (connected components, Borůvka) whose per-round plan JOINS the
  * previous round's checkpoint — possibly several times — the carried
  * sizeInBytes estimates compound MULTIPLICATIVELY round over round
  * (Catalyst's join estimate is the product of the child sizes), and
  * when a round multiplies the carried stat into itself more than once
  * the digit count grows GEOMETRICALLY: after Borůvka's ~14 contraction
  * rounds the estimate is a BigInt with ~10^6 digits and
  * SizeInBytesOnlyStatsPlanVisitor spends MINUTES per plan inside
  * BigInteger.multiplyToomCook3 — a planning-time hang on a 16k-node
  * graph, caught by ScaleSpec's Borůvka probe (r9). Fixed round counts
  * (pagerank) and single-join rounds (min-label CC) only grow digits
  * LINEARLY, which is why the sf-gate suite never tripped this.
  *
  * The fix: re-wrap the checkpoint leaf with the same RDD /
  * partitioning / ordering / constraints but sizeInBytes (and rowCount)
  * CAPPED at Long.MaxValue. Real stats small enough to matter (the
  * early-round broadcast decisions) pass through untouched; the cap
  * re-applies at every checkpoint, so a product can never escape one
  * round's plan. Lives in package org.apache.spark.sql because
  * `Dataset.ofRows` is private[sql]; everything touched is public Spark
  * surface otherwise. */
object GraftStatsCheckpoint {
  private val Cap = BigInt(Long.MaxValue)

  /** localCheckpoint that RE-STAMPS a hash partitioning the materialized
    * RDD is known to have. Under AQE, `Dataset.localCheckpoint` records
    * `UnknownPartitioning` on the LogicalRDD leaf (the adaptive plan's
    * outputPartitioning is opaque at capture time), so a checkpoint built
    * as `repartition(n, k)` + key-preserving operators loses its layout:
    * every downstream join/aggregate on k re-exchanges, and because the
    * re-exchange of a small checkpoint is tiny, AQE coalesces it to ONE
    * task — serializing any fan-out consumer (the occ_nestedness r²
    * self-join ran its 7M-row pair enumeration single-task). Caller
    * CONTRACT: `df`'s rows must actually be laid out as
    * HashPartitioning(cols, n) — i.e. the plan is `repartition(n, cols)`
    * followed only by partitioning-preserving operators. Stats are capped
    * exactly as [[localCheckpointCapped]]. */
  def localCheckpointHashPartitioned(df: DataFrame, cols: Seq[String],
      numParts: Int): DataFrame = {
    val ck = df.localCheckpoint()
    // Runtime guard on the caller contract (r15, verdict item): the
    // materialized RDD must actually have numParts partitions — a future
    // edit inserting a width-changing operator between the repartition
    // and the stamp would otherwise silently yield a WRONG
    // hash-partitioning claim, letting downstream joins skip a required
    // exchange (incorrect rows at any scale). The partition COUNT is the
    // cheap observable that catches that rot class; asserting it here
    // costs nothing (the RDD is already materialized).
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val actual = lr.rdd.getNumPartitions
        if (actual != numParts)
          throw new IllegalStateException(
            s"localCheckpointHashPartitioned: caller claimed " +
              s"HashPartitioning(${cols.mkString(",")}, $numParts) but " +
              s"the materialized checkpoint has $actual partitions — a " +
              "width-changing operator sits between the repartition and " +
              "the stamp; fix the caller")
        val attrs = cols.map(c => lr.output.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"localCheckpointHashPartitioned: no column '$c' in ${lr.output}")))
        val part = org.apache.spark.sql.catalyst.plans.physical
          .HashPartitioning(attrs, numParts)
        val st = lr.computeStats()
        val capped = Statistics(
          sizeInBytes = st.sizeInBytes.min(Cap),
          rowCount = st.rowCount.map(_.min(Cap)))
        val spark = ck.sparkSession.asInstanceOf[CSparkSession]
        CDataset.ofRows(spark,
          new LogicalRDD(lr.output, lr.rdd, part,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            spark, Some(capped), Some(lr.constraints)))
      case _ => ck
    }
  }

  def localCheckpointCapped(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint() // eager: materialize exactly once
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val st = lr.computeStats()
        if (st.sizeInBytes <= Cap && st.rowCount.forall(_ <= Cap)) ck
        else {
          val capped = Statistics(
            sizeInBytes = st.sizeInBytes.min(Cap),
            rowCount = st.rowCount.map(_.min(Cap)))
          val spark = ck.sparkSession.asInstanceOf[CSparkSession]
          CDataset.ofRows(spark,
            new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
              lr.outputOrdering, lr.isStreaming, lr.stream)(
              spark, Some(capped), Some(lr.constraints)))
        }
      case _ => ck // non-LogicalRDD leaf: nothing carried, nothing to cap
    }
  }
}
