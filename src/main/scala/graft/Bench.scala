package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize every output column: .count() alone would let Catalyst
    // prune the computed projections out of the measured plan.
    def run(name: String): Long =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Untimed warm-up pass: JIT, codegen caches, parquet footers, file
    // listing — so the timed pass measures steady-state query time.
    names.foreach { n => try run(n) catch { case _: Throwable => } }

    // Min of two timed runs: steady-state time, robust to JIT/GC noise.
    // A throwing query reports -1 (NOT its short failure wall time): a
    // fast-failing regression must read as an error, never as a speedup.
    val results = names.map { name =>
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(name); true } catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      name -> (if (timed.forall(_._2)) timed.map(_._1).min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
