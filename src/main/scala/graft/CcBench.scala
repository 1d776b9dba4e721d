package graft

import graft.core.Tables
import graft.textops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate the connected-components cost on the REAL
  * near-dup graph (sf Jaccard pairs, checkpointed so only CC is
  * timed) and on a synthetic chain (the adversarial deep topology).
  * Star contraction vs min-label propagation, min-of-2 per variant
  * (bench noise protocol — SCALING.md).
  * Usage: runMain graft.CcBench [sfDir]
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    def timeMin(label: String)(f: => Long): Double = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"[ccbench] $label%-24s min=$best%7.2fs rows=${times.head._2}")
      best
    }

    val pairs = Dedup.jaccardPairs(Tables.documents(spark, sfDir),
      "doc_id", "text", n = 3, threshold = 0.4).localCheckpoint()
    println(s"[ccbench] near-dup graph: ${pairs.count()} edges")
    timeMin("shallow/star")(
      Dedup.connectedComponents(pairs, "doc_a", "doc_b").count())
    timeMin("shallow/propagate")(
      Dedup.connectedComponentsPropagate(pairs, "doc_a", "doc_b").count())

    import spark.implicits._
    val chain = spark.range(30000)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
      .localCheckpoint()
    println(s"[ccbench] chain graph: ${chain.count()} edges")
    timeMin("chain/star")(
      Dedup.connectedComponents(chain, "a", "b", maxIter = 40).count())
    spark.stop()
  }
}
