package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed (AQE-finalized) plan of one
  * `SparkEntry.queries` entry plus shuffle/scan/reuse counts —
  * the feedback loop for the "is this the plan you'd want at 100 TB"
  * iteration. Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    // collect (not count) so THIS df's adaptive plan is executed and
    // finalized — count() would plan a separate query and leave
    // df.queryExecution at the initial, pre-AQE plan.
    val n = df.collect().length
    val sec = (System.nanoTime() - t0) / 1e9
    val p = df.queryExecution.executedPlan.toString
    println(p)
    def c(pat: String) = pat.r.findAllIn(p).size
    println(f"[explain] $name rows=$n time=$sec%.2fs " +
      s"exchanges=${c("Exchange hashpartitioning")} " +
      s"reused=${c("ReusedExchange")} scans=${c("Scan parquet")} " +
      s"codegenSpans=${c("""\*\(\d""")}")
    spark.stop()
  }
}
