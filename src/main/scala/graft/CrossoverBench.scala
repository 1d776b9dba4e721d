package graft

import graft.textops.{Dedup, SyntheticCorpus}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the full-shingle-join vs prefix-filtered Jaccard
  * crossover on corpora at both density poles — the short high-entropy
  * `documents` table (where the full join wins) and a boilerplate-heavy
  * template corpus (dense shingle buckets, where AllPairs should win).
  * Two timed runs per variant, min reported (bench noise protocol —
  * SCALING.md). Usage: runMain graft.CrossoverBench [templates variants docLen]
  */
object CrossoverBench {
  def main(args: Array[String]): Unit = {
    val (nTpl, variants, docLen) =
      if (args.length >= 3) (args(0).toInt, args(1).toInt, args(2).toInt)
      else (500, 24, 200)
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
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      val best = times.map(_._1).min
      println(f"[crossover] $label%-28s min=$best%7.2fs rows=${times.head._2}")
      best
    }

    // Pole 1: boilerplate-heavy template corpus (dense buckets).
    val dense = SyntheticCorpus.templateCorpus(spark, nTpl, variants, docLen)
      .localCheckpoint() // measure the joins, not corpus synthesis
    println(s"[crossover] dense corpus: ${nTpl * variants} docs x $docLen tokens")
    val t = sys.env.getOrElse("XT_DENSE", "0.6").toDouble
    timeMin("dense/full")(Dedup.jaccardPairs(dense, "doc_id", "text", 3, t).count())
    timeMin("dense/prefix")(Dedup.jaccardPairsPrefix(dense, "doc_id", "text", 3, t).count())

    // Variant probe: does persisting the per-doc shingle relation to
    // disk beat the 4x lazy recompute the prefix form makes by default?
    // (localCheckpoint measured 5->35s and repartition 4->7s in round 3;
    // DISK_ONLY is the cluster-realistic alternative not yet measured.)
    {
      import org.apache.spark.storage.StorageLevel
      val t0 = System.nanoTime()
      val perDoc = dense
        .select(col("doc_id"), graft.textops.TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), expr(
          "array_sort(array_distinct(transform(sequence(0, size(toks) - 3), i -> xxhash64(slice(toks, i + 1, 3)))))")
          .as("sh_arr"))
        .withColumn("n_sh", size(col("sh_arr")))
        .persist(StorageLevel.DISK_ONLY)
      val prefixLen = (col("n_sh") - ceil(col("n_sh") * t) + 1).cast("int")
      val prefix = perDoc.select(col("doc_id"),
        explode(slice(col("sh_arr"), lit(1), greatest(prefixLen, lit(1)))).as("shingle"))
      def run(): Long = {
        val candidates = prefix.select(col("doc_id").as("doc_a"), col("shingle"))
          .join(prefix.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        candidates
          .join(perDoc.select(col("doc_id").as("doc_a"),
            col("sh_arr").as("_a"), col("n_sh").as("n_a")), "doc_a")
          .join(perDoc.select(col("doc_id").as("doc_b"),
            col("sh_arr").as("_b"), col("n_sh").as("n_b")), "doc_b")
          .withColumn("inter", size(array_intersect(col("_a"), col("_b"))))
          .withColumn("j", col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
          .filter(col("j") >= t).count()
      }
      timeMin("dense/prefix-diskpersist")(run())
      perDoc.unpersist()
      println(f"[crossover] (incl. first-run persist population: ${(System.nanoTime() - t0) / 1e9}%.2fs total)")
    }

    // Pole 2: the short high-entropy documents table at sf0.1.
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .localCheckpoint()
    println(s"[crossover] sparse corpus: ${docs.count()} docs (sf0.1 documents)")
    timeMin("sparse/full")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, sys.env.getOrElse("XT_SPARSE", "0.4").toDouble).count())
    timeMin("sparse/prefix")(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, sys.env.getOrElse("XT_SPARSE", "0.4").toDouble).count())

    // Candidate statistics at both poles — the search for the signal
    // that separates prefix-wins from prefix-loses corpora.
    Seq(("dense", dense, 0.6), ("sparse", docs, 0.4)).foreach { case (name, df, th) =>
      val sh = graft.textops.TextFunctions.shingleTable(df, "doc_id", "text", 3)
      val b = sh.groupBy("shingle").count()
      val r = b.selectExpr("count(1) AS dist", "sum(count) AS total",
        "sum(count * count) AS sumsq", "max(count) AS mx").collect().head
      val (dist, total, sumsq, mx) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      println(f"[crossover] $name%-7s mean=${total.toDouble / dist}%6.2f " +
        f"weighted=${sumsq.toDouble / total}%9.2f max=$mx%6d sumsq=$sumsq%12d")
    }
    Seq(("dense", dense, 0.6), ("sparse", docs, 0.4)).foreach { case (name, df, th) =>
      val t0 = System.nanoTime()
      val pick = Dedup.preferPrefixFilter(df, "doc_id", "text", 3, th)
      println(f"[crossover] $name%-7s auto-choice: ${
        if (pick) "prefix" else "full"}%-6s (decided in ${(System.nanoTime() - t0) / 1e9}%.2fs)")
    }
    spark.stop()
  }
}
