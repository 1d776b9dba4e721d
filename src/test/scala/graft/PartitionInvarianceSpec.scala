package graft

import org.apache.spark.sql.Row

/** Executable partitioning-invariance proof (round-14 verdict item #1).
  *
  * The 100 TB determinism claim is that NO query's values depend on how
  * Spark happens to split the data: partition counts, scan coalescing,
  * AQE decisions, and therefore floating-point summation ORDER all
  * change between a 32-thread laptop and a 1000-executor cluster, and
  * every reduction in the repo must be order-independent to the bit
  * (DECIMAL-exact sums, gridSnap rounding, tie-broken argmaxes).
  * Round 14 proved this manually — the full 188-query pack re-verified
  * at 7 cores / 7 shuffle partitions — but that proof lived in
  * SCALING.md prose and silently rots on the next operator edit. This
  * spec pins the same invariant in `sbt test`, on one representative
  * query per float-reduction family, at two deliberately awkward and
  * structurally different execution configs:
  *
  *   A: 3 shuffle partitions, AQE coalescing ON (tiny data folds to
  *      few partitions — the small-cluster shape)
  *   B: 7 shuffle partitions, AQE coalescing OFF, 64 KB scan splits
  *      with zero open-cost (every row group its own task — the
  *      many-executor shape)
  *
  * Rows are canonicalized with RAW DOUBLE/FLOAT BITS (not toString,
  * which hides one-ulp drift) and compared as sorted multisets: output
  * ORDER may legitimately differ across partitionings unless a query
  * sorts, but every VALUE must be bit-identical.
  *
  * Families covered (the verdict's minimum list, plus the two custom
  * reductions most exposed to merge order): plain means/sums (q1_agg,
  * q_a10_summary), one-pass entropy via the custom Aggregator — its
  * `merge` order varies with partition count (q_a11_entropy_onepass),
  * correlation moments (q_a14_corr), cosine dot products
  * (q_t_cosine_pairs), iterative PageRank (q_g1_pagerank), the EWMA
  * window recurrence (q_w14_ewma), and the DECIMAL-exact k-means
  * centroid reduction (q_t_kmeans).
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val families: Seq[(String, String)] = Seq(
    "q1_agg" -> "grouped sums/means",
    "q_a10_summary" -> "global summary means",
    "q_a11_entropy_onepass" -> "one-pass entropy Aggregator merge",
    "q_a14_corr" -> "correlation co-moments",
    "q_t_cosine_pairs" -> "cosine dot products",
    "q_g1_pagerank" -> "iterative PageRank mass sums",
    "q_w14_ewma" -> "EWMA recurrence",
    "q_t_kmeans" -> "k-means centroid reduction",
    "q_t_jsd" -> "JSD mixture-term DECIMAL sums",
    "q_t_bm25" -> "BM25 per-term score sums",
    "q_t_quality_model" -> "logistic-regression GD weight folds",
    "q_a17_quantiles" -> "percentile interpolation",
  )

  /** Bit-exact canonical form: doubles/floats render as raw bit
    * patterns so 1-ulp summation drift cannot hide behind toString's
    * shortest-rendering rounding.
    */
  private def canon(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double =>
      "d:" + java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(d))
    case f: java.lang.Float =>
      "f:" + Integer.toHexString(java.lang.Float.floatToRawIntBits(f))
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => canon(k) + "->" + canon(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case x => x.toString
  }

  private val varied = Seq(
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.files.openCostInBytes",
  )

  /** Run one pack query under an execution config; restore the session
    * conf afterwards (the suite shares the JVM-wide test session).
    */
  private def runUnder(name: String, conf: Map[String, String]): Seq[String] = {
    val saved = varied.map(k => k -> spark.conf.getOption(k))
    try {
      varied.foreach(spark.conf.unset)
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      SparkEntry.queries(name)(spark, sfDir).collect().map(canon).sorted.toSeq
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val configA = Map(
    "spark.sql.shuffle.partitions" -> "3",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
  )
  private val configB = Map(
    "spark.sql.shuffle.partitions" -> "7",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.files.maxPartitionBytes" -> "65536",
    "spark.sql.files.openCostInBytes" -> "0",
  )

  families.foreach { case (name, family) =>
    test(s"$name ($family) is bit-identical at 3-part/coalesced vs 7-part/split execution") {
      val a = runUnder(name, configA)
      val b = runUnder(name, configB)
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
      // pinpoint the first diverging row for a readable failure
      a.zip(b).zipWithIndex.collectFirst {
        case ((ra, rb), i) if ra != rb => (i, ra, rb)
      }.foreach { case (i, ra, rb) =>
        fail(s"$name row $i diverges across partitionings:\n  A=$ra\n  B=$rb")
      }
      assert(a.size === b.size,
        s"$name row count diverges: ${a.size} vs ${b.size}")
    }
  }
}
