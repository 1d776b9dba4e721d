package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableMath.gridSnap

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine is the exactness baseline: O(n·d) per query,
  * embarrassingly parallel, no shuffle until top-k (TakeOrdered). The
  * scale path buckets vectors with random-hyperplane LSH so a query only
  * scores its own bucket(s) — the standard recall/cost trade.
  *
  * Dot products run through `aggregate`/`zip_with` in double precision,
  * left-to-right over the array — deterministic across partitionings.
  */
object Similarity {

  /** Σ xᵢ·yᵢ in double precision — a native codegen'd Catalyst
    * expression (tight Java loop) rather than `aggregate`/`zip_with`,
    * whose lambdas run interpreted per element. Same left-to-right
    * double arithmetic, so results are bit-identical to the HOF form.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector. Plans as scan →
    * projection → TakeOrderedAndProject: each partition keeps k rows.
    * Cosine is rounded to 6 dp before ranking so the ordering (and any
    * oracle comparison) is stable under float noise; ties break on id.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol),
        gridSnap(cosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }

  /** Scalar-subquery form of [[cosineTopK]]: the query vector comes
    * from a 1-row relation attached via broadcast cross join instead of
    * a driver-side `.first()` fetch — the whole plan stays lazy (no
    * job runs before planning) and still ends in TakeOrderedAndProject.
    */
  def cosineTopKAgainst(df: DataFrame, idCol: String, vecCol: String,
                        queryDf: DataFrame, queryVecCol: String, k: Int): DataFrame =
    graft.operators.Joins.withScalar(df, queryDf)
      .select(col(idCol),
        gridSnap(cosine(col(vecCol), col(queryVecCol)), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)

  /** Random-hyperplane LSH signature: `planes` sign bits of projections
    * onto fixed seeded Gaussian directions, packed into a long. Vectors
    * with small angle agree on most bits.
    */
  def lshSignature(vecCol: Column, dim: Int, planes: Int = 16, seed: Long = 42): Column = {
    val rnd = new scala.util.Random(seed)
    val dirs = Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until planes).map { p =>
      val d = array(dirs(p).map(lit(_)): _*)
      when(dot(vecCol, d) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Banded-LSH (approximate) near-neighbour pairs: the signature's
    * `planes` bits are split into bands of `rowsPerBand` bits; any pair
    * agreeing on ≥1 full band becomes a candidate (equi-join on
    * (band index, band value)), then candidates are verified with exact
    * cosine — the sketch prunes, it never decides. A single whole-
    * signature bucket would drop any near-dup that flips one boundary
    * plane; banding keeps recall high at the same join cost model.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, threshold: Double, planes: Int = 64,
                         rowsPerBand: Int = 8): DataFrame = {
    require(planes % rowsPerBand == 0, "rowsPerBand must divide planes")
    val bands = planes / rowsPerBand
    val mask = (1L << rowsPerBand) - 1
    val sig = df.select(col(idCol), col(vecCol))
      .withColumn("nrm", norm(col(vecCol)))
      .withColumn("sig", lshSignature(col(vecCol), dim, planes))
    val banded = sig.select(col(idCol), col(vecCol), col("nrm"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), j -> shiftright(sig, j * $rowsPerBand) & $mask)"))
      .as(Seq("band", "key")))
    banded.toDF("id_a", "vec_a", "nrm_a", "band", "key")
      .join(banded.toDF("id_b", "vec_b", "nrm_b", "band", "key"), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos_sim",
        gridSnap(dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** IVF coarse quantizer — the assignment half of the IVF path
    * ([[bucketedTopPairs]] is the within-bucket search half): every
    * vector goes to its nearest centroid by cosine. Centroids arrive as
    * a small relation (bucket id, centroid vector) — sampled seeds or
    * k-means output; at 100 TB they are the only broadcast state
    * (k ≪ n). One codegen'd dot per (vector, centroid) via a broadcast
    * cross join, then argmax as a struct MAX aggregation whose partial
    * (map-side) step reduces the shuffle to one row per vector. Fully
    * lazy — no driver-side centroid collect.
    */
  def assignBuckets(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, bucketCol: String,
                    centroidVecCol: String): DataFrame = {
    val cent = centroids.select(col(bucketCol).as("_b"),
      col(centroidVecCol).as("_cv"))
      .withColumn("_cnrm", norm(col("_cv")))
    df.select(col(idCol), col(vecCol))
      .withColumn("_nrm", norm(col(vecCol)))
      .crossJoin(broadcast(cent))
      .select(col(idCol), struct(
        gridSnap(dot(col(vecCol), col("_cv")) / (col("_nrm") * col("_cnrm")), 6)
          .as("sim"),
        col("_b").as("bucket")).as("_e"))
      .groupBy(idCol)
      .agg(max(col("_e")).as("_m"))
      .select(col(idCol), col("_m.bucket").as("bucket"),
        col("_m.sim").as("cos_sim"))
  }

  /** Top-`nProbe` nearest centroids per vector — the query-side half of
    * multi-probe IVF. Same broadcast cross join as [[assignBuckets]];
    * the rank window partitions BY VECTOR over k centroid rows (never a
    * wide partition). Ties break on bucket id for determinism.
    */
  def assignBucketsMulti(df: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame, bucketCol: String,
                         centroidVecCol: String, nProbe: Int): DataFrame = {
    require(nProbe > 0, s"probe count must be positive, got $nProbe")
    val cent = centroids.select(col(bucketCol).as("_b"),
        col(centroidVecCol).as("_cv"))
      .withColumn("_cnrm", norm(col("_cv")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
      .orderBy(desc("cos_sim"), asc("bucket"))
    df.select(col(idCol), col(vecCol))
      .withColumn("_nrm", norm(col(vecCol)))
      .crossJoin(broadcast(cent))
      .select(col(idCol), col("_b").as("bucket"),
        gridSnap(dot(col(vecCol), col("_cv")) / (col("_nrm") * col("_cnrm")), 6)
          .as("cos_sim"))
      .withColumn("probe_rank", row_number().over(w))
      .filter(col("probe_rank") <= nProbe)
  }

  /** Multi-probe IVF search: database vectors live in their single
    * nearest bucket (the inverted file); the query scans its `nProbe`
    * nearest buckets' lists with exact cosine verification — the
    * standard IVF recall knob (probing more buckets trades compute for
    * recall without touching the index). Work per query ≈ nProbe/k of
    * the corpus; candidates come from one hash join on the bucket key,
    * the query rides a lazy 1-row broadcast (no driver fetch).
    */
  def searchIvfMultiProbe(db: DataFrame, idCol: String, vecCol: String,
                          centroids: DataFrame, bucketCol: String,
                          centroidVecCol: String, queryDf: DataFrame,
                          queryVecCol: String, nProbe: Int, topK: Int)
      : DataFrame = {
    val dbAssign = assignBuckets(db, idCol, vecCol, centroids, bucketCol,
      centroidVecCol).select(col(idCol), col("bucket"))
    val dbv = db.select(col(idCol), col(vecCol))
      .withColumn("_nrm", norm(col(vecCol)))
      .join(dbAssign, idCol)
    val qProbes = assignBucketsMulti(
        queryDf.withColumn("_qid", lit(0L)), "_qid", queryVecCol,
        centroids, bucketCol, centroidVecCol, nProbe)
      .select("bucket")
    dbv.join(qProbes, "bucket")
      .crossJoin(broadcast(queryDf))
      .withColumn("_qnrm", norm(col(queryVecCol)))
      .select(col(idCol),
        gridSnap(dot(col(vecCol), col(queryVecCol)) / (col("_nrm") * col("_qnrm")), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(topK)
  }

  /** Lloyd k-means trainer for the IVF coarse quantizer — produces the
    * `(bucket, centroid)` relation [[assignBuckets]] consumes, as pure
    * DataFrame ops (no driver-side vector math, unlike the classic
    * collect-centroids-each-round formulation):
    *
    *   - seed: the `k` lowest-id vectors (deterministic and
    *     layout-independent — no sampled or random seeds, so results are
    *     reproducible across engines and partitionings);
    *   - assign: broadcast cross join + struct-MAX argmax by cosine
    *     (the [[assignBuckets]] shape, inlined to keep the vector);
    *   - update: per-bucket element-wise mean via `posexplode` →
    *     `groupBy(bucket, pos)` — sums run over DECIMAL(38,16) so they
    *     are exact and order-independent (double sums would make the
    *     result depend on partitioning), then round to 6 dp;
    *   - empty buckets keep their previous centroid (standard Lloyd
    *     fallback), via left join + coalesce.
    *
    * Each iteration ends in a `localCheckpoint` of the k-row centroid
    * frame: the next round's broadcast starts from materialized rows
    * instead of replaying every previous assign+update. Iteration count
    * is fixed (no convergence test) — deterministic output, bounded
    * cost; centroids are means of cosine-assigned buckets (spherical
    * k-means assignment with a Euclidean mean update).
    *
    * Cost per iteration at scale: one broadcast of k·d doubles, one
    * map-side-combined shuffle of k·d partial sums — the corpus is
    * never shuffled.
    */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): DataFrame = {
    require(k > 0, s"cluster count must be positive, got $k")
    require(iters >= 0, s"iteration count must be non-negative, got $iters")
    var cent = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("bucket"),
        transform(col(vecCol), v => v.cast("double")).as("centroid"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val cnorm = cent.withColumn("_cnrm", norm(col("centroid")))
      val assigned = df.select(col(idCol), col(vecCol))
        .withColumn("_nrm", norm(col(vecCol)))
        .crossJoin(broadcast(cnorm))
        .select(col(idCol), col(vecCol), struct(
          gridSnap(dot(col(vecCol), col("centroid")) / (col("_nrm") * col("_cnrm")), 6)
            .as("sim"),
          col("bucket").as("bucket")).as("_e"))
        .groupBy(idCol)
        // Every replicated row of one vector carries the same array, so
        // first() is deterministic here.
        .agg(max(col("_e")).as("_m"), first(col(vecCol)).as("_v"))
        .select(col("_m.bucket").as("bucket"), col("_v").as("_v"))
      val means = assigned
        .select(col("bucket"), posexplode(col("_v")).as(Seq("pos", "x")))
        .groupBy("bucket", "pos")
        .agg(gridSnap(
          sum(col("x").cast("double")
            .cast(org.apache.spark.sql.types.DecimalType(38, 16))).cast("double")
            / count(lit(1)), 6).as("m"))
        .groupBy("bucket")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("_newc"))
      cent = cent.join(means, Seq("bucket"), "left")
        .select(col("bucket"),
          coalesce(col("_newc"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    cent
  }

  /** IVF-style bucketed search: within each coarse partition (a cluster
    * id / nearest-centroid assignment), exact top-k most-similar pairs.
    * Work is Σ bucket² instead of n² — the standard inverted-file trade;
    * the bucket join is a hash join on the bucket key, and ranking is a
    * partitioned window over per-bucket pairs.
    */
  def bucketedTopPairs(df: DataFrame, idCol: String, vecCol: String,
                       bucketCol: String, k: Int): DataFrame = {
    // Norms are computed once per VECTOR before the pair join — inside
    // the join each of the O(bucket²) pairs then costs a single dot
    // product instead of three (2 norms + dot): ~3× less flops at scale.
    val v = df.select(col(bucketCol).as("bucket"), col(idCol), col(vecCol))
      .withColumn("nrm", norm(col(vecCol)))
    val pairs = v.toDF("bucket", "id_a", "vec_a", "nrm_a")
      .join(v.toDF("bucket", "id_b", "vec_b", "nrm_b"), "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        gridSnap(dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(desc("cos_sim"), asc("id_a"), asc("id_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("bucket"), col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    * arXiv:2303.09540): cluster embeddings with the IVF coarse
    * quantizer, then inside each cluster drop every vector that has a
    * lower-id neighbour at cosine ≥ `threshold`. The reference pipeline
    * has no embedding dedup at all (it deduplicates on exact account
    * numbers, `dl/src/etl/pipeline.py`); this is the embedding-space
    * analogue its data model would need at training-corpus scale.
    *
    * Scale shape: the pair join runs per cluster (Σ cluster², bounded
    * by the quantizer — the same trade as [[bucketedTopPairs]]), and
    * the drop rule is *independent per vector* ("any qualifying
    * lower-id neighbour exists"), so no transitive closure / connected
    * components pass is needed — one aggregation decides every vector.
    * Note the rule is deliberately NOT "neighbour that itself
    * survived": that variant is iterative (a dropped neighbour could
    * un-drop its victims) and order-sensitive; the independent rule is
    * one-shot, deterministic, and what SemDeDup's per-cluster
    * keep-one-representative semantics reduce to for pairwise clusters.
    *
    * Returns the survivors of `df` with their cluster assignment
    * attached (`bucket` column).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, bucketCol: String,
                    centroidVecCol: String, threshold: Double): DataFrame = {
    val assigned = assignBuckets(df, idCol, vecCol, centroids, bucketCol,
        centroidVecCol)
      .select(col(idCol), col("bucket"))
    val v = df.select(col(idCol), col(vecCol))
      .withColumn("_nrm", norm(col(vecCol)))
      .join(assigned, idCol)
      .select(col("bucket"), col(idCol).as("_id"), col(vecCol).as("_vec"),
        col("_nrm"))
    // Losers: any vector with a lower-id cluster-mate at ≥ threshold.
    val losers = v.toDF("bucket", "id_a", "vec_a", "nrm_a")
      .join(v.toDF("bucket", "id_b", "vec_b", "nrm_b"), "bucket")
      .filter(col("id_a") < col("id_b"))
      .filter(gridSnap(dot(col("vec_a"), col("vec_b"))
        / (col("nrm_a") * col("nrm_b")), 6) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(assigned, idCol)
      .join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------------
  // Product quantization (Jégou et al. 2011, public "Product quantization
  // for nearest neighbor search", IEEE TPAMI): compress each d-dim vector
  // to m sub-space code ids against per-sub-space codebooks, then answer
  // top-k with asymmetric distance computation (ADC) — the query scores
  // m·k centroid distances ONCE, and every database vector costs m table
  // lookups instead of d multiplies. The memory-bound scale path past
  // IVF: 100 TB of float embeddings become m bytes/vector of codes.
  // ---------------------------------------------------------------------

  /** Split each vector into `m` equal sub-vectors: one row per
    * (id, sub-space, sub-vector), the relation every PQ stage runs on.
    */
  private def subVectors(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, m: Int): DataFrame = {
    val subLen = dim / m
    val subs = (0 until m).map { j =>
      struct(lit(j).as("sub"),
        transform(slice(col(vecCol), j * subLen + 1, subLen),
          v => v.cast("double")).as("sv"))
    }
    df.select(col(idCol), explode(array(subs: _*)).as("_e"))
      .select(col(idCol), col("_e.sub").as("sub"), col("_e.sv").as("sv"))
  }

  /** Squared L2 distance as three dots (‖a‖² + ‖b‖² − 2a·b) — matching
    * the oracle engine's arithmetic — rounded to 6 dp so float noise
    * can never flip an argmin or a ranking. The two-norm form lets both
    * self-dots be precomputed once per side before a pair join
    * ([[dist2Pre]]) so each of the O(n·k) pairs costs ONE dot, not
    * three — same trick as [[bucketedTopPairs]], same bits.
    */
  private def dist2(a: Column, b: Column): Column =
    gridSnap(dot(a, a) + dot(b, b) - lit(2.0) * dot(a, b), 6)

  /** [[dist2]] with the self-dots already materialized per side. */
  private def dist2Pre(a: Column, aNorm2: Column, b: Column, bNorm2: Column): Column =
    gridSnap(aNorm2 + bNorm2 - lit(2.0) * dot(a, b), 6)

  /** PQ codebook trainer: per-sub-space Lloyd iterations (assign by
    * squared L2, DECIMAL-exact element-wise mean update), seeded from
    * the `k` lowest-id vectors' sub-vectors — deterministic and
    * layout-independent, like [[trainCentroids]] (the same machinery
    * with a sub-space key added and cosine swapped for L2, PQ's metric).
    * Returns the (sub, code, centroid) relation — m·k rows, the only
    * broadcast state at scale. Empty codes keep their seed centroid.
    */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, k: Int, iters: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0, s"codebook size must be positive, got $k")
    require(iters >= 0, s"iteration count must be non-negative, got $iters")
    val seedRows = df.orderBy(col(idCol)).limit(k)
    var cent = subVectors(seedRows, idCol, vecCol, dim, m)
      .withColumn("code", (row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("sub").orderBy(idCol)) - 1)
        .cast("long"))
      .select(col("sub"), col("code"), col("sv").as("centroid"))
      .localCheckpoint()
    val subs = subVectors(df, idCol, vecCol, dim, m)
      .withColumn("_n2", dot(col("sv"), col("sv")))
    for (_ <- 1 to iters) {
      val centN = cent.withColumn("_cn2", dot(col("centroid"), col("centroid")))
      val assigned = subs.join(broadcast(centN), "sub")
        .select(col(idCol), col("sub"), col("sv"),
          struct(dist2Pre(col("sv"), col("_n2"), col("centroid"), col("_cn2"))
            .as("d2"),
            col("code").as("code")).as("_e"))
        .groupBy(idCol, "sub")
        .agg(min(col("_e")).as("_m"), first(col("sv")).as("_v"))
        .select(col("sub"), col("_m.code").as("code"), col("_v").as("_v"))
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("_v")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos")
        .agg(gridSnap(
          sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 16)))
            .cast("double") / count(lit(1)), 6).as("mn"))
        .groupBy("sub", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          e => e.getField("mn")).as("_newc"))
      cent = cent.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("_newc"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    cent
  }

  /** PQ encode: nearest codebook entry per (vector, sub-space) by
    * squared L2 — broadcast codebook join + struct-MIN argmin, map-side
    * partial agg ⇒ the shuffle carries one row per (vector, sub-space).
    * Output (id, sub, code): m small ints per vector, the entire
    * at-rest representation ADC search needs.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, dim: Int, m: Int): DataFrame =
    subVectors(df, idCol, vecCol, dim, m)
      .withColumn("_n2", dot(col("sv"), col("sv")))
      .join(broadcast(codebook
        .withColumn("_cn2", dot(col("centroid"), col("centroid")))), "sub")
      .select(col(idCol), col("sub"),
        struct(dist2Pre(col("sv"), col("_n2"), col("centroid"), col("_cn2"))
          .as("d2"),
          col("code").as("code")).as("_e"))
      .groupBy(idCol, "sub")
      .agg(min(col("_e")).as("_m"))
      .select(col(idCol), col("sub"), col("_m.code").as("code"))

  /** ADC top-k: the query (a lazy 1-row relation, no driver fetch)
    * scores all m·k codebook centroids once; each encoded vector's
    * approximate distance is the sum of its m table entries — a
    * broadcast join on (sub, code) + one groupBy(id), never touching
    * the original vectors. Ties break on id for determinism.
    */
  def pqSearch(encoded: DataFrame, idCol: String,
               codebook: DataFrame, queryDf: DataFrame, queryVecCol: String,
               dim: Int, m: Int, topK: Int): DataFrame = {
    val subLen = dim / m
    val qsubs = (0 until m).map { j =>
      struct(lit(j).as("sub"),
        transform(slice(col(queryVecCol), j * subLen + 1, subLen),
          v => v.cast("double")).as("qv"))
    }
    val lut = graft.operators.Joins.withScalar(codebook, queryDf)
      .select(col("sub"), col("code"), col("centroid"),
        explode(array(qsubs: _*)).as("_q"))
      .filter(col("_q.sub") === col("sub"))
      .select(col("sub"), col("code"),
        dist2(col("_q.qv"), col("centroid")).as("qd2"))
    encoded.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(idCol)
      .agg(gridSnap(sum(col("qd2")), 6).as("adc_dist"))
      .orderBy(asc("adc_dist"), asc(idCol))
      .limit(topK)
  }

  /** Two-stage ANN: ADC shortlist → exact re-rank — the standard
    * accuracy recovery for product quantization (Jégou et al., "PQ
    * for nearest neighbor search", TPAMI 2011 §V: compressed-domain
    * scan, then re-rank the shortlist on original vectors). The ADC
    * stage scans CODES ONLY (4 table lookups + a sum per vector); the
    * original vectors are touched for just the `shortlist` survivors,
    * which arrive as a k-row broadcast semi-join that prunes the
    * corpus scan — exact-cosine work is O(shortlist·d), never O(n·d).
    * Recall dominates raw [[pqSearch]] at the same topK because
    * quantization error decides only which ~shortlist candidates are
    * SEEN, not their final order (spec'd).
    */
  def pqSearchRefined(encoded: DataFrame, idCol: String, codebook: DataFrame,
                      db: DataFrame, vecCol: String,
                      queryDf: DataFrame, queryVecCol: String,
                      dim: Int, m: Int, shortlist: Int, topK: Int): DataFrame = {
    require(shortlist >= topK,
      s"shortlist ($shortlist) must be at least topK ($topK)")
    val cand = pqSearch(encoded, idCol, codebook, queryDf, queryVecCol,
      dim, m, topK = shortlist).select(col(idCol))
    val pruned = db.join(broadcast(cand), Seq(idCol), "left_semi")
    graft.operators.Joins.withScalar(pruned, queryDf)
      .select(col(idCol),
        gridSnap(cosine(col(vecCol), col(queryVecCol)), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(topK)
  }

  /** Exact O(n²) near-neighbour pairs — the correctness oracle for the
    * bucketed variant in tests; usable only at small n.
    */
  def cosineAllPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    // Norms once per vector before the pair join (cf. bucketedTopPairs):
    // each of the O(n²) pairs then costs one dot product, not three.
    val v = df.select(col(idCol), col(vecCol)).withColumn("nrm", norm(col(vecCol)))
    v.toDF("id_a", "vec_a", "nrm_a").crossJoin(v.toDF("id_b", "vec_b", "nrm_b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        gridSnap(dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Hard-negative mining for contrastive training: for every anchor,
    * the `k` corpus vectors MOST cosine-similar to it whose `labelCol`
    * differs — the near-miss negatives that carry the gradient signal
    * random negatives don't (in-batch/random negatives are trivially
    * far; the hard ones sit just across the decision boundary).
    *
    * Shape: anchors are a TRAINING BATCH — a k-row relation — so they
    * broadcast and the corpus-sized side never shuffles for the
    * candidate product; the |anchors|·n candidate stream collapses
    * per-anchor through the k-bounded [[graft.functions.TopKAggregator]]
    * (map-side partials carry ≤k rows per anchor, exchange is
    * O(anchors·k), nothing sorts the corpus). This is exact brute
    * force per anchor — the IVF-bucketed composition
    * ([[searchIvfMultiProbe]] + label filter) is the approximate
    * scale path when even one pass over the corpus per batch is too
    * much. Cosine is rounded to 6 dp BEFORE top-k selection and ties
    * break by id ASC, so the result is layout- and engine-exact.
    *
    * `idCol` must be integral (rides the bounded top-k buffer as a
    * long). Corpus rows with a NULL label are kept as negatives for
    * every anchor (unknown label ≠ anchor's); NULL-labeled anchors
    * treat every labeled row as a negative.
    *
    * Returns (anchor_id, rank, negative_id, cos_sim), rank 1-based.
    */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, anchors: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"negatives per anchor must be positive, got $k")
    val a = anchors.select(col(idCol).as("_aid"), col(vecCol).as("_avec"),
      col(labelCol).as("_albl"))
    val cand = df.join(broadcast(a),
        col(idCol) =!= col("_aid") &&
          (col(labelCol).isNull || col("_albl").isNull ||
            col(labelCol) =!= col("_albl")))
      .select(col("_aid"),
        gridSnap(cosine(col(vecCol), col("_avec")), 6).as("_cos"),
        col(idCol).cast("long").as("_nid"))
    cand.groupBy(col("_aid").as("anchor_id"))
      .agg(graft.functions.TopKAggregator
        .topK(k, col("_cos"), col("_nid")).as("_top"))
      .select(col("anchor_id"), posexplode(col("_top")).as(Seq("_p", "_e")))
      .select(col("anchor_id"), (col("_p") + 1).cast("long").as("rank"),
        col("_e.id").as("negative_id"), col("_e.value").as("cos_sim"))
  }

  /** d×d gram matrix Σᵣ vᵣ·vᵣᵀ of an embedding column as (i, j, s)
    * rows — the one-pass statistic under covariance, PCA, and
    * whitening. Each row contributes its d² element products
    * (posexplode twice); map-side partial aggregation then collapses
    * every partition to ≤d² groups BEFORE the shuffle, so the exchange
    * carries O(partitions·d²) rows regardless of corpus size — the
    * same bounded-shuffle property as the MG sketch. float×float
    * products are exact in double (24+24 significand bits < 53);
    * cross-row sums run over DECIMAL(38,16) so the matrix is identical
    * under any partitioning or engine (the kmeans/logprob discipline).
    * For d where the d²-per-row explode dominates (d ≳ 10³), the seam
    * is a typed Aggregator with a d²-double buffer — same output,
    * no materialized pair rows.
    */
  def gramMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 16)
    df.select(col(vecCol).as("_v"), posexplode(col(vecCol)).as(Seq("i", "xi")))
      .select(col("i"), col("xi").cast("double").as("xi"),
        posexplode(col("_v")).as(Seq("j", "xj")))
      .select(col("i"), col("j"),
        (col("xi") * col("xj").cast("double")).as("p"))
      .groupBy("i", "j")
      .agg(gridSnap(sum(col("p").cast(dec)).cast("double"), 6).as("s"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix —
    * deterministic (fixed sweep order, fixed iteration count on top of
    * the off-diagonal-mass exit), driver-side: the input is a d×d
    * PLANNING artifact (gram/covariance), never data-sized. Returns
    * (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    * descending, each vector's sign fixed so its largest-|component|
    * entry is positive (Jacobi's sign is otherwise arbitrary).
    */
  private[textops] def jacobiEigen(a0: Array[Array[Double]],
                                   sweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-18) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val m = col.indices.maxBy(k => math.abs(col(k)))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Principal components of an embedding column: covariance from the
    * one-pass [[gramMatrix]] + mean (cov = G/n − μμᵀ), eigensolved
    * driver-side ([[jacobiEigen]] — d×d, a planning artifact like the
    * Dedup join-variant statistics, NOT a data collect). Returns the
    * mean and the top-k (eigenvalue, component) pairs.
    */
  def principalComponents(df: DataFrame, vecCol: String,
                          k: Int): (Array[Double], Array[(Double, Array[Double])]) = {
    // ONE d-group job yields n, d, AND the mean vector — no separate
    // first-vector probe for the dimension (same planning shape as
    // gramMatrix's d²-group aggregate)
    val stats = df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), avg(col("x").cast("double")).as("mu"))
      .orderBy("pos")
      .collect()
    require(stats.nonEmpty, "principalComponents needs a non-empty corpus")
    val n = stats(0).getLong(1).toDouble
    val mu = stats.map(_.getDouble(2))
    val d = mu.length
    require(k >= 1 && k <= d, s"k must be in 1..$d, got $k")
    val g = Array.ofDim[Double](d, d)
    gramMatrix(df, vecCol).collect().foreach { r =>
      g(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    val cov = Array.tabulate(d, d)((i, j) => g(i)(j) / n - mu(i) * mu(j))
    val (vals, vecs) = jacobiEigen(cov)
    (mu, vals.zip(vecs).take(k))
  }

  /** Project (and optionally whiten) every vector onto the top-k
    * principal axes: proj_c = Σ_d (v_d − μ_d)·e_cd, divided by √λ_c
    * when whitening. The axes enter the plan as LITERAL arrays
    * (broadcast by the plan itself — k·d doubles), so the projection
    * is one narrow codegen'd map over the data: no join, no shuffle.
    * Output: (idCol, proj array<double> rounded to 6 dp).
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String, k: Int,
                 whiten: Boolean = false): DataFrame = {
    val (mu, comps) = principalComponents(df, vecCol, k)
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedLit(mu.toSeq), (x, m) => x - m)
    val projs = comps.map { case (lam, e) =>
      val raw = aggregate(
        zip_with(centered, typedLit(e.toSeq), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      if (whiten) raw / math.sqrt(math.max(lam, 1e-12)) else raw
    }
    df.select(col(idCol),
      array(projs.map(p => gridSnap(p, 6)): _*).as("proj"))
  }
}
