package graft

import graft.textops.QualityModel
import org.apache.spark.sql.functions._

/** The learned quality gate. The oracle queries (q_t_quality_model*)
  * prove the GD loop is engine-exact on the driver corpus; this spec
  * proves it LEARNS — on a fixture whose classes have disjoint
  * vocabularies — and that the fit is a pure function of the rows
  * (layout-independent), which is what makes the oracle possible.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // Two disjoint vocabularies: "good" docs sample from goodV, "bad"
  // from badV, deterministically by index. 40 docs per class, 8
  // tokens per doc.
  private val goodV = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")
  private val badV = Vector("noise", "junk", "spam", "garbled", "lorem",
    "ipsum", "filler", "cruft")

  private def fixture = {
    val rows = (0 until 40).flatMap { i =>
      val good = (0 until 8).map(j => goodV((i + j * 3) % goodV.size))
      val bad = (0 until 8).map(j => badV((i * 5 + j) % badV.size))
      Seq((i.toLong, good.mkString(" "), 1L),
        (100L + i, bad.mkString(" "), 0L))
    }
    rows.toDF("doc_id", "text", "y")
  }

  test("trainLogistic separates disjoint-vocabulary classes") {
    val docs = fixture
    val w = QualityModel.trainLogistic(docs, "doc_id", "text", "y",
      dim = 256, iters = 6, lr = 2.0)
    val scored = QualityModel.scoreLogistic(docs, w, "doc_id", "text", 256)
      .join(docs.select("doc_id", "y"), "doc_id")
      .groupBy("y").agg(avg("score").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // after 6 mass-normalized GD rounds the classes sit on opposite
    // sides of 0.5 with a wide gap
    assert(scored(1L) > 0.85, s"positive class mean ${scored(1L)}")
    assert(scored(0L) < 0.15, s"negative class mean ${scored(0L)}")
  }

  test("weights are layout-independent (repartition-invariant)") {
    val docs = fixture
    def fit(parts: Int) =
      QualityModel.trainLogistic(docs.repartition(parts), "doc_id", "text",
          "y", dim = 64, iters = 3, lr = 0.5)
        .orderBy("feat")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fit(2) === fit(7))
  }

  test("token-less docs score exactly 0.5; scores stay in [0,1]") {
    val docs = fixture
    val w = QualityModel.trainLogistic(docs, "doc_id", "text", "y",
      dim = 64, iters = 2, lr = 0.5)
    val withEmpty = docs.select("doc_id", "text")
      .union(Seq((999L, ""), (998L, "   ")).toDF("doc_id", "text"))
    val scores = QualityModel.scoreLogistic(withEmpty, w, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(999L) === 0.5)
    assert(scores(998L) === 0.5)
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("out-of-vocabulary tokens at score time fall back to weight 0") {
    val docs = fixture
    val w = QualityModel.trainLogistic(docs, "doc_id", "text", "y",
      dim = 256, iters = 4, lr = 0.5)
    // half in-vocab positive, half unseen: margin is the in-vocab
    // half's mean, still positive but damped toward 0.5
    val mixed = Seq((1L, "alpha beta unseen1 unseen2")).toDF("doc_id", "text")
    val s = QualityModel.scoreLogistic(mixed, w, "doc_id", "text", 256)
      .collect().head.getDouble(1)
    val pure = QualityModel.scoreLogistic(
        Seq((1L, "alpha beta")).toDF("doc_id", "text"), w, "doc_id", "text", 256)
      .collect().head.getDouble(1)
    assert(s > 0.5 && s < pure)
  }

  test("dense vectorFeatures path separates synthetic clusters (count norm)") {
    // class 1 points along +e0, class 0 along −e0; small deterministic
    // off-axis noise so the problem isn't literally one coordinate
    val rows = (0 until 40).map { i =>
      val y = (i % 2).toLong
      val base = if (y == 1L) 1.0 else -1.0
      val vec = Array.tabulate(8)(d =>
        (if (d == 0) base else 0.1 * ((i + d) % 3 - 1)).toFloat)
      (i.toLong, vec, y)
    }
    val df = rows.toDF("vec_id", "embedding", "y")
    val feats = QualityModel.vectorFeatures(df, "vec_id", "embedding")
    val w = QualityModel.trainLogisticOn(feats, df.select("vec_id", "y"),
      "vec_id", "y", iters = 5, lr = 2.0, norm = "count")
    val means = QualityModel
      .scoreLogisticOn(feats, w, df.select("vec_id"), "vec_id")
      .join(df.select("vec_id", "y"), "vec_id")
      .groupBy("y").agg(avg("score").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(means(1L) > 0.85, s"positive class mean ${means(1L)}")
    assert(means(0L) < 0.15, s"negative class mean ${means(0L)}")
  }

  test("mass norm rejects unknown norm and dense features keep ordinal ids") {
    val df = Seq((1L, Array(0.25f, -0.5f, 1.0f))).toDF("vec_id", "embedding")
    val feats = QualityModel.vectorFeatures(df, "vec_id", "embedding")
    val f = feats.orderBy("feat")
      .collect().map(r => (r.getLong(1), r.getDecimal(2).doubleValue())).toSeq
    assert(f === Seq((0L, 0.25), (1L, -0.5), (2L, 1.0)))
    intercept[IllegalArgumentException] {
      QualityModel.trainLogisticOn(feats, df, "vec_id", "y", 1, 0.5,
        norm = "bogus")
    }
  }

  test("hashedFeatures shares sum to ~1 per doc and features stay in [0,dim)") {
    val f = QualityModel.hashedFeatures(fixture, "doc_id", "text", 32)
    val bad = f.filter(col("feat") < 0 || col("feat") >= 32).count()
    assert(bad === 0)
    val sums = f.groupBy("doc_id").agg(sum(col("x")).as("s"))
      .select(col("s").cast("double")).as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-6))
  }
}
