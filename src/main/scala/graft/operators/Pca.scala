package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed PCA / whitening over embedding columns — the linear-
 * algebra complement to the vector-curation family ([[Similarity]]):
 * decorrelate and compress embeddings before SemDeDup-style clustering,
 * balance dimensions before cosine ANN (whitening), or drop an
 * `array<float>` column from 64 to 8 informative dimensions before an
 * expensive all-pairs stage.
 *
 * Shapes, 100 TB discipline:
 *  - the MOMENT aggregation is the only distributed work: a
 *    double-posexplode streams (i, j, xi·xj) upper-triangle entries
 *    (dim² per row) into a groupBy(i,j) — partial aggregation collapses
 *    every task's stream to <= dim(dim+1)/2 rows before the exchange
 *    (the [[Similarity.kmeans]] centroid-update argument), so the
 *    shuffle moves ~2k rows/task at dim=64, never the corpus;
 *  - the driver holds one dim x dim covariance (64² = 32 KB) and runs a
 *    deterministic deflated power iteration on it — no corpus-scale
 *    driver work;
 *  - projection is d plan-literal dot products per row
 *    (the [[Similarity.nearestCentroid]] shape): one codegen'd
 *    zero-shuffle projection riding the scan.
 */
object Pca extends Logging {

  /** Trained PCA basis. `components(k)` is the k-th principal axis
    * (unit length, descending variance); `variances(k)` its eigenvalue
    * (population convention, divide-by-n); `totalVariance` the trace of
    * the covariance — `variances.sum / totalVariance` is the explained
    * variance ratio of the kept subspace. */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            variances: Array[Double],
                            totalVariance: Double) {
    require(components.nonEmpty, "empty PCA basis")
    def dim: Int = mean.length
    def d: Int = components.length
    def explainedVarianceRatio: Double = variances.sum / totalVariance
  }

  /**
   * Estimate the top-`d` principal components of the (centered) vector
   * column. Two aggregation jobs (mean, then second moments) and a
   * driver-side deflated power iteration (`iters` fixed rounds from a
   * fixed start vector — deterministic up to double-sum rounding in the
   * distributed moment sums). `d` must leave room for deflation noise:
   * keep `d << dim`.
   */
  def trainPca(corpus: DataFrame, idCol: String, vecCol: String, d: Int,
               iters: Int = 100): PcaModel = {
    require(d >= 1, "d must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    val vd = corpus.select(
      transform(col(vecCol), x => x.cast(DoubleType)).as("__v"))
    // mean: dim partial-agged rows + the count
    val meanRows = vd
      .select(posexplode(col("__v")).as(Seq("i", "x")))
      .groupBy("i").agg(sum("x").as("s"), count(lit(1)).as("n"))
      .collect()
    require(meanRows.nonEmpty, "corpus is empty")
    val n = meanRows.head.getLong(2)
    val dim = meanRows.length
    require(d <= dim, s"d=$d must be <= dim=$dim")
    val mean = Array.ofDim[Double](dim)
    meanRows.foreach(r => mean(r.getInt(0)) = r.getDouble(1) / n)
    // upper-triangle second moments: <= dim(dim+1)/2 rows after the agg
    val momRows = vd
      .select(posexplode(col("__v")).as(Seq("i", "xi")), col("__v"))
      .select(col("i"), col("xi"),
        posexplode(col("__v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j").agg(sum(col("xi") * col("xj")).as("s"))
      .collect()
    val cov = Array.fill(dim)(Array.fill(dim)(0.0))
    momRows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val c = r.getDouble(2) / n - mean(i) * mean(j)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    // deflated power iteration, fixed uniform start (deterministic)
    val comps = Array.ofDim[Array[Double]](d)
    val vars = Array.ofDim[Double](d)
    val a = cov.map(_.clone())
    for (k <- 0 until d) {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var it = 0
      while (it < iters) {
        val av = Array.tabulate(dim)(i => {
          var s = 0.0; var j = 0
          while (j < dim) { s += a(i)(j) * v(j); j += 1 }
          s
        })
        val nn = math.sqrt(av.map(x => x * x).sum)
        require(nn > 0,
          s"power iteration collapsed at component $k (rank-deficient " +
            "covariance or start vector orthogonal to the eigenspace); " +
            "reduce d")
        v = av.map(_ / nn)
        it += 1
      }
      val lambda = {
        var s = 0.0
        for (i <- 0 until dim; j <- 0 until dim) s += v(i) * a(i)(j) * v(j)
        s
      }
      comps(k) = v
      vars(k) = lambda
      // deflate: a -= lambda v v^T
      for (i <- 0 until dim; j <- 0 until dim) a(i)(j) -= lambda * v(i) * v(j)
    }
    logInfo(s"PCA: d=$d of dim=$dim, explained variance ratio " +
      f"${vars.sum / trace}%.4f")
    PcaModel(mean, comps, vars, trace)
  }

  /**
   * Project a vector column onto the model's basis: d plan-literal dot
   * products against the CENTERED vector (`array<double>`, length d).
   * `whiten = true` scales coordinate k by `1/sqrt(variances(k))` —
   * unit variance per kept dimension (the decorrelation preprocessing
   * SemDeDup/retrieval stacks use). One codegen'd zero-shuffle
   * projection.
   */
  def pcaProjectColumn(vec: Column, model: PcaModel,
                       whiten: Boolean = false): Column = {
    val centered = zip_with(
      transform(vec, x => x.cast(DoubleType)),
      typedlit(model.mean.toSeq),
      (x, m) => x - m)
    array(model.components.indices.map { k =>
      val dot = graft.functions.VectorExpressions.dotProduct(
        centered, typedlit(model.components(k).toSeq))
      if (whiten) dot / math.sqrt(model.variances(k)) else dot
    }: _*)
  }

  /** Train-and-project convenience: (idCol, projection) for the whole
    * corpus. See [[trainPca]] / [[pcaProjectColumn]]. */
  def pcaProject(corpus: DataFrame, idCol: String, vecCol: String, d: Int,
                 whiten: Boolean = false, iters: Int = 100): DataFrame = {
    val model = trainPca(corpus, idCol, vecCol, d, iters)
    corpus.select(col(idCol),
      pcaProjectColumn(col(vecCol), model, whiten).as("projection"))
  }
}
