package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed logistic-regression classifier over embedding or
 * hashed-text features — the trainable half of quality filtering: CCNet
 * and the fastText-style pipelines train a linear classifier on "known
 * good" (Wikipedia) vs "raw crawl" and keep documents the model scores
 * high. [[graft.functions.HashingVector]] supplies model-free
 * bag-of-words features, so the full fastText-shaped loop — hash, train,
 * score, filter — runs inside the engine with no external ML stack.
 *
 * Training is deterministic full-batch gradient descent (fixed zero
 * init, fixed iteration count): w ← w − lr·∇L/n with
 * L = Σ log-loss(σ(w·x + b), y). Determinism modulo double-sum order in
 * the gradient aggregate — the same caveat as [[Similarity.kmeans]]'s
 * centroid means, and like there it never flips a decision on data
 * separated with any margin.
 *
 * 100 TB design, per iteration: the margin σ(w·x+b) is ONE codegen'd
 * projection against weight plan-literals (no join, the
 * [[Similarity.kmeans]] assignment shape); the gradient explodes each
 * row to (component, err·xᵢ) pairs — dim-multiplied volume, but partial
 * aggregation collapses every task's stream to ≤ dim+1 rows before the
 * exchange, so the shuffle moves (dim+1)·tasks rows, not the corpus.
 * The driver holds dim+1 aggregated doubles per round (4 KB at dim 512).
 * Each iteration re-scans `df` — persist the feature frame before
 * calling when the input is an expensive upstream plan, exactly as with
 * kmeans. Scoring ([[scoreColumn]]) is a zero-shuffle projection.
 */
object Classifier extends Logging {

  /** Trained model: `weights.length == dim`, bias separate. */
  final case class LogRegModel(weights: Array[Double], bias: Double) {
    require(weights.nonEmpty, "weights must be non-empty")
  }

  /**
   * Train on `vecCol: array<float|double>` (fixed dimension) against
   * `labelCol` (0/1, cast to double). Rows with a NULL label or NULL
   * vector are ignored. Returns the model; the caller applies it with
   * [[scoreColumn]] / [[withScore]].
   */
  def trainLogReg(df: DataFrame, vecCol: String, labelCol: String,
                  iters: Int = 30, lr: Double = 1.0): LogRegModel = {
    require(iters >= 1, "iters must be >= 1")
    require(lr > 0, "lr must be > 0")
    val base0 = df.select(
        transform(col(vecCol), x => x.cast(DoubleType)).as("__v"),
        col(labelCol).cast(DoubleType).as("__y"))
      .filter(col("__v").isNotNull && col("__y").isNotNull)
    // ONE probe job for (n, dim) — r21: the dim head() and the count()
    // were two separate scans of the training frame
    val stats = base0.agg(count(lit(1)).as("n"),
      first(size(col("__v"))).as("dim")).head()
    require(stats.getLong(0) > 0, "training frame is empty")
    val dim = stats.getInt(1)
    val nRows = stats.getLong(0)
    val n = nRows.toDouble
    // Scale-adaptive parallelism (r21, guide §2): every GD iteration is
    // one Spark job over this frame, and a gate-sized fixture (hundreds
    // of rows) split across defaultParallelism tasks pays ~all of its
    // wall clock in task scheduling — 15 iterations of 32+32 tasks for
    // 400 rows. Size partitions to the measured row count (coalesce,
    // no shuffle); corpus-scale frames keep their scan partitioning.
    val targetParts = math.max(1L,
      math.min(nRows / 50000L + 1L, base0.rdd.getNumPartitions.toLong)).toInt
    val base = if (targetParts < base0.rdd.getNumPartitions)
      base0.coalesce(targetParts) else base0
    var w = Array.fill(dim)(0.0)
    var b = 0.0
    for (_ <- 1 to iters) {
      val margin = graft.functions.VectorExpressions.dotProduct(
        col("__v"), typedlit(w.toSeq)) + lit(b)
      val err = (lit(1.0) / (lit(1.0) + exp(-margin))) - col("__y")
      // err is STAGED below the explode: referenced dim+1 times from
      // the transform lambda, inlining it would recompute the dim-term
      // dot product per vector ELEMENT (dim² multiply-adds per row —
      // measured pathological at dim 4096; CollapseProject keeps the
      // stage because the alias is referenced by non-cheap expressions)
      val grads = base
        .select(col("__v"), err.as("__e"))
        .select(posexplode(concat(
          transform(col("__v"), x => x * col("__e")), array(col("__e"))))
          .as(Seq("__i", "__g")))
        // components 0..dim-1 = err*x_i, component dim = err (bias); one
        // partially-aggregated groupBy collapses to dim+1 rows per task
        .groupBy(col("__i")).agg(sum(col("__g")).as("__s"))
        .collect()
      grads.foreach { r =>
        val i = r.getInt(0)
        val g = lr * r.getDouble(1) / n
        if (i < dim) w(i) -= g else b -= g
      }
    }
    LogRegModel(w, b)
  }

  /** σ(w·x + b) as a zero-shuffle codegen'd projection — weights are
    * plan literals, like the kmeans assignment. NULL vector → NULL. */
  def scoreColumn(vec: Column, model: LogRegModel): Column = {
    val margin = graft.functions.VectorExpressions.dotProduct(
      transform(vec, x => x.cast(DoubleType)),
      typedlit(model.weights.toSeq)) + lit(model.bias)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** `df` plus `scoreCol` (probability) and `predCol` (score >= 0.5). */
  def withScore(df: DataFrame, vecCol: String, model: LogRegModel,
                scoreCol: String = "score", predCol: String = "pred"): DataFrame = {
    val s = scoreColumn(col(vecCol), model)
    df.withColumn(scoreCol, s).withColumn(predCol, (s >= 0.5).cast(IntegerType))
  }

  /**
   * The fastText-shaped convenience: hash `textCol` to `dim` signed
   * bag-of-words buckets ([[graft.functions.HashingVector]]), train on
   * `labelCol`. The feature projection rides the scan; at corpus scale
   * persist `docs.select(id, label, hashingVector(...))` first so the
   * per-iteration re-scan hashes once.
   */
  def trainTextClassifier(docs: DataFrame, textCol: String, labelCol: String,
                          dim: Int = 1024, iters: Int = 30,
                          lr: Double = 1.0): LogRegModel =
    trainLogReg(
      docs.select(
        graft.functions.TextFunctions.hashingVector(col(textCol), dim).as("__f"),
        col(labelCol)),
      "__f", labelCol, iters, lr)

  /**
   * Calibration (reliability) report — the deployment check between
   * training a quality classifier and trusting its scores as keep
   * probabilities ([[graft.operators.Sampling.weightedSample]] weights,
   * FineWeb-Edu-style threshold picks): bucket predictions into `bins`
   * equal-width probability bins and compare the mean predicted score
   * with the observed positive rate per bin. `gap` (mean_score −
   * observed_rate, the per-bin reliability residual) is computed INSIDE
   * the aggregate so the rounding is one operation — the weighted sum
   * of |gap| over bins is the expected calibration error. Bin =
   * min(bins−1, floor(score·bins)), so score 1.0 lands in the top bin.
   * NULL scores/labels are excluded (no bin is the honest answer).
   *
   * Scores compared across engines should be pre-rounded (round 6) by
   * the caller — binning sits on a floor() cliff, and the round
   * absorbs double-sum order at the edge (the q_emb_score convention).
   *
   * 100 TB design: ONE partially-aggregated groupBy collapsing to
   * ≤ bins rows — corpus-scale input, bins-scale output, no window,
   * no second pass.
   */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
                        bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("bin",
        least(lit(bins - 1L), floor(col(scoreCol) * bins)).cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col(scoreCol)), 6).as("mean_score"),
        round(avg(col(labelCol).cast(DoubleType)), 6).as("observed_rate"),
        round(avg(col(scoreCol)) -
          avg(col(labelCol).cast(DoubleType)), 6).as("gap"))
  }

  /**
   * Trained language-ID model: one logistic head per label over the
   * shared char-n-gram feature space ([[graft.functions.CharNgramVector]]).
   * `labels` is sorted, so training and argmax tie-breaking are
   * deterministic regardless of partitioning.
   */
  final case class LangidModel(labels: IndexedSeq[String],
                               heads: IndexedSeq[LogRegModel],
                               dim: Int, nLo: Int, nHi: Int) {
    require(labels.nonEmpty && labels.size == heads.size,
      "labels and heads must align and be non-empty")
  }

  /**
   * Char-n-gram langid — the TRAINED upgrade over
   * [[graft.functions.TextFunctions.detectLanguage]]'s stopword
   * profiles, which are weak on short or morphology-rich text (a
   * 3-word German query may contain zero stopwords; byte trigrams of
   * "straße" are unmistakable). fastText-langid shape: hash byte
   * n-grams (`nLo..nHi`) to `dim` signed buckets, train one-vs-rest
   * logistic heads on a labeled frame, predict by margin argmax.
   *
   * Labels are the DISTINCT values of `labelCol` — a bounded collect
   * (the number of languages, not the corpus). All heads train JOINTLY:
   * each iteration is ONE pass computing every head's staged error in
   * one projection and aggregating every head's gradient in one
   * (head·component, sum) groupBy — L× fewer Spark jobs and corpus
   * scans than L independent [[trainLogReg]] loops (measured 5×+
   * wall-clock on the gate frame; at 100 TB the difference is L corpus
   * scans per iteration vs one). The explode volume is
   * rows·L·(dim+1), but partial aggregation collapses each task to
   * ≤ L·(dim+1) rows before the exchange, and the driver holds
   * L·(dim+1) doubles per round (~16 KB at L=8, dim 512). The feature
   * frame (one hashing of the corpus) is persisted for the duration of
   * the loop and unpersisted before returning.
   */
  def trainLangid(docs: DataFrame, textCol: String, labelCol: String,
                  dim: Int = 512, nLo: Int = 1, nHi: Int = 3,
                  iters: Int = 30, lr: Double = 2.0): LangidModel = {
    require(iters >= 1, "iters must be >= 1")
    require(lr > 0, "lr must be > 0")
    val feats0 = docs.select(
        graft.functions.CharNgramVector.charNgramVector(
          col(textCol), dim, nLo, nHi).as("__f"),
        col(labelCol).cast(StringType).as("__lang"))
      .filter(col("__lang").isNotNull)
      .persist()
    try {
      val labels = feats0.select("__lang").distinct()
        .collect().map(_.getString(0)).sorted.toIndexedSeq
      require(labels.size >= 2, "need at least two labels to train langid")
      val L = labels.size
      val nRows = feats0.count()
      val n = nRows.toDouble
      require(n > 0, "training frame is empty")
      // scale-adaptive parallelism (r21, the trainLogReg rationale):
      // each joint-GD iteration is one job over the persisted frame;
      // coalesce fixture-sized frames so iterations don't spend their
      // wall clock scheduling empty tasks (cached blocks still serve
      // the reads; corpus-scale frames keep their partitioning)
      val targetParts = math.max(1L, math.min(nRows / 50000L + 1L,
        feats0.rdd.getNumPartitions.toLong)).toInt
      val feats = if (targetParts < feats0.rdd.getNumPartitions)
        feats0.coalesce(targetParts) else feats0
      val w = Array.fill(L)(Array.fill(dim)(0.0))
      val b = Array.fill(L)(0.0)
      for (_ <- 1 to iters) {
        // stage every head's error once (the trainLogReg staging trick,
        // L-wide): margin/sigmoid computed per row per head, referenced
        // dim+1 times from the explode below
        val errCols = labels.indices.map { h =>
          val margin = graft.functions.VectorExpressions.dotProduct(
            col("__f"), typedlit(w(h).toSeq)) + lit(b(h))
          ((lit(1.0) / (lit(1.0) + exp(-margin))) -
            (col("__lang") === labels(h)).cast(DoubleType)).as(s"__e$h")
        }
        val staged = feats.select(col("__f") +: errCols: _*)
        // one flat (head·(dim+1)+component, grad) stream for ALL heads
        val parts = labels.indices.flatMap { h =>
          Seq(transform(col("__f"), x => x * col(s"__e$h")),
            array(col(s"__e$h")))
        }
        val grads = staged
          .select(posexplode(concat(parts: _*)).as(Seq("__i", "__g")))
          .groupBy(col("__i")).agg(sum(col("__g")).as("__s"))
          .collect()
        grads.foreach { r =>
          val i = r.getInt(0)
          val g = lr * r.getDouble(1) / n
          val h = i / (dim + 1)
          val j = i % (dim + 1)
          if (j < dim) w(h)(j) -= g else b(h) -= g
        }
      }
      LangidModel(labels,
        labels.indices.map(h => LogRegModel(w(h), b(h))), dim, nLo, nHi)
    } finally feats0.unpersist()
  }

  /**
   * `df` plus `out` = predicted language for `text` — a zero-shuffle
   * STAGED projection (the [[graft.functions.TextFunctions.withDetectedLanguage]]
   * plan shape): bottom stage computes the char-n-gram vector ONCE,
   * middle stage the per-head margin array (weights as plan literals),
   * top stage `element_at(labels, array_position(arr, array_max(arr)))`
   * — argmax with first-of-sorted-labels tie-breaking (sigmoid is
   * monotone, so margin argmax = probability argmax). NULL text → NULL
   * prediction; empty text (zero vector) → bias argmax.
   */
  def withLangid(df: DataFrame, textCol: String, model: LangidModel,
                 out: String = "lang_pred"): DataFrame = {
    val base = df.columns.map(col).toIndexedSeq
    val staged = df.select(base :+
      graft.functions.CharNgramVector.charNgramVector(
        col(textCol), model.dim, model.nLo, model.nHi).as("__lid_f"): _*)
    val margins = model.heads.map { h =>
      graft.functions.VectorExpressions.dotProduct(
        col("__lid_f"), typedlit(h.weights.toSeq)) + lit(h.bias)
    }
    val withArr = staged.select(base :+ array(margins: _*).as("__lid_m"): _*)
    withArr.select(base :+ element_at(
      typedlit(model.labels),
      array_position(col("__lid_m"), array_max(col("__lid_m"))).cast(IntegerType))
      .as(out): _*)
  }
}
