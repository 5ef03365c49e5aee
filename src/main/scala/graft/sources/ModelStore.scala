package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Durable persistence for the TRAINED ARTIFACTS the engine's
 * frozen-model contract depends on — tokenizer merge lists
 * ([[graft.operators.TextStats.trainBpe]]), unigram piece tables
 * ([[graft.operators.TextStats.trainUnigramLm]]), logistic models
 * ([[graft.operators.Classifier.trainLogReg]]/`trainTextClassifier`),
 * and langid head stacks ([[graft.operators.Classifier.trainLangid]]).
 * Train once on the batch corpus, save; any later batch job OR
 * streaming restart loads the artifact and freezes it into the plan
 * as literals (the [[graft.streaming.StreamingOps]] frozen-model
 * contract) — without re-running training, and with the model
 * versioned alongside the data release it produced.
 *
 * Layout: ONE uniform parquet schema for every artifact kind —
 * `(part: string, idx: bigint, str_a: string, str_b: string,
 * num: double)` — so a release directory of models is globbable,
 * diffable, and readable by any engine (the same interoperability
 * argument as [[TextCorpus]]'s interchange formats). Ordering is by
 * `idx` (merge order / head index are semantic), restored on load.
 *
 * 100 TB design: artifacts are KB–MB scale (they were bounded driver
 * state during training — the kmeans-centroid contract); save/load is
 * a single-partition parquet write/read, never corpus-scale.
 */
object ModelStore {

  // num_i carries integer payloads losslessly (merge counts above 2^53
  // would silently round through the double num column); num stays the
  // float slot. Old artifacts without num_i read it as NULL — loaders
  // fall back to num for those.
  private val Schema =
    "part string, idx bigint, str_a string, str_b string, num double, num_i bigint"

  private def write(spark: SparkSession,
                    rows: Seq[(String, Long, String, String, Double)],
                    path: String): Unit =
    writeI(spark, rows.map { case (p, i, a, b, n) => (p, i, a, b, n, null) }, path)

  private def writeI(spark: SparkSession,
                     rows: Seq[(String, Long, String, String, Double, java.lang.Long)],
                     path: String): Unit = {
    import spark.implicits._
    rows.toDF("part", "idx", "str_a", "str_b", "num", "num_i")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def read(spark: SparkSession, path: String, part: String) =
    spark.read.schema(Schema).parquet(path)
      .filter(col("part") === part).orderBy(col("idx"))

  /** Persist a BPE merge list (training order is the semantics). */
  def saveMerges(spark: SparkSession, merges: Seq[(String, String, Long)],
                 path: String): Unit =
    writeI(spark, merges.zipWithIndex.map { case ((l, r, n), i) =>
      ("merge", i.toLong, l, r, n.toDouble, java.lang.Long.valueOf(n)) }, path)

  def loadMerges(spark: SparkSession, path: String): Seq[(String, String, Long)] =
    read(spark, path, "merge").collect()
      .map(r => (r.getString(2), r.getString(3),
        if (r.isNullAt(5)) r.getDouble(4).toLong else r.getLong(5))).toSeq

  /** Persist a unigram-LM piece table (piece, log10 prob). */
  def savePieces(spark: SparkSession, pieces: Seq[(String, Double)],
                 path: String): Unit =
    write(spark, pieces.zipWithIndex.map { case ((p, lp), i) =>
      ("piece", i.toLong, p, null, lp) }, path)

  def loadPieces(spark: SparkSession, path: String): Seq[(String, Double)] =
    read(spark, path, "piece").collect()
      .map(r => (r.getString(2), r.getDouble(4))).toSeq

  /** Persist a logistic model: weights by component index + bias row. */
  def saveLogReg(spark: SparkSession,
                 model: graft.operators.Classifier.LogRegModel,
                 path: String): Unit =
    write(spark,
      model.weights.zipWithIndex.toIndexedSeq.map { case (w, i) =>
        ("weight", i.toLong, null, null, w) } :+
        (("bias", 0L, null, null, model.bias)), path)

  def loadLogReg(spark: SparkSession,
                 path: String): graft.operators.Classifier.LogRegModel = {
    val w = read(spark, path, "weight").collect().map(_.getDouble(4))
    val b = read(spark, path, "bias").collect()
    require(w.nonEmpty && b.length == 1,
      s"malformed logreg artifact at $path: ${w.length} weights, ${b.length} bias rows")
    graft.operators.Classifier.LogRegModel(w, b(0).getDouble(4))
  }

  /** Persist a langid head stack: per-head label + weights + bias,
    * plus one meta row carrying (dim, nLo, nHi) in `num`-packed form. */
  def saveLangid(spark: SparkSession,
                 model: graft.operators.Classifier.LangidModel,
                 path: String): Unit = {
    val meta = Seq(
      ("meta_dim", 0L, null, null, model.dim.toDouble),
      ("meta_nlo", 0L, null, null, model.nLo.toDouble),
      ("meta_nhi", 0L, null, null, model.nHi.toDouble))
    val heads = model.labels.indices.flatMap { h =>
      val m = model.heads(h)
      (("label", h.toLong, model.labels(h), null, 0.0)) +:
        (("head_bias", h.toLong, null, null, m.bias)) +:
        m.weights.zipWithIndex.toIndexedSeq.map { case (w, i) =>
          ("head_weight", h.toLong * model.dim + i, null, null, w)
        }
    }
    write(spark, meta ++ heads, path)
  }

  def loadLangid(spark: SparkSession,
                 path: String): graft.operators.Classifier.LangidModel = {
    def metaVal(part: String): Double = {
      val rows = read(spark, path, part).collect()
      require(rows.length == 1, s"malformed langid artifact at $path: $part")
      rows(0).getDouble(4)
    }
    val dim = metaVal("meta_dim").toInt
    val labels = read(spark, path, "label").collect()
      .map(r => r.getLong(1) -> r.getString(2)).sortBy(_._1).map(_._2)
    val biases = read(spark, path, "head_bias").collect()
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val allW = read(spark, path, "head_weight").collect()
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val heads = labels.indices.map { h =>
      graft.operators.Classifier.LogRegModel(
        Array.tabulate(dim)(i => allW(h.toLong * dim + i)), biases(h))
    }
    graft.operators.Classifier.LangidModel(labels.toIndexedSeq,
      heads.toIndexedSeq, dim, metaVal("meta_nlo").toInt, metaVal("meta_nhi").toInt)
  }
}
