package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainLogReg separates a hand-built 1-D problem") {
    val df = Seq(
      (Array(1.0f), 1), (Array(0.8f), 1), (Array(1.2f), 1),
      (Array(-1.0f), 0), (Array(-0.7f), 0), (Array(-1.3f), 0)
    ).toDF("vec", "label")
    val m = Classifier.trainLogReg(df, "vec", "label", iters = 50, lr = 2.0)
    assert(m.weights.length == 1 && m.weights(0) > 0,
      "positive class sits at positive x, weight must learn that")
    val out = Classifier.withScore(df, "vec", m).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("pred") == r.getAs[Int]("label"))
      val s = r.getAs[Double]("score")
      if (r.getAs[Int]("label") == 1) assert(s > 0.5) else assert(s < 0.5)
    }
  }

  test("text classifier learns a token-presence concept well above base rate") {
    // label = the word "spark" appears (385 of 500 docs at sf0.01, so
    // base rate 0.77); hashed bag-of-words features make this
    // near-separable, but full-batch GD grows logistic margins only
    // logarithmically — measured 0.996 at (dim 1024, lr 400, 100
    // iters), so the contract is a threshold, not exactness (the
    // EXACT-recovery gate lives on the planted separable frame of
    // q_gate_classifier, where the margin is comfortable)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"),
        array_contains(split(col("text"), " "), "spark")
          .cast(IntegerType).as("label"))
      .cache()
    val m = Classifier.trainTextClassifier(docs, "text", "label",
      dim = 1024, iters = 100, lr = 400.0)
    val feats = docs.select(col("label"),
      graft.functions.TextFunctions.hashingVector(col("text"), 1024).as("__f"))
    val acc = Classifier.withScore(feats, "__f", m)
      .agg(avg((col("pred") === col("label")).cast("double"))).head().getDouble(0)
    val baseRate = docs.agg(avg(col("label").cast("double"))).head().getDouble(0)
    assert(acc >= 0.95, s"expected >= 0.95 accuracy, got $acc")
    assert(acc > baseRate, s"must beat all-positive base rate $baseRate, got $acc")
    docs.unpersist()
  }

  test("calibrationReport: hand-checked bins, top-bin clamp, NULL exclusion") {
    val df = Seq(
      (Some(0.05), Some(0)), (Some(0.05), Some(1)),   // bin 0
      (Some(0.5), Some(0)),                           // bin 5
      (Some(0.95), Some(1)), (Some(1.0), Some(1)),    // bin 9 (1.0 clamps)
      (None: Option[Double], Some(1)), (Some(0.3), None: Option[Int])
    ).toDF("score", "label")
    val out = Classifier.calibrationReport(df, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(0L, 5L, 9L), "NULL score/label rows bin nowhere")
    assert(out(0L) == ((2L, 0.05, 0.5, -0.45)))
    assert(out(5L) == ((1L, 0.5, 0.0, 0.5)))
    assert(out(9L) == ((2L, 0.975, 1.0, -0.025)))
  }

  // shared planted multilingual frame: 4 Latin-script languages with
  // DISTINCTIVE ORTHOGRAPHY but (deliberately) zero stopwords — the
  // regime where the stopword-profile detector is blind but char
  // n-grams are unmistakable (ß/ü only in de, ç/œ only in fr, ñ only
  // in es, gh/th clusters in en)
  private val langVocab: Map[String, Vector[String]] = Map(
    "en" -> Vector("through", "thought", "knight", "bright", "world",
      "children", "strength", "weather", "brought", "enough"),
    "de" -> Vector("straße", "gemütlich", "schön", "zwischen", "mädchen",
      "größe", "übung", "müde", "fröhlich", "grüßen"),
    "fr" -> Vector("château", "déjà", "français", "œuvre", "garçon",
      "être", "forêt", "leçon", "début", "noël"),
    "es" -> Vector("niño", "mañana", "corazón", "pequeño", "señor",
      "año", "música", "montaña", "sueño", "español"))

  private def plantedLangFrame(docsPerLang: Int, wordsPerDoc: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = for {
      (lang, vocab) <- langVocab.toSeq.sortBy(_._1)
      i <- 0 until docsPerLang
    } yield {
      val words = Seq.fill(wordsPerDoc)(vocab(rnd.nextInt(vocab.size)))
      (s"${lang}_$i", words.mkString(" "), lang)
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("trained char-n-gram langid beats the stopword-profile path on short text") {
    val train = plantedLangFrame(docsPerLang = 50, wordsPerDoc = 6, seed = 3).cache()
    // eval = SHORT texts (2 words) — too short for stopword profiles
    val eval = plantedLangFrame(docsPerLang = 25, wordsPerDoc = 2, seed = 17)
    val m = Classifier.trainLangid(train, "text", "lang",
      dim = 512, nLo = 1, nHi = 3, iters = 20, lr = 4.0)
    assert(m.labels == IndexedSeq("de", "en", "es", "fr"), "sorted labels")
    val trained = Classifier.withLangid(eval, "text", m)
      .agg(avg((col("lang_pred") === col("lang")).cast("double")))
      .head().getDouble(0)
    val profile = graft.functions.TextFunctions
      .withDetectedLanguage(eval, col("text"), "lang_pred")
      .agg(avg((col("lang_pred") === col("lang")).cast("double")))
      .head().getDouble(0)
    assert(trained >= 0.99, s"trained langid must be near-perfect, got $trained")
    assert(trained > profile + 0.3,
      s"trained ($trained) must clearly beat stopword profiles ($profile) " +
        "on short stopword-free text")
    train.unpersist()
  }

  test("langid training and prediction are deterministic") {
    val train = plantedLangFrame(docsPerLang = 30, wordsPerDoc = 5, seed = 9).cache()
    val eval = plantedLangFrame(docsPerLang = 10, wordsPerDoc = 2, seed = 23)
    val m1 = Classifier.trainLangid(train, "text", "lang",
      dim = 256, nLo = 1, nHi = 3, iters = 10, lr = 4.0)
    val m2 = Classifier.trainLangid(train, "text", "lang",
      dim = 256, nLo = 1, nHi = 3, iters = 10, lr = 4.0)
    assert(m1.labels == m2.labels)
    val p1 = Classifier.withLangid(eval, "text", m1)
      .select("doc_id", "lang_pred").collect().map(r => (r.getString(0), r.getString(1))).sorted
    val p2 = Classifier.withLangid(eval, "text", m2)
      .select("doc_id", "lang_pred").collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(p1.sameElements(p2), "same data + seed => same predictions")
    train.unpersist()
  }

  test("langid prediction is a zero-shuffle, join-free projection") {
    val train = plantedLangFrame(docsPerLang = 20, wordsPerDoc = 5, seed = 5).cache()
    val m = Classifier.trainLangid(train, "text", "lang",
      dim = 128, nLo = 1, nHi = 2, iters = 5, lr = 4.0)
    val nodes = PlanWalk.executedNodes(Classifier.withLangid(train, "text", m))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "langid scoring must not shuffle")
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "langid scoring must not join")
    train.unpersist()
  }

  test("charNgramVector: whitespace normalization, zero vector, unit norm") {
    val df = Seq(("a", "straße  gemütlich"), ("b", "straße\tgemütlich"),
      ("c", ""), ("d", "   ")).toDF("id", "t")
    val out = df.select(col("id"),
      graft.functions.CharNgramVector.charNgramVector(col("t"), 64, 1, 3).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == out("b"), "tab vs double-space must normalize identically")
    assert(out("c").forall(_ == 0.0) && out("d").forall(_ == 0.0),
      "empty/all-whitespace => zero vector")
    val norm = math.sqrt(out("a").map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"unit L2 norm, got $norm")
  }

  test("scoring is a zero-shuffle projection (weights are plan literals)") {
    val df = Seq((Array(1.0f, 0.0f), 1), (Array(0.0f, 1.0f), 0)).toDF("vec", "label")
    val m = Classifier.trainLogReg(df, "vec", "label", iters = 5, lr = 1.0)
    val nodes = PlanWalk.executedNodes(Classifier.withScore(df, "vec", m))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "scoring must not shuffle")
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "scoring must not join")
  }
}
