package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic SCALE-UP synthesizer: replicate a testdata SF directory
 * `factor`× with key-remapped copies, so the scaling study can extend
 * past the largest driver-provided SF (sf0.1) without inventing a new
 * generator. `ScaleUp <inDir> <outDir> <factor>` writes `documents`,
 * `events` and `embeddings` (the tables the study queries read).
 *
 * Copy rules — chosen so each OPERATOR sees the same per-copy
 * structure it saw at the base SF, times `factor`:
 *
 *  - ids shift by `copy * (max(id) + 1)`: keys are remapped, so
 *    per-key history LENGTH is preserved while the key population
 *    grows `factor`× — exactly how real event logs scale;
 *  - `documents.text` in EVERY copy is token-PERMUTED by a
 *    hash-keyed pseudo-random permutation (tokens sorted by
 *    xxhash64(copy # position)): the token multiset — lengths,
 *    vocabulary, language/quality signals — is preserved, while word
 *    ORDER differs, so cross-copy texts are neither exact duplicates
 *    (md5 differs) nor 5-gram near-dups (random permutations share
 *    ~no shingles). Within-copy duplicate structure survives
 *    verbatim (same copy + same length = same permutation, so
 *    identical docs stay identical), keeping dup RATES
 *    scale-invariant. Hash keying is also why REPEATED scale-ups
 *    compose safely (sf0.1 → sf1 → sf10): the first cut used stride
 *    maps i -> i·s_k mod n, which COMMUTE — copies-of-copies
 *    collided and the measured exact-dup rate exploded to 72%;
 *    composed random permutations collide with probability ~1/n!;
 *  - `events` timestamps/values and `embeddings` vectors are copied
 *    unchanged: temporal density per key and vector geometry per id
 *    are what the operators' costs depend on.
 *
 * Everything is a projection over a union of `factor` reads — no
 * shuffle, deterministic output given the input.
 */
object ScaleUp {

  /** Pseudo-random permutation of the whitespace tokens, keyed by
    * (copy, position): tokens are tagged xxhash64("copy#pos") and
    * sorted by (hash, token). Same copy + same token count = same
    * permutation (within-copy dups survive); different copies — and
    * COMPOSITIONS of copies across repeated scale-ups — essentially
    * never coincide. Single-token and empty texts pass through. */
  private def permuteTokens(text: org.apache.spark.sql.Column, copy: Int) = {
    val toks = graft.functions.TextFunctions.whitespaceTokens(text)
    val n = size(toks)
    val keyed = transform(sequence(lit(0), n - 1), i =>
      struct(
        xxhash64(concat_ws("#", lit(copy.toString), i.cast("string"))).as("k"),
        element_at(toks, i + 1).as("t")))
    when(n > lit(1),
      array_join(transform(array_sort(keyed), x => x.getField("t")), " "))
      .otherwise(text)
  }

  /** One remapped copy of `df`: every column in `idCols` shifts by
    * `copy * offset(col)`; `textCol` (if set) is stride-permuted. */
  private def copyOf(df: DataFrame, copy: Int, idOffsets: Map[String, Long],
                     textCol: Option[String]): DataFrame = {
    val shifted = idOffsets.foldLeft(df) { case (d, (c, off)) =>
      d.withColumn(c, col(c) + lit(copy * off))
    }
    textCol match {
      case Some(t) =>
        // EVERY copy permutes, 0 included: with identity at copy 0, a
        // second scale-up's path (0, j) would equal path (j, 0) — nine
        // exact-dup copy pairs per level. Non-identity at every tag
        // makes composed paths distinct (random permutations neither
        // commute nor coincide).
        val permuted = shifted.withColumn(t,
          permuteTokens(col(t), copy))
        // keep the derived length column consistent with the new text
        if (permuted.columns.contains("n_chars"))
          permuted.withColumn("n_chars", length(col(t)).cast("long"))
        else permuted
      case _ => shifted
    }
  }

  private def scaleTable(spark: SparkSession, in: String, out: String,
                         factor: Int, idCols: Seq[String],
                         textCol: Option[String]): Long = {
    val base = spark.read.parquet(in)
    val offsets = idCols.map { c =>
      val mx = base.agg(max(col(c))).head()
      c -> (if (mx.isNullAt(0)) 1L else mx.getLong(0) + 1L)
    }.toMap
    val all = (0 until factor)
      .map(k => copyOf(base, k, offsets, textCol))
      .reduce(_ unionByName _)
    all.write.mode("overwrite").parquet(out)
    spark.read.parquet(out).count()
  }

  /** Scale all three study tables; returns their output row counts. */
  def run(spark: SparkSession, inDir: String, outDir: String,
          factor: Int): (Long, Long, Long) = {
    require(factor >= 1 && factor <= 100, "factor must be in [1, 100]")
    val n1 = scaleTable(spark, s"$inDir/documents.parquet",
      s"$outDir/documents.parquet", factor, Seq("doc_id"), Some("text"))
    val n2 = scaleTable(spark, s"$inDir/events.parquet",
      s"$outDir/events.parquet", factor, Seq("event_id", "user_id"), None)
    val n3 = scaleTable(spark, s"$inDir/embeddings.parquet",
      s"$outDir/embeddings.parquet", factor, Seq("vec_id"), None)
    (n1, n2, n3)
  }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorStr) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (n1, n2, n3) = run(spark, inDir, outDir, factorStr.toInt)
    println(s"""{"documents":$n1,"events":$n2,"embeddings":$n3,"factor":${factorStr.toInt}}""")
    spark.stop()
  }
}
