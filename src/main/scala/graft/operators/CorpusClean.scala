package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The flagship LLM-corpus cleaning pipeline: exact dedup -> language ID
 * -> quality scoring -> repetition filtering, composed from the
 * individual operators into ONE declarative plan (the C4/Gopher-style
 * preprocessing recipe as a single call).
 *
 * Plan shape at scale: the dedup windows on the 16-byte md5 fingerprint
 * (one shuffle), the repetition profile contributes its own
 * doc-id-keyed aggregate (one shuffle + a join back on doc_id), and
 * every other signal is a pure Column rewrite riding the same scan —
 * Catalyst fuses them into the projection. Nothing touches the driver;
 * filters push past the join to the deduped side.
 */
object CorpusClean {

  /**
   * @param langs              keep docs whose detected language is in this set
   * @param minQuality         keep docs with quality_score >= this (0-4)
   * @param maxTopBigramRatio  drop docs whose most frequent word bigram
   *                           exceeds this share (repetitive boilerplate)
   */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            langs: Seq[String] = Seq("en"),
            minQuality: Int = 3,
            maxTopBigramRatio: Double = 0.06): DataFrame = {
    val deduped = Dedup.exactDedup(docs, textCol, idCol, byFingerprint = true)
    // profile AFTER the dedup: the bigram explode+aggregate is the
    // pipeline's most expensive stage, and on the duplicate-heavy corpora
    // this pipeline exists for, profiling dropped duplicates is pure
    // waste (the kept doc's profile is identical)
    val rep = TextStats.repetitionProfile(deduped, idCol, textCol)
      .select(col("doc_id").as(idCol), col("top_bigram_ratio"))
    val quality = TextFunctions.qualityColumns(col(textCol)).toMap
    // langid is STAGED below the final projection (tokens + profile
    // scores once per row — see withDetectedLanguage); the quality
    // columns ride the same final projection as before
    TextFunctions.withDetectedLanguage(deduped.join(rep, idCol),
        col(textCol), "detected_lang")
      .select(
        col(idCol).as("doc_id"),
        quality("n_tokens").as("n_tokens"),
        col("detected_lang"),
        quality("quality_score").as("quality_score"),
        col("top_bigram_ratio"))
      .filter(col("detected_lang").isin(langs: _*) &&
        col("quality_score") >= minQuality &&
        col("top_bigram_ratio") <= maxTopBigramRatio)
  }
}
