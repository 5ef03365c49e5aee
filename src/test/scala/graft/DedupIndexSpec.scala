package graft

import graft.operators.{Dedup, DedupIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r7 #1: the persisted-index artifacts must make delta runs
  * O(batch) — row-identical to the live `*Against` operators, with the
  * corpus never re-shingled / re-bucketed / re-assigned (plan-asserted:
  * no ShingleHashes outside the new batch, no scan of the corpus
  * parquet in the delta plan). */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpusPath = "/root/testdata/sf0.001/documents.parquet"
  private lazy val docs = spark.read.parquet(corpusPath)
  private lazy val newDocs = docs.filter(col("doc_id") >= 400)
  private lazy val oldDocs = docs.filter(col("doc_id") < 400)

  private lazy val indexPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_dedup_index").toString
    DedupIndex.build(oldDocs, "doc_id", "text", p,
      n = 5, dfCap = 100, numPerm = 64, bands = 32)
    p
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("index artifact params round-trip; tables are consistent with each other") {
    val p = DedupIndex.params(spark, indexPath)
    assert(p == DedupIndex.Params(5, 100, 64, 32))
    val sh = spark.read.parquet(s"$indexPath/shingles")
    assert(sh.count() == oldDocs.count())
    // postings never exceed the df cap, and every posting id has shingles
    val maxDf = spark.read.parquet(s"$indexPath/postings")
      .groupBy("__g").count().agg(max("count")).head().getLong(0)
    assert(maxDf <= 100L)
    assert(spark.read.parquet(s"$indexPath/fingerprints").count() ==
      oldDocs.select(md5(col("text"))).distinct().count())
  }

  test("exact delta from the index is row-identical to the live operator") {
    assert(rows(DedupIndex.exactDedupAgainst(newDocs, "text", indexPath)) ==
      rows(Dedup.exactDedupAgainst(newDocs, oldDocs, "text")))
  }

  test("ngram delta from the index is row-identical to the live operator") {
    val live = Dedup.ngramJaccardPairsAgainst(newDocs, oldDocs, "doc_id", "text",
      n = 5, threshold = 0.5, dfCap = 100)
    val indexed = DedupIndex.ngramJaccardPairsAgainst(newDocs, "doc_id", "text",
      indexPath, threshold = 0.5)
    assert(rows(indexed) == rows(live))
    assert(indexed.count() > 0, "split corpus must actually contain cross-set near-dups")
  }

  test("minhash delta from the index is row-identical to the live operator") {
    val live = Dedup.minhashLshPairsAgainst(newDocs, oldDocs, "doc_id", "text",
      n = 5, threshold = 0.5, numPerm = 64, bands = 32)
    val indexed = DedupIndex.minhashLshPairsAgainst(newDocs, "doc_id", "text",
      indexPath, threshold = 0.5)
    assert(rows(indexed) == rows(live))
    // truncation flavor: same cap, same result as the live capped run
    val liveCapped = Dedup.minhashLshPairsAgainst(newDocs, oldDocs, "doc_id", "text",
      n = 5, threshold = 0.5, numPerm = 64, bands = 32, indexBucketCap = Some(3))
    val indexedCapped = DedupIndex.minhashLshPairsAgainst(newDocs, "doc_id", "text",
      indexPath, threshold = 0.5, indexBucketCap = Some(3))
    assert(rows(indexedCapped) == rows(liveCapped))
  }

  test("bucketed-table index: row-identical to the parquet artifact; " +
    "index side joins shuffle-free (plan-asserted)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prefix = "graft_didx"
    DedupIndex.buildTables(oldDocs, "doc_id", "text", prefix, buckets = 8,
      n = 5, dfCap = 100, numPerm = 64, bands = 32)
    assert(DedupIndex.paramsFromTables(spark, prefix) ==
      DedupIndex.Params(5, 100, 64, 32))
    // broadcast would erase the partitioning question entirely on these
    // tiny test tables — pin the shuffle-based plan the 100 TB case gets
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ngramT = DedupIndex.ngramJaccardPairsAgainstTables(
        newDocs, "doc_id", "text", prefix)
      assert(rows(ngramT) == rows(DedupIndex.ngramJaccardPairsAgainst(
        newDocs, "doc_id", "text", indexPath)))
      val mhT = DedupIndex.minhashLshPairsAgainstTables(
        newDocs, "doc_id", "text", prefix)
      assert(rows(mhT) == rows(DedupIndex.minhashLshPairsAgainst(
        newDocs, "doc_id", "text", indexPath)))
      assert(rows(DedupIndex.exactDedupAgainstTables(newDocs, "text", prefix)) ==
        rows(DedupIndex.exactDedupAgainst(newDocs, "text", indexPath)))
      // the scale claim: the blocking join consumes the index table's
      // bucketing in place — bucketed scan present, and the path from
      // that scan UP TO ITS FIRST JOIN crosses no shuffle exchange
      // (shuffles above the join are the joined result's business;
      // only the O(batch) probe side may be exchanged before it)
      for ((df, table) <- Seq((ngramT, s"${prefix}_postings"),
                              (mhT, s"${prefix}_bands"))) {
        val root = { df.queryExecution.toRdd.count(); df.queryExecution.executedPlan }
        val nodes = PlanWalk.subtree(root)
        val indexScans = nodes.collect {
          case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == table) => f
        }
        assert(indexScans.nonEmpty, s"no scan of $table in the plan")
        assert(indexScans.forall(_.bucketedScan), s"scan of $table not bucketed")
        indexScans.foreach { scan =>
          val path = PlanWalk.pathTo(root, scan)
            .getOrElse(fail(s"scan of $table unreachable from the plan root"))
          val belowJoin = path.reverse.takeWhile(
            !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
          assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeLike]),
            s"index table $table was shuffled before its blocking join:\n" +
              belowJoin.map(_.nodeName).mkString(" <- "))
        }
        assert(nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
          "expected the probe side to shuffle (bucketed join, not broadcast)")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("bucketed-table ANN index: row-identical to the parquet artifact; " +
    "index side joins shuffle-free (plan-asserted)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 40)
    val prefix = "graft_aidx"
    val p = java.nio.file.Files.createTempDirectory("graft_ann_pq").toString
    Similarity.buildAnnIndex(emb, "vec_id", "embedding", p,
      tables = 12, planes = 6, dim = 64, nCentroids = 16)
    Similarity.buildAnnIndexTables(emb, "vec_id", "embedding", prefix, buckets = 8,
      tables = 12, planes = 6, dim = 64, nCentroids = 16)
    assert(Similarity.annIndexParamsFromTables(spark, prefix) ==
      Similarity.annIndexParams(spark, p))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val srpT = Similarity.annTopKAgainstIndexTables(queries, "vec_id", "embedding",
        prefix, k = 5)
      assert(rows(srpT) == rows(Similarity.annTopKAgainstIndex(queries, "vec_id",
        "embedding", p, k = 5)))
      val ivfT = Similarity.ivfTopKAgainstIndexTables(queries, "vec_id", "embedding",
        prefix, k = 5)
      assert(rows(ivfT) == rows(Similarity.ivfTopKAgainstIndex(queries, "vec_id",
        "embedding", p, k = 5)))
      // blocking-side tables are consumed against their bucketing: no
      // exchange between an index-table scan and its first join; the
      // running-count hot-cell guard rides the same bucketing
      for ((df, table) <- Seq((srpT, s"${prefix}_srp_buckets"),
                              (ivfT, s"${prefix}_assignments"),
                              (ivfT, s"${prefix}_vectors"))) {
        val root = { df.queryExecution.toRdd.count(); df.queryExecution.executedPlan }
        val nodes = PlanWalk.subtree(root)
        val indexScans = nodes.collect {
          case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == table) => f
        }
        assert(indexScans.nonEmpty, s"no scan of $table in the plan")
        assert(indexScans.forall(_.bucketedScan), s"scan of $table not bucketed")
        indexScans.foreach { scan =>
          val path = PlanWalk.pathTo(root, scan)
            .getOrElse(fail(s"scan of $table unreachable from the plan root"))
          val belowJoin = path.reverse.takeWhile(
            !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
          assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeLike]),
            s"index table $table was shuffled before its join:\n" +
              belowJoin.map(_.nodeName).mkString(" <- "))
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("delta plan never re-shingles or re-scans the corpus (O(batch), not O(corpus))") {
    val indexed = DedupIndex.ngramJaccardPairsAgainst(newDocs, "doc_id", "text",
      indexPath, threshold = 0.5)
    val nodes = PlanWalk.executedNodes(indexed)
    // the new batch IS shingled live (that is the O(batch) part)...
    val shingleExprs = nodes.flatMap(_.expressions).flatMap(_.collect {
      case s: graft.functions.ShingleHashes => s
    })
    assert(shingleExprs.nonEmpty)
    // ...and every scan target is either the index artifact or the
    // documents parquet (for the new batch)
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val scanned = scans.flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(scanned.nonEmpty)
    assert(scanned.forall(p => p.contains(indexPath) || p.contains(corpusPath)),
      s"unexpected scan targets: $scanned")
    // every documents-parquet scan carries the new-batch pushdown
    // (doc_id >= 400): the HISTORICAL docs are never read, so nothing
    // can re-shingle them — the corpus shingle sets come from shingles/
    val corpusScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains(corpusPath)))
    assert(corpusScans.nonEmpty)
    assert(corpusScans.forall(_.dataFilters.exists(_.toString.contains(">= 400"))),
      s"historical corpus rows reachable by a scan: " +
        corpusScans.map(_.dataFilters.mkString(",")).mkString(" | "))
  }

  test("append(build(A), B) is query-identical to build(A union B)") {
    val a = docs.filter(col("doc_id") < 300)
    val b = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val appended = java.nio.file.Files.createTempDirectory("graft_didx_app").toString
    DedupIndex.build(a, "doc_id", "text", appended,
      n = 5, dfCap = 100, numPerm = 64, bands = 32)
    DedupIndex.append(b, "doc_id", "text", appended)
    // the rebuilt reference over A ∪ B is the suite's standing indexPath
    // (built over docs < 400); params must survive the append untouched
    assert(DedupIndex.params(spark, appended) ==
      DedupIndex.params(spark, indexPath))
    // all three delta flavors, row-identical between append and rebuild
    assert(rows(DedupIndex.exactDedupAgainst(newDocs, "text", appended)) ==
      rows(DedupIndex.exactDedupAgainst(newDocs, "text", indexPath)))
    val mhApp = DedupIndex.minhashLshPairsAgainst(newDocs, "doc_id", "text",
      appended, threshold = 0.5)
    assert(rows(mhApp) == rows(DedupIndex.minhashLshPairsAgainst(
      newDocs, "doc_id", "text", indexPath, threshold = 0.5)))
    assert(mhApp.count() > 0, "the split must actually exercise near-dup pairs")
    // ngram too: no shingle crosses the df-cap on this corpus (max df 2),
    // so the documented cap-crossing divergence cannot engage and the
    // appended postings equal a fresh build's
    assert(rows(DedupIndex.ngramJaccardPairsAgainst(newDocs, "doc_id", "text",
      appended, threshold = 0.5)) ==
      rows(DedupIndex.ngramJaccardPairsAgainst(newDocs, "doc_id", "text",
        indexPath, threshold = 0.5)))
    // the fingerprint table stays set-equivalent (append allows physical
    // duplicates across batches; the anti-join cannot see them)
    assert(spark.read.parquet(s"$appended/fingerprints").distinct().count() ==
      spark.read.parquet(s"$indexPath/fingerprints").count())
  }

  test("compact restores fresh-build semantics after cap crossings and retried appends") {
    val sess = spark
    import sess.implicits._
    // bigram "alpha beta" df: 2 at build (== cap, kept), 3 after the
    // append (> cap) — the documented crossing where appended postings
    // keep their stored rows and diverge from a fresh build
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "alpha beta eta theta")).toDF("doc_id", "text")
    val probe = Seq((10L, "alpha beta gamma iota")).toDF("doc_id", "text")
    val appended = java.nio.file.Files.createTempDirectory("graft_didx_cmp_a").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("graft_didx_cmp_r").toString
    DedupIndex.build(a, "doc_id", "text", appended,
      n = 2, dfCap = 2, numPerm = 16, bands = 8)
    DedupIndex.append(b, "doc_id", "text", appended)
    DedupIndex.append(b, "doc_id", "text", appended) // crash-retried append
    DedupIndex.build(a.unionAll(b), "doc_id", "text", rebuilt,
      n = 2, dfCap = 2, numPerm = 16, bands = 8)
    def cand(path: String) = rows(DedupIndex.ngramJaccardPairsAgainst(
      probe, "doc_id", "text", path, threshold = 0.0))
    // pre-compact: candidate SUPERSET via the crossed shingle's stored rows
    assert(cand(appended) != cand(rebuilt))
    DedupIndex.compact(spark, appended)
    assert(DedupIndex.params(spark, appended) ==
      DedupIndex.params(spark, rebuilt))
    // post-compact: every delta flavor row-identical to the fresh build
    assert(cand(appended) == cand(rebuilt))
    assert(rows(DedupIndex.exactDedupAgainst(probe, "text", appended)) ==
      rows(DedupIndex.exactDedupAgainst(probe, "text", rebuilt)))
    assert(rows(DedupIndex.minhashLshPairsAgainst(probe, "doc_id", "text",
      appended, threshold = 0.0)) ==
      rows(DedupIndex.minhashLshPairsAgainst(probe, "doc_id", "text",
        rebuilt, threshold = 0.0)))
    // the retried append's duplicate rows are physically healed too
    for (t <- Seq("fingerprints", "shingles", "bands", "postings"))
      assert(spark.read.parquet(s"$appended/$t").count() ==
        spark.read.parquet(s"$rebuilt/$t").count(), t)
  }

  test("ANN append: SRP row-identical to rebuild; IVF finds appended vectors; " +
    "tightness kept from build") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.filter(col("vec_id") < 400)
    val b = emb.filter(col("vec_id") >= 400)
    val queries = emb.filter(col("vec_id") < 40)
    val appended = java.nio.file.Files.createTempDirectory("graft_ann_app").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("graft_ann_reb").toString
    Similarity.buildAnnIndex(a, "vec_id", "embedding", appended,
      tables = 12, planes = 6, dim = 64, nCentroids = 16)
    val builtParams = Similarity.annIndexParams(spark, appended)
    Similarity.appendAnnIndex(b, "vec_id", "embedding", appended)
    Similarity.buildAnnIndex(emb, "vec_id", "embedding", rebuilt,
      tables = 12, planes = 6, dim = 64, nCentroids = 16)
    // meta (incl. build-time tightness) untouched by the append: probe
    // auto-sizing decisions cannot flip
    assert(Similarity.annIndexParams(spark, appended) == builtParams)
    // SRP path: fixed-seed hyperplanes + per-row tables make the
    // appended artifact QUERY-IDENTICAL to a fresh build over the union
    assert(rows(Similarity.annTopKAgainstIndex(queries, "vec_id", "embedding",
      appended, k = 5)) ==
      rows(Similarity.annTopKAgainstIndex(queries, "vec_id", "embedding",
        rebuilt, k = 5)))
    // IVF path: every appended vector is indexed (assigned to an
    // EXISTING cell) and reachable by search — quantization drift vs a
    // re-drawn rebuild is the documented tradeoff, not row-identity
    assert(spark.read.parquet(s"$appended/assignments").count() == emb.count())
    val ivfHits = Similarity.ivfTopKAgainstIndex(queries, "vec_id", "embedding",
      appended, k = 5)
    assert(ivfHits.filter(col("neighbor_id") >= 400).count() > 0,
      "appended vectors must be findable through the inverted file")
  }

  test("ANN index: SRP and IVF delta search row-identical to the live operators") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 40)
    val p = java.nio.file.Files.createTempDirectory("graft_ann_index").toString
    Similarity.buildAnnIndex(emb, "vec_id", "embedding", p,
      tables = 12, planes = 6, dim = 64, nCentroids = 16)
    val params = Similarity.annIndexParams(spark, p)
    assert(params.copy(tightness = -1.0) == Similarity.AnnIndexParams(12, 6, 64, 16))
    // random testdata embeddings must measure far below the clustered
    // threshold, so auto-sizing takes the worst-case floor on BOTH paths
    assert(params.tightness >= 0.0 && params.tightness < 0.75,
      s"expected near-random build-time tightness, got ${params.tightness}")
    val srpLive = Similarity.annTopKAgainst(queries, emb, "vec_id", "embedding",
      k = 5, tables = 12, planes = 6, dim = 64)
    val srpIndexed = Similarity.annTopKAgainstIndex(queries, "vec_id", "embedding",
      p, k = 5)
    assert(rows(srpIndexed) == rows(srpLive))
    val ivfLive = Similarity.ivfTopKAgainst(queries, emb, "vec_id", "embedding",
      k = 5, nCentroids = 16, nprobe = 6)
    val ivfIndexed = Similarity.ivfTopKAgainstIndex(queries, "vec_id", "embedding",
      p, k = 5, nprobe = 6)
    assert(rows(ivfIndexed) == rows(ivfLive))
    // auto-sized probes derive from the artifact's REQUESTED centroid
    // count with the live path's formula
    val ivfLiveAuto = Similarity.ivfTopKAgainst(queries, emb, "vec_id", "embedding",
      k = 5, nCentroids = 16)
    val ivfIndexedAuto = Similarity.ivfTopKAgainstIndex(queries, "vec_id", "embedding",
      p, k = 5)
    assert(rows(ivfIndexedAuto) == rows(ivfLiveAuto))
  }
}
