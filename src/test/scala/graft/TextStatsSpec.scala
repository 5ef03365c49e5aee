package graft

import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionProfile computes hand-checked ratios") {
    // words: a b a b c -> 5 words, 3 distinct -> dwr 0.6
    // bigrams: "a b","b a","a b","b c" -> 4 total, 3 distinct, top=2
    val docs = Seq((1L, "a b a b c"), (2L, "x y z w")).toDF("doc_id", "text")
    val out = TextStats.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_bigrams") == 4L)
    assert(r1.getAs[Double]("distinct_bigram_ratio") == 0.75)
    assert(r1.getAs[Double]("top_bigram_ratio") == 0.5)
    assert(r1.getAs[Double]("distinct_word_ratio") == 0.6)
    val r2 = out(2L) // no repetition at all
    assert(r2.getAs[Double]("distinct_bigram_ratio") == 1.0 &&
      r2.getAs[Double]("distinct_word_ratio") == 1.0)
  }

  test("repetitive boilerplate scores measurably worse than varied text") {
    val docs = Seq(
      (1L, Seq.fill(30)("click here to subscribe").mkString(" ")),
      (2L, "the quick brown fox jumps over the lazy dog while autumn leaves drift past")
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("top_bigram_ratio")).toMap
    assert(out(1L) > 0.2 && out(2L) < 0.1)
  }

  test("repetitionProfile skips docs with fewer than two words instead of crashing") {
    // sequence(1, 0) in Spark is DESCENDING [1, 0] and element_at(_, 0)
    // throws — single-word docs must take the empty-bigram guard
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    val out = TextStats.repetitionProfile(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(3L)) // bigram-less docs absent, like the SQL oracle
  }

  test("native repetitionProfile equals the declarative explode formulation on every sf0.01 doc") {
    // value oracle for the BigramProfile expression: row-identical output
    // (exact doubles — both sides divide the same exact integer counts)
    // on the full corpus, including multi-space runs and edge docs
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
      .unionAll(Seq((90001L, "a  b   c a  b"), (90002L, " leading two"),
        (90003L, "trailing two "), (90004L, ""), (90005L, "solo"))
        .toDF("doc_id", "text"))
    val native = TextStats.repetitionProfile(docs, "doc_id", "text")
    val ref = TextStats.repetitionProfileReference(docs, "doc_id", "text")
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
      "native vs reference repetition profile mismatch")
    assert(native.count() == ref.count())
  }

  test("repetitionProfile is shuffle-free and CorpusClean shuffles exactly once (plan-asserted)") {
    // pins the scale claims on the executed plan tree (shared PlanWalk
    // helper): per-doc stats ride one codegen'd projection — zero
    // exchanges — and the whole clean pipeline's only shuffle is the
    // md5 dedup window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(PlanWalk.shuffleCount(TextStats.repetitionProfile(docs, "doc_id", "text")) == 0,
      "repetitionProfile must not shuffle")
    assert(PlanWalk.shuffleCount(graft.operators.CorpusClean.clean(docs, "doc_id", "text")) == 1,
      "CorpusClean must shuffle exactly once (the md5 dedup window)")
  }

  test("packSequences assigns docs to token-budget sequences per shard") {
    // one shard; docs of 4,4,4 tokens with budget 10:
    // offsets 0,4,8 -> seq 0,0,0 ... wait 8+4 crosses: doc starts at 8 -> seq 0
    // doc at offset 12 -> seq 1
    val docs = Seq(
      (0L, "a b c d"), (8L, "e f g h"), (16L, "i j k l"), (24L, "m n o p"))
      .toDF("doc_id", "text") // all ids % 1 == 0 -> one shard
    val out = graft.operators.TextStats.packSequences(docs, "doc_id", "text",
      budget = 10, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0, 0L, 0L),   // tokens 0-3   -> seq 0
      (8L, 0, 0L, 4L),   // tokens 4-7   -> seq 0
      (16L, 0, 0L, 8L),  // starts at 8  -> seq 0 (crosses the boundary)
      (24L, 0, 1L, 12L)) // starts at 12 -> seq 1
    )
  }

  test("chunkDocuments splits by token windows with overlap, hand-checked") {
    // 10 tokens, maxTokens=4, overlap=1 -> step=3, nc=ceil((10-1)/3)=3
    // chunks: [t0..t3], [t3..t6], [t6..t9]
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = TextStats.chunkDocuments(docs, "doc_id", "text",
        maxTokens = 4, overlap = 1)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0, "t0 t1 t2 t3", 4L),
      (1, "t3 t4 t5 t6", 4L),
      (2, "t6 t7 t8 t9", 4L)))
  }

  test("chunkDocuments covers every token, overlaps correctly, and keeps " +
    "short/empty docs as one chunk") {
    val docs = Seq(
      (1L, "a b c"),          // under budget -> one chunk, itself
      (2L, ""),               // empty -> one empty chunk
      (3L, "  \t  "),         // whitespace-only -> one empty chunk
      (4L, (0 until 100).map(i => s"w$i").mkString(" "))) // 100 tokens
      .toDF("doc_id", "text")
    val out = TextStats.chunkDocuments(docs, "doc_id", "text",
      maxTokens = 16, overlap = 4)
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(byDoc(1L).map(r => (r.getString(2), r.getLong(3))).toSeq ==
      Seq(("a b c", 3L)))
    assert(byDoc(2L).map(_.getString(2)).toSeq == Seq(""))
    assert(byDoc(3L).map(_.getString(2)).toSeq == Seq(""))
    // 100 tokens, step 12 -> ceil(96/12) = 8 chunks; last starts at 84
    val big = byDoc(4L).sortBy(_.getInt(1))
    assert(big.length == 8)
    assert(big.last.getString(2).startsWith("w84 ") && big.last.getLong(3) == 16L)
    // consecutive chunks share exactly `overlap` tokens
    big.sliding(2).foreach { case Array(a, b) =>
      val at = a.getString(2).split(" ").toSeq
      val bt = b.getString(2).split(" ").toSeq
      assert(at.takeRight(4) == bt.take(4))
    }
    // reassembly: dropping each chunk's leading overlap (after the
    // first) reconstructs the doc exactly — nothing dropped, nothing
    // duplicated
    val rebuilt = (big.head.getString(2) +: big.tail.map(
      _.getString(2).split(" ").drop(4).mkString(" "))).mkString(" ")
    assert(rebuilt == (0 until 100).map(i => s"w$i").mkString(" "))
    // zero-shuffle claim
    assert(PlanWalk.shuffleCount(TextStats.chunkDocuments(
      docs, "doc_id", "text", maxTokens = 16, overlap = 4)) == 0)
  }

  test("packSequences ffd: no-split first-fit-decreasing beats greedy padding") {
    import graft.operators.TextStats
    // planted sizes (budget 10): chop-free packing comparison
    val sizes = Seq(9, 8, 2, 1, 6, 4)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextStats.packSequences(docs, "doc_id", "text",
        budget = 10, shards = 1, strategy = "ffd")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // token conservation: every doc exactly once, sizes intact
    assert(out.map(_._1).sorted.toSeq == (0L until 6L).toSeq)
    assert(out.map(r => r._1 -> r._5).toMap ==
      sizes.zipWithIndex.map { case (n, i) => i.toLong -> n.toLong }.toMap)
    // NO doc splits and NO sequence overflows
    val byBin = out.groupBy(_._3)
    byBin.values.foreach { rows =>
      assert(rows.map(_._5).sum <= 10L, "sequence over budget")
      // offsets are a contiguous id-ordered layout
      val inOrder = rows.sortBy(_._1)
      var off = 0L
      inOrder.foreach { r => assert(r._4 == off, s"offset gap in $rows"); off += r._5 }
    }
    // FFD packs [9,8,2,1,6,4] into 3 full bins (waste 0); greedy
    // next-fit in id order needs 4 bins with waste 10
    assert(byBin.size == 3, s"FFD must reach the optimal 3 bins, got ${byBin.size}")
    def greedyNextFitBins(xs: Seq[Int], budget: Int): Seq[Int] = {
      var bins = List.empty[Int]
      xs.foreach { n =>
        bins match {
          case h :: t if h + n <= budget => bins = (h + n) :: t
          case _ => bins = n :: bins
        }
      }
      bins
    }
    val greedyWaste = greedyNextFitBins(sizes, 10).map(10 - _).sum
    val ffdWaste = byBin.values.map(rows => 10L - rows.map(_._5).sum).sum
    assert(ffdWaste < greedyWaste,
      s"ffd waste $ffdWaste must beat greedy $greedyWaste")
  }

  test("packSequences ffd: oversized docs isolate; empty docs still place") {
    import graft.operators.TextStats
    val docs = Seq(
      (0L, Seq.fill(25)("w").mkString(" ")), // oversized (budget 10)
      (1L, ""),                              // empty
      (2L, Seq.fill(10)("w").mkString(" "))  // exactly full
    ).toDF("doc_id", "text")
    val out = TextStats.packSequences(docs, "doc_id", "text",
        budget = 10, shards = 1, strategy = "ffd")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(out(0L)._2 == 25L)
    // the oversized doc's sequence contains ONLY it — even the empty
    // doc (need 0) must not join a poisoned bin
    val binOfOversized = out(0L)._1
    assert(out.count { case (_, (b, _)) => b == binOfOversized } == 1)
    assert(out.contains(1L), "empty doc still gets an address")
  }

  test("packSequences ffd: NULL id and NULL text neither crash nor corrupt offsets") {
    import graft.operators.TextStats
    val docs = Seq(
      (java.lang.Long.valueOf(7L), "a b c"),
      (null.asInstanceOf[java.lang.Long], "x y"),     // NULL id -> shard 0
      (java.lang.Long.valueOf(9L), null.asInstanceOf[String]) // NULL text -> 0 tokens
    ).toDF("doc_id", "text")
    val out = TextStats.packSequences(docs, "doc_id", "text",
        budget = 10, shards = 2, strategy = "ffd").collect()
    assert(out.length == 3, "all rows addressed, none crashed away")
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(4) >= 0L),
      "offsets and token counts must never go negative")
    val nullText = out.find(r => !r.isNullAt(0) && r.getLong(0) == 9L).get
    assert(nullText.getLong(4) == 0L, "NULL text packs as zero tokens")
  }

  test("packSequences shards deterministically and bounds each window partition") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.operators.TextStats.packSequences(docs, "doc_id", "text",
      budget = 256, shards = 4)
    assert(out.select("shard").distinct().count() == 4)
    // every doc appears exactly once, offsets strictly increase per shard
    assert(out.count() == docs.count())
    val bad = out.alias("a").join(out.alias("b"),
      col("a.shard") === col("b.shard") && col("a.doc_id") < col("b.doc_id") &&
        col("a.tok_offset") >= col("b.tok_offset") + col("b.n_tokens"))
    assert(bad.isEmpty)
  }

  test("packSequences auto-sizes shards from corpus token volume (shards <= 0)") {
    // VERDICT r7 #2: a fixed shard count silently unbounds per-shard
    // window input as the corpus grows. 120 docs x 10 tokens = 1200
    // tokens at a 100-token/shard target must yield ceil(1200/100) = 12
    // shards, each window partition holding <= the target...
    val docs = (0L until 120L).map(i => (i, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"))
      .toDF("doc_id", "text")
    val auto = graft.operators.TextStats.packSequences(docs, "doc_id", "text",
      budget = 64, shards = 0, targetTokensPerShard = 100L)
    assert(auto.select("shard").distinct().count() == 12)
    val maxShardTokens = auto.groupBy("shard").agg(sum("n_tokens").as("t"))
      .agg(max("t")).head().getLong(0)
    assert(maxShardTokens <= 100L, s"auto-sizing left $maxShardTokens tokens in one shard")
    // ...where a fixed shards=1 would put all 1200 through ONE partition
    val fixed = graft.operators.TextStats.packSequences(docs, "doc_id", "text",
      budget = 64, shards = 1)
    assert(fixed.groupBy("shard").agg(sum("n_tokens").as("t"))
      .agg(max("t")).head().getLong(0) == 1200L)
    // empty corpus: auto-sizing degrades to 1 shard, no divide-by-zero
    assert(graft.operators.TextStats.packSequences(docs.filter(lit(false)),
      "doc_id", "text", budget = 64, shards = 0).isEmpty)
  }

  test("packSequences shards string ids by hash instead of collapsing to one NULL shard") {
    import spark.implicits._
    val docs = (0 until 200).map(i => (s"doc-$i", "some words here okay")).toDF("id", "text")
    val packed = graft.operators.TextStats.packSequences(docs, "id", "text",
      budget = 16, shards = 8)
    val shardRows = packed.select("shard").distinct().collect()
    assert(shardRows.forall(!_.isNullAt(0)), "no NULL shard for string ids")
    assert(shardRows.length > 4,
      s"string ids must spread across shards, got ${shardRows.mkString(",")}")
    assert(packed.count() == 200)
    // numeric ids keep the plain modulo (the DuckDB-matchable contract)
    val num = (0 until 20).map(i => (i.toLong, "w x y z")).toDF("id", "text")
    val numShards = graft.operators.TextStats.packSequences(num, "id", "text", 16, 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((0 until 20).forall(i => numShards(i.toLong) == i % 8))
  }

  test("CorpusClean drops duplicates, boilerplate, wrong-language and junk docs") {
    val good = "the house and the garden were quiet that morning and the light was very good"
    val docs = Seq(
      (1L, good),                                           // keeps
      (2L, good),                                           // exact dup of 1 -> dropped
      (3L, Seq.fill(20)("buy now buy now").mkString(" ")),  // repetitive -> dropped
      (4L, "der hund und die katze waren nicht in dem haus und das war auch gut"), // de
      (5L, "zz qq xx vv ww")                                // junk: low quality
    ).toDF("doc_id", "text")
    val kept = graft.operators.CorpusClean.clean(docs, "doc_id", "text",
      langs = Seq("en"), minQuality = 3, maxTopBigramRatio = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("vocabulary counts whitespace tokens with a minCount floor") {
    val docs = Seq((1L, "a a  b"), (2L, "a c b"), (3L, "")).toDF("doc_id", "text")
    val v = TextStats.vocabulary(docs, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("a" -> 3L, "b" -> 2L)) // c is a hapax, floored out
    val all = TextStats.vocabulary(docs, "text", minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("vocabCoverage reconstructs the minimal prefix from the count histogram") {
    // counts: a=4 b=2 c=1 d=1, total 8
    val docs = Seq((1L, "a a a a b b c d")).toDF("doc_id", "text")
    val out = TextStats.vocabCoverage(docs, "text", Seq(50, 90, 99))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 50%: 'a' alone (4/8 exactly); 90%/99%: all four tokens (7/8 < both)
    assert(out == Map(50 -> ((1L, 4L)), 90 -> ((4L, 8L)), 99 -> ((4L, 8L))),
      out.toString)
    // crossing INSIDE a count group: b and c interchangeable at cnt 2
    // counts: a=4 b=2 c=2, total 8; 75% -> needs cum 6 -> a + one of {b,c}
    val docs2 = Seq((1L, "a a a a b b c c")).toDF("doc_id", "text")
    val out2 = TextStats.vocabCoverage(docs2, "text", Seq(75))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out2 == Map(75 -> ((2L, 6L))), out2.toString)
  }

  test("bpePairCounts weights adjacent char pairs by token occurrences") {
    // vocab: "ab" x2, "abc" x1 -> pairs ab: 2+1=3, bc: 1
    val docs = Seq((1L, "ab abc"), (2L, "ab")).toDF("doc_id", "text")
    val all = TextStats.bpePairCounts(docs, "text", minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("ab" -> 3L, "bc" -> 1L), all.toString)
    // minCount floors the tail; single-char tokens contribute nothing
    val floored = TextStats.bpePairCounts(docs, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(floored == Map("ab" -> 3L))
  }

  test("stopwords mines tokens by distinct-document frequency") {
    val docs = Seq((1L, "x y"), (2L, "x z"), (3L, "x x"), (4L, null))
      .toDF("doc_id", "text")
    // x in 3 of 4 docs (75%); repeated occurrences count once
    val at50 = TextStats.stopwords(docs, "doc_id", "text", minDocPct = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(at50 == Map("x" -> 3L), at50.toString)
    assert(TextStats.stopwords(docs, "doc_id", "text", minDocPct = 75)
      .count() == 1L) // 100*3 >= 75*4 exactly
    assert(TextStats.stopwords(docs, "doc_id", "text", minDocPct = 80)
      .count() == 0L) // null-text doc still counts toward n_docs
  }

  test("unigramLogProbScoreAgainst scores with the REFERENCE corpus frequencies") {
    // reference tokens: a a b | a c -> total 5, vocab (minCount=2) = {a: 3}
    val ref = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b"), (11L, "z"), (12L, "a a z"), (13L, ""))
      .toDF("doc_id", "text")
    val out = TextStats.unigramLogProbScoreAgainst(docs, "doc_id", "text",
      ref, "text", minCount = 2L).collect().map(r => r.getLong(0) -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpA = math.log10(3.0 / 5); val lpFloor = math.log10(2.0 / 5)
    assert(out(10L).getAs[Long]("n_tokens") == 2L)
    assert(out(10L).getAs[Double]("mean_logprob") == r6((lpA + lpFloor) / 2))
    // token unseen in the reference floors, b (ref count 1 < minCount) floors too
    assert(out(11L).getAs[Double]("mean_logprob") == r6(lpFloor))
    assert(out(12L).getAs[Double]("mean_logprob") == r6((2 * lpA + lpFloor) / 3))
    assert(out(13L).getAs[Long]("n_tokens") == 0L &&
      out(13L).isNullAt(out(13L).fieldIndex("mean_logprob")))
  }

  test("unigramLogProbScore matches the hand formula with a rare-token floor") {
    // corpus tokens: a a b | a c -> total 5; counts a=3 b=1 c=1;
    // minCount=2 keeps only 'a'; floor p = 2/5
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "")).toDF("doc_id", "text")
    val out = TextStats.unigramLogProbScore(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpA = math.log10(3.0 / 5); val lpFloor = math.log10(2.0 / 5)
    assert(out(1L).getAs[Long]("n_tokens") == 3L)
    assert(out(1L).getAs[Double]("mean_logprob") == r6((2 * lpA + lpFloor) / 3))
    assert(out(2L).getAs[Long]("n_tokens") == 2L)
    assert(out(2L).getAs[Double]("mean_logprob") == r6((lpA + lpFloor) / 2))
    // empty doc is present with zero tokens and a NULL score
    assert(out(3L).getAs[Long]("n_tokens") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("mean_logprob")))
  }

  test("corpusStats approx sketch bounds distinct-count error, drops a phase") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def byLang(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = byLang(TextStats.corpusStats(docs, "text", Seq("lang")))
    val approx = byLang(TextStats.corpusStats(docs, "text", Seq("lang"),
      approx = true))
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (lang, a) =>
      val e = exact(lang)
      // non-sketched columns are bit-identical
      for (c <- Seq("n_docs", "total_chars", "total_tokens", "avg_doc_chars"))
        assert(a.getAs[Any](c) == e.getAs[Any](c), s"$lang.$c")
      // HLL++ at default rsd 0.05: allow 3 sigma
      val (av, ev) = (a.getAs[Long]("n_distinct_texts").toDouble,
        e.getAs[Long]("n_distinct_texts").toDouble)
      assert(math.abs(av - ev) <= math.max(1.0, 0.15 * ev),
        s"$lang distinct: approx $av vs exact $ev")
    }
    // the sketch path runs in ONE aggregate pass: the exact path's
    // distinct-rewrite needs two exchanges, the sketch exactly one
    val exactShuffles = PlanWalk.shuffleCount(
      TextStats.corpusStats(docs, "text", Seq("lang")))
    val approxShuffles = PlanWalk.shuffleCount(
      TextStats.corpusStats(docs, "text", Seq("lang"), approx = true))
    assert(approxShuffles < exactShuffles,
      s"sketch path should drop an aggregate phase ($approxShuffles vs $exactShuffles)")
  }

  test("pretrain pipeline composition: one plan, bounded exchange count") {
    // clean -> collapse -> decontaminate -> split -> budget -> pack in a
    // single composed plan: the 100x-scale smoke test for cross-operator
    // plan pathologies. The exchange bound catches a recomputed subtree
    // (every stage doubling would blow it); measured 12 at sf0.001
    // (collapse joins + decontaminate semi/anti + the two windows + the
    // deterministic output sort). r22: +5 from the deliberate ScanFanOut
    // repartitions of the sub-threshold corpus (tiny-payload, inert at
    // production size) — measured 17, notch at 19.
    val out = ExtensionQueries.queries("q_pipeline_pretrain")(
      spark, "/root/testdata/sf0.001")
    val nodes = PlanWalk.executedNodes(out)
    val shuffles = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles <= 19, s"pretrain composition plan has $shuffles exchanges")
    assert(out.count() > 0, "the composed pipeline must yield training sequences")
    // packed sequence addresses stay within the token budget arithmetic:
    // every sequence id is consistent with its offset and the 512 budget
    val bad = out.filter(col("seq_id") =!= floor(col("tok_offset") / 512)).count()
    assert(bad == 0L)
  }

  test("lengthPercentiles approx sketch stays within bounds of the exact path") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def byLang(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = byLang(TextStats.lengthPercentiles(docs, "text", Seq("lang")))
    val approx = byLang(TextStats.lengthPercentiles(docs, "text", Seq("lang"),
      approx = true))
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (lang, (nA, p50A, p90A)) =>
      val (nE, p50E, p90E) = exact(lang)
      assert(nA == nE)
      // GK sketch at the default accuracy: rank error <= n/accuracy, which
      // at sf0.01 means the sketch holds every value — the only remaining
      // difference is interpolation (exact) vs nearest-element (sketch),
      // bounded by one token-count step. 5% relative covers both regimes.
      assert(math.abs(p50A - p50E) <= math.max(1.0, 0.05 * p50E),
        s"$lang p50: approx $p50A vs exact $p50E")
      assert(math.abs(p90A - p90E) <= math.max(1.0, 0.05 * p90E),
        s"$lang p90: approx $p90A vs exact $p90E")
    }
    // same output schema either way — a dataset card can swap paths freely
    assert(TextStats.lengthPercentiles(docs, "text", Seq("lang"), approx = true)
      .schema == TextStats.lengthPercentiles(docs, "text", Seq("lang")).schema)
  }

  test("materializePackedSequences chops shard streams token-exactly") {
    val docs = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextStats.materializePackedSequences(docs, "doc_id", "text",
        budget = 4, shards = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    // stream: a b c | d e f | g  -> chop every 4: [a b c d] [e f g];
    // doc 2 splits across the boundary; the empty doc contributes nothing
    assert(out == Map(
      (0, 0L) -> (("a b c d", 4L, 2L)),
      (0, 1L) -> (("e f g", 3L, 2L))))
    // corpus-level conservation at a realistic size: every token lands in
    // exactly one sequence, none exceeds the budget
    val big = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val mat = TextStats.materializePackedSequences(big, "doc_id", "text",
      budget = 512, shards = 8)
    val agg = mat.agg(sum("n_tokens"), max("n_tokens")).head()
    val corpusTokens = big.agg(sum(
      graft.functions.TextFunctions.tokenCount(col("text")))).head().getLong(0)
    assert(agg.getLong(0) == corpusTokens, "token conservation")
    assert(agg.getLong(1) <= 512L, "no sequence over budget")
  }

  test("materializePackedTokenIds: stream identity, eos accounting, boundary split") {
    val merges = Seq(("74", "68"), ("7468", "65"), ("20", "746865"),
      ("69", "6E"), ("61", "6E"), ("616E", "64"), ("65", "72"), ("6F", "6E"))
    val eos = 256L + merges.size // 264
    val docs = Seq((1L, "the and"), (2L, ""), (3L, "in then"),
      (5L, null.asInstanceOf[String]), (7L, "on")).toDF("doc_id", "text")
    val out = TextStats.materializePackedTokenIds(docs, "doc_id", "text",
      merges, budget = 3, shards = 1)
    val seqs = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getSeq[Long](2), r.getLong(3), r.getLong(4)))
      .toMap
    // every window except the shard's last is exactly `budget` long
    val lastSeq = seqs.keys.map(_._2).max
    seqs.foreach { case ((_, sid), (ids, n, _)) =>
      assert(ids.length == n && n <= 3)
      if (sid != lastSeq) assert(n == 3L, s"non-terminal window $sid short")
    }
    // the concatenated stream equals per-doc ids + eos in id order
    // (NULL doc excluded entirely; empty doc contributes its eos)
    val stream = seqs.toSeq.sortBy(_._1).flatMap(_._2._1)
    val perDoc = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.ByteBpeEncode.byteBpeIds(
        col("text"), merges).as("ids"))
      .collect().sortBy(_.getLong(0))
      .flatMap(r => r.getSeq[Long](1) :+ eos)
    assert(stream == perDoc.toSeq, "chopped stream must equal the doc streams")
    assert(stream.count(_ == eos) == 4L, "one eos per non-NULL doc")
    // a doc crossing the 3-id boundary splits (fixture: 'the and' is
    // [7468, 65?]... regardless of exact ids, total stream length > 3
    // forces at least one split doc across windows)
    assert(seqs.size >= 2)
    // corpus-level conservation: every id lands exactly once, windows
    // bounded, eos count == doc count
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mat = TextStats.materializePackedTokenIds(big, "doc_id", "text",
      merges, budget = 128, shards = 8)
    val agg = mat.agg(sum("n_tokens"), max("n_tokens")).head()
    val want = big.filter(col("text").isNotNull).agg(
      sum(size(graft.functions.ByteBpeEncode.byteBpeIds(col("text"), merges)))
        .cast("long"), count(lit(1))).head()
    assert(agg.getLong(0) == want.getLong(0) + want.getLong(1),
      "id conservation: corpus ids + one eos per doc")
    assert(agg.getLong(1) <= 128L, "no window over budget")
  }

  test("packedDocSpans agrees with the materialized windows (shared address)") {
    val merges = Seq(("74", "68"), ("7468", "65"), ("20", "746865"),
      ("69", "6E"), ("61", "6E"), ("616E", "64"), ("65", "72"), ("6F", "6E"))
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val spans = TextStats.packedDocSpans(d, "doc_id", "text", merges,
      budget = 128, shards = 8)
    val mat = TextStats.materializePackedTokenIds(d, "doc_id", "text", merges,
      budget = 128, shards = 8)
    // per (shard, seq): span lens sum to the window's n_tokens, doc
    // counts match, spans tile the window contiguously from 0
    val bySeq = spans.collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) =>
        val sorted = rs.sortBy(_.getLong(3))
        var pos = 0L
        sorted.foreach { r =>
          assert(r.getLong(3) == pos, s"gap in window $k at ${r.getLong(3)}")
          pos += r.getLong(4)
        }
        k -> (pos, rs.length.toLong)
      }
    val wantSeq = mat.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(bySeq == wantSeq,
      "span tiling must equal the materializer's (n_tokens, n_docs) per window")
    // boundary-crossing docs appear once per window they touch
    assert(spans.groupBy("doc_id").count()
      .filter(col("count") > 1).count() > 0,
      "the fixture must exercise multi-window docs")
  }

  test("unpackTokenWindows inverts the packer: ids + eos per doc, any geometry") {
    val merges = Seq(("74", "68"), ("7468", "65"), ("20", "746865"),
      ("69", "6E"), ("61", "6E"), ("616E", "64"), ("65", "72"), ("6F", "6E"))
    val eos = 256L + merges.size
    // tiny budget forces window-crossing docs (split spans re-join)
    val docs = Seq((1L, "the and"), (2L, ""), (3L, "in then"),
      (5L, null.asInstanceOf[String]), (7L, "on")).toDF("doc_id", "text")
    def check(d: org.apache.spark.sql.DataFrame, budget: Int, shards: Int): Unit = {
      val packed = TextStats.materializePackedTokenIds(d, "doc_id", "text",
        merges, budget, shards)
      val spans = TextStats.packedDocSpans(d, "doc_id", "text", merges,
        budget, shards)
      val got = TextStats.unpackTokenWindows(packed, spans).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = d.filter(col("text").isNotNull)
        .select(col("doc_id"), graft.functions.ByteBpeEncode.byteBpeIds(
          col("text"), merges).as("ids"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1) :+ eos)).toMap
      assert(got == want,
        s"unpack(pack) must return every doc's ids + eos (budget=$budget, " +
          s"shards=$shards)")
    }
    check(docs, budget = 3, shards = 1)
    check(docs, budget = 5, shards = 2)
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    check(big, budget = 128, shards = 8)
    // scale contract: the reader is one window-key join + one doc
    // groupBy over the packer's own bounded plan — the whole
    // pack+unpack pipeline stays within a fixed shuffle budget
    val card = graft.operators.Diagnostics.planCard(
      TextStats.unpackTokenWindows(
        TextStats.materializePackedTokenIds(big, "doc_id", "text", merges,
          budget = 128, shards = 8),
        TextStats.packedDocSpans(big, "doc_id", "text", merges,
          budget = 128, shards = 8))).collect()(0)
    // measured shape: 3 shuffles (pack window + pack groupBy + unpack
    // groupBy) with both equi-joins broadcast at fixture scale, +2 r22
    // ScanFanOut repartitions of the sub-threshold corpus (one per pack
    // surface — deliberate, tiny-payload, inert at production size);
    // pin a notch above so an AQE join-strategy flip doesn't
    // false-trip but a structural regression (extra repartition, lost
    // reuse) does
    assert(card.getAs[Long]("n_shuffle_exchanges") <= 6,
      s"unpack(pack) must stay within the bounded shuffle budget: $card")
  }

  test("packedWindowMix: shares normalize per window, tokens conserve, hand case") {
    val merges = Seq(("74", "68"), ("7468", "65"))
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val spans = TextStats.packedDocSpans(d, "doc_id", "text", merges,
      budget = 64, shards = 4)
    val mix = TextStats.packedWindowMix(spans, d, "doc_id", "source")
    val rows = mix.collect()
    // token conservation: window-mix counts sum to the span totals
    val mixTotal = rows.map(_.getLong(3)).sum
    val spanTotal = spans.agg(sum("span_len")).head().getLong(0)
    assert(mixTotal == spanTotal, "every span token must land in one stratum")
    // shares sum to ~1 per window (round-6 per-term rounding)
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (k, rs) =>
      val s = rs.map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"window $k shares sum to $s")
    }
    // hand case: two docs, two sources, one window — exact shares
    val docs2 = Seq((0L, "the the", "a"), (2L, "the", "b"))
      .toDF("doc_id", "text", "source")
    val sp2 = TextStats.packedDocSpans(docs2, "doc_id", "text", merges,
      budget = 64, shards = 1)
    val got = TextStats.packedWindowMix(sp2, docs2, "doc_id", "source")
      .collect().map(r => r.getString(2) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    // 'the the' -> [the, ' the'-less fixture: 7468+65 merges give
    // 'the'=2 tokens? compute from the engine itself instead: counts
    // must match byteBpeCount + 1 (eos) per doc
    val counts = docs2.select(col("source"),
        graft.functions.ByteBpeEncode.byteBpeCount(col("text"), merges) + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = counts.values.sum.toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == ((counts("a"), r6(counts("a") / tot))))
    assert(got("b") == ((counts("b"), r6(counts("b") / tot))))
  }

  test("unpack + decode closes the full artifact cycle back to source text") {
    val merges = Seq(("74", "68"), ("7468", "65"), ("20", "746865"),
      ("69", "6E"), ("61", "6E"), ("616E", "64"), ("65", "72"), ("6F", "6E"))
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = TextStats.materializePackedTokenIds(d, "doc_id", "text",
      merges, budget = 128, shards = 8)
    val spans = TextStats.packedDocSpans(d, "doc_id", "text", merges,
      budget = 128, shards = 8)
    val mismatches = TextStats.unpackTokenWindows(packed, spans)
      .select(col("doc_id"),
        graft.functions.ByteBpeDecode.byteBpeDecode(col("token_ids"), merges,
          skipUnknown = true).as("rt"))
      .join(d.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(col("rt") =!= col("text")).count()
    assert(mismatches == 0L,
      "tokenize -> pack -> unpack -> detokenize must be the identity")
  }

  test("bigramLogProbScore matches the hand formula; one bigram materialization") {
    // bigrams: doc1 (a,b)(b,a)(a,b), doc2 (a,b) -> c2(a,b)=3, c2(b,a)=1,
    // c1(a)=3, total=4; minCount=2 keeps (a,b): lp = log10(3/3) = 0;
    // floor = log10(2/4)
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProbScore(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val floor = math.log10(2.0 / 4)
    assert(out(1L).getAs[Long]("n_bigrams") == 3L)
    assert(out(1L).getAs[Double]("mean_logprob") == r6(floor / 3))
    assert(out(2L).getAs[Long]("n_bigrams") == 1L)
    assert(out(2L).getAs[Double]("mean_logprob") == 0.0)
    assert(out(3L).getAs[Long]("n_bigrams") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("mean_logprob")))
    // fluent corpus text outranks shuffled word salad made of the SAME
    // common tokens (where the unigram score cannot discriminate)
    val big = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val withSalad = big.select(col("doc_id"), col("text"))
      .union(Seq((-1L, "table the of scan and agg to row the value")).toDF("doc_id", "text"))
    val scores = TextStats.bigramLogProbScore(withSalad, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val real = scores.filter(_._1 >= 0).values.filterNot(_.isNaN)
    assert(scores(-1L) < real.toSeq.sorted.apply(real.size / 2),
      "word salad must score below the median document")
    // the corpus bigram stream materializes once (exchange reuse)
    val generators = PlanWalk.executedNodes(
      TextStats.bigramLogProbScore(big, "doc_id", "text")).count(
      _.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
    assert(generators == 1,
      s"expected one bigram generator in the executed plan, found $generators")
  }

  test("tfidfKeywords scores tf*ln(N/df), ranks per doc, prunes map-side") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana")).toDF("doc_id", "text")
    val out = TextStats.tfidfKeywords(docs, "doc_id", "text", k = 2, minDf = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // N=3; df: apple 1, banana 3, cherry 1
    assert(out((1L, "apple")).getAs[Double]("score") == r6(2 * math.log(3.0)))
    assert(out((1L, "apple")).getAs[Long]("rank") == 1L)
    assert(out((1L, "banana")).getAs[Double]("score") == 0.0) // ln(3/3)
    assert(out((2L, "cherry")).getAs[Long]("rank") == 1L)
    assert(out((3L, "banana")).getAs[Long]("rank") == 1L)
    // minDf=2 keeps only corpus-wide tokens (banana), all score 0
    val floored = TextStats.tfidfKeywords(docs, "doc_id", "text", k = 2, minDf = 2L)
    assert(floored.select("token").distinct().collect().map(_.getString(0)).toSeq
      == Seq("banana"))
    // per-doc top-k must engage the WindowGroupLimit pushdown
    val limits = PlanWalk.executedNodes(
        TextStats.tfidfKeywords(docs, "doc_id", "text", k = 2))
      .count(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec])
    assert(limits >= 1, "expected WindowGroupLimitExec in the finalized plan")
  }

  test("unigramLogProbScore ranks corpus-typical text above junk and broadcasts the vocab") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val withJunk = docs.select(col("doc_id"), col("text"))
      .union(Seq((-1L, "xq zvv qqj wvx plk mnb")).toDF("doc_id", "text"))
    val out = TextStats.unigramLogProbScore(withJunk, "doc_id", "text")
    val scores = out.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val junk = scores(-1L)
    val real = scores.filter(_._1 >= 0).values.filterNot(_.isNaN)
    val medianReal = real.toSeq.sorted.apply(real.size / 2)
    assert(junk < medianReal, s"junk $junk should score below median $medianReal")
    // the token->frequency join must be a broadcast (never a shuffle of
    // the exploded token stream on the token key)
    val nodes = PlanWalk.executedNodes(out)
    val bhj = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(bhj >= 1, "expected the vocab join to broadcast")
    // the corpus is TOKENIZED ONCE (VERDICT r9 #6): vocabulary, token
    // total and scoring all reuse the one (doc, token) aggregate's
    // exchange, so exactly one generator executes in the finalized plan
    val generators = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
    assert(generators == 1,
      s"expected one tokenization in the executed plan, found $generators")
  }

  test("topNgrams counts positional occurrences, ranks per stratum and globally") {
    val docs = Seq(
      ("en", "a b a b a"), // bigrams: "a b" x2, "b a" x2
      ("en", "a b"),       // "a b" x1 -> en: "a b" 3, "b a" 2
      ("de", "x y"),       // de: "x y" 1
      ("de", "z")          // too short: no bigrams
    ).toDF("lang", "text")
    val strat = TextStats.topNgrams(docs, "text", n = 2, k = 1,
        strataCols = Seq("lang"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(strat("en") == ("a b", 3L))
    assert(strat("de") == ("x y", 1L))
    // global path (no strata): TakeOrdered bounds the sort, ranks survive
    val global = TextStats.topNgrams(docs, "text", n = 2, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(global.toSeq == Seq(("a b", 3L, 1L), ("b a", 2L, 2L)))
    // the stratified rank must engage the WindowGroupLimit map-side trim
    val limits = PlanWalk.executedNodes(
        TextStats.topNgrams(docs, "text", n = 2, k = 1, strataCols = Seq("lang")))
      .count(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec])
    assert(limits >= 1, "expected WindowGroupLimitExec in the stratified plan")
  }

  test("bm25TopK ranks term-matched docs with hand-checked scores") {
    // corpus: d1 has both query terms, d2 one, d3 none (never output)
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple date elder fig"),
      (3L, "grape kiwi")).toDF("doc_id", "text")
    val qs = Seq((10L, "apple banana")).toDF("qid", "qtext")
    val out = TextStats.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext",
      k = 10).collect().map(r => r.getLong(1) -> r).toMap
    assert(!out.contains(3L), "doc sharing no term must be absent")
    assert(out(1L).getAs[Long]("rank") == 1L && out(2L).getAs[Long]("rank") == 2L)
    // hand-check: N=3, avgdl=3, dl1=3 -> tf term = 2.2/(1+1.2*(0.25+0.75*1))
    val idf1 = math.log((3.0 - 1 + 0.5) / (1 + 0.5) + 1.0) // df=1 (banana)
    val idf2 = math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1.0) // df=2 (apple)
    val t1 = 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L).getAs[Double]("score") == r6(idf1 * t1 + idf2 * t1))
    // scale shape: query-side joins broadcast; rank trims map-side
    val nodes = PlanWalk.executedNodes(
      TextStats.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 2))
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]) >= 2,
      "expected broadcast query-term and stats joins")
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec]) >= 1,
      "expected WindowGroupLimitExec for the per-query rank")
    // building the frame must launch NO eager job (N lives in the
    // broadcast stats frame, not a driver-side docs.count())
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    TextStats.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 2)
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter == jobsBefore,
      s"plan construction ran ${jobsAfter - jobsBefore} eager job(s)")
  }

  test("gopherQualityFlags: each rule trips on its planted violation and a clean doc passes") {
    val good = (("the quick brown fox jumps over a lazy dog and then runs " * 6)
      .trim + ".")                                   // 72 words, stopwords, alpha
    val bullets = (1 to 10).map(i => s"- item number $i of the list").mkString("\n")
    val symbols = ("the code is " + ("# " * 20)).trim // 23 words, 20 '#'
    val short = "too few words here"
    val ellipsis = (1 to 10).map(i => s"the line $i trails off...").mkString("\n")
    val numeric = (("1 2 3 4 5 6 7 8 9 10 " * 6) + "the a of").trim // 63 words, 3/63 alpha
    val df = Seq((1L, good), (2L, bullets), (3L, symbols), (4L, short),
      (5L, ellipsis), (6L, numeric)).toDF("doc_id", "text")
    val out = TextStats.gopherQualityFlags(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, n: String): Int = out(id).getAs[Int](n)
    assert(flag(1L, "pass") == 1 && out(1L).getAs[Int]("n_rules_failed") == 0,
      "clean doc must pass all rules")
    assert(flag(2L, "pass_bullet_lines") == 0, "all-bullet doc must trip the bullet rule")
    assert(flag(3L, "pass_symbol_ratio") == 0, "hash-heavy doc must trip the symbol rule")
    assert(flag(4L, "pass_word_count") == 0, "4-word doc must trip the word-count rule")
    assert(flag(5L, "pass_ellipsis_lines") == 0, "ellipsis-ended lines must trip the rule")
    assert(flag(6L, "pass_alpha_words") == 0, "digit-word doc must trip the alpha rule")
    // rules are independent: the bullet doc still passes the symbol rule
    assert(flag(2L, "pass_symbol_ratio") == 1)
    // zero shuffle: one projection over the scan
    val nodes = PlanWalk.executedNodes(TextStats.gopherQualityFlags(df, "doc_id", "text"))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "gopherQualityFlags must be zero-shuffle")
  }

  test("trigramLogProbScore: each backoff level fires with hand-checked values") {
    // corpus: A has frequent trigrams; D's trigram+backoff-bigram+w3 are
    // all rare (unigram-floor branch); G's trigram is rare but its
    // backoff bigram "n o" is frequent (0.4-penalty bigram branch)
    val docs = Seq(
      (1L, "a b c a b c a b c"), // trigrams: abc x3, bca x2, cab x2
      (2L, "x y q"),             // unique trigram, unique bigrams
      (3L, "x y"), (4L, "x y"),
      (5L, "m n o"),             // mno x1 but "n o" total x3
      (6L, "n o"), (7L, "n o")).toDF("doc_id", "text")
    val out = TextStats.trigramLogProbScore(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 3 x log10(3/3) + 2 x log10(2/3) + 2 x log10(2/2) over 7
    val exp1 = BigDecimal(2.0 * math.log10(2.0 / 3) / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L).getAs[Long]("n_trigrams") == 7L)
    assert(out(1L).getAs[Double]("mean_logprob") == exp1)
    // doc 2: c3(x y q)=1 < 2, c2(y q)=1 < 2, c1(q)=1 < 2 -> floor:
    // log10(0.16 * minCount / total_unigrams); total = 9+3+2+2+3+2+2 = 23
    val exp2 = BigDecimal(math.log10(0.16 * 2 / 23.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L).getAs[Double]("mean_logprob") == exp2)
    // doc 5: c3(m n o)=1 < 2 but c2(n o)=3 >= 2, c1(n)=3:
    // log10(0.4 * 3 / 3) = log10(0.4)
    val exp5 = BigDecimal(math.log10(0.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(5L).getAs[Double]("mean_logprob") == exp5)
    // sub-3-token docs: kept, zero trigrams, NULL score
    assert(out(3L).getAs[Long]("n_trigrams") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("mean_logprob")))
  }

  test("dsirScore: self-target scores exactly zero; target-like text wins") {
    val corpus = Seq(
      (1L, "the model trains on curated text data"),
      (2L, "the model learns from curated text"),
      (3L, "buy cheap pills online casino bonus"),
      (4L, "casino bonus spins buy cheap pills")).toDF("doc_id", "text")
    // target == raw corpus -> p and q are the SAME model -> ratio 0
    val self = TextStats.dsirScore(corpus, "doc_id", "text", corpus, "text")
      .collect()
    assert(self.forall(_.getAs[Double]("dsir_logratio") == 0.0))
    // a curated-text target pushes curated docs above spam docs
    val target = Seq("the model trains on curated text",
      "curated text data trains the model").toDF("text")
    val scored = TextStats.dsirScore(corpus, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_logratio")).toMap
    assert(Seq(1L, 2L).map(scored).min > Seq(3L, 4L).map(scored).max)
    // deterministic across runs
    val again = TextStats.dsirScore(corpus, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_logratio")).toMap
    assert(scored == again)
  }

  test("dsirScore materializes the corpus gram stream once (plan-asserted)") {
    // the r11 ReuseExchange fix: without the explicit bucket nullness
    // filter, the raw-model branch re-explodes the corpus — 3 Generate
    // nodes instead of 2 (docs grams once, target grams once)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = docs.filter(col("source").isin("src0", "src1"))
    val out = TextStats.dsirScore(docs, "doc_id", "text", target, "text",
      numBuckets = 256)
    val gens = PlanWalk.executedNodes(out)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
    assert(gens == 2, s"expected 2 gram explodes (corpus + target), found $gens")
  }

  test("trigramLogProbScore materializes each n-gram stream once (plan-asserted)") {
    // 4 Generate nodes: the positional probe + one per corpus count
    // table (trigram/bigram/unigram); the unigram total reuses c1's
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextStats.trigramLogProbScore(docs, "doc_id", "text")
    val gens = PlanWalk.executedNodes(out)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
    assert(gens == 4, s"expected 4 shingle explodes, found $gens")
  }

  test("topNgrams never shuffles n-gram strings (plan-asserted)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextStats.topNgrams(docs, "text", n = 2, k = 5, Seq("lang"))
    val nodes = PlanWalk.executedNodes(out)
    // every shuffle key must be long/stratum-typed — no StringType key
    // that could be an n-gram (the count shuffle rides 8-byte hashes;
    // strings appear only after the broadcast candidate filter)
    val shuffles = nodes.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.nonEmpty)
    val ngramKeyed = shuffles.exists(_.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions.exists(e =>
          e.dataType == org.apache.spark.sql.types.StringType &&
            e.references.exists(_.name.contains("ngram")))
      case _ => false
    })
    assert(!ngramKeyed, "no shuffle may be keyed on n-gram text")
  }

  test("vocabDivergence matches the hand formula incl. the OOV bucket") {
    // ref: a x2, b x1 -> vocab {a: 2, b: 1} at minCount=1; rtot=3, V=2,
    // oovmass=0, qden=6; q(a)=.5, q(b)=1/3, q(oov)=1/6
    val ref = Seq("a a b").toDF("text")
    val docs = Seq(("s1", "a a b"), ("s2", "c c c")).toDF("src", "text")
    val out = TextStats.vocabDivergence(docs, "text", Seq("src"), ref, "text",
      minCount = 1L).collect().map(r => r.getString(0) -> r).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = out("s1") // same distribution as ref: only smoothing gap
    assert(s1.getAs[Long]("n_tokens") == 3L)
    assert(s1.getAs[Double]("oov_rate") == 0.0)
    assert(s1.getAs[Double]("kl_divergence") ==
      r6(2.0 / 3 * math.log10((2.0 / 3) / 0.5) +
         1.0 / 3 * math.log10((1.0 / 3) / (1.0 / 3))))
    assert(s1.getAs[Double]("cross_entropy") ==
      r6(-(2.0 / 3) * math.log10(0.5) - 1.0 / 3 * math.log10(1.0 / 3)))
    val s2 = out("s2") // fully OOV stratum
    assert(s2.getAs[Double]("oov_rate") == 1.0)
    assert(s2.getAs[Double]("kl_divergence") == r6(math.log10(6.0)))
    assert(s2.getAs[Double]("cross_entropy") == r6(math.log10(6.0)))
  }

  test("applyVocabulary rewrites out-of-vocab tokens to <unk>, keeps order") {
    val docs = Seq(
      (1L, "the cat sat on the rare mat"),
      (2L, ""),                     // empty doc passes through unchanged
      (3L, "zz yy xx")).toDF("doc_id", "text")
    val vocab = Seq("the", "cat", "on", "mat").toDF("token")
    val out = TextStats.applyVocabulary(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "the cat <unk> on the <unk> mat")
    assert(out(2L) == "")
    assert(out(3L) == "<unk> <unk> <unk>")
    // custom marker
    val custom = TextStats.applyVocabulary(docs, "doc_id", "text", vocab,
        unk = "[OOV]").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(custom(3L) == "[OOV] [OOV] [OOV]")
  }

  test("augmentWordDropout is deterministic, seed-sensitive, rate-calibrated") {
    val docs = (1L to 50L).map(i => (i, Seq.fill(40)("w").zipWithIndex
      .map { case (w, j) => s"$w$j" }.mkString(" "))).toDF("doc_id", "text")
    def run(seed: Long) = TextStats.augmentWordDropout(docs, "doc_id", "text",
        rate = 0.25, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(11L)
    assert(a == run(11L), "same seed must reproduce the same views")
    val b = run(12L)
    assert(a != b, "a new seed must give a different view")
    // survivors keep their relative order and are a subsequence
    val toks = a(1L).split(" ").filter(_.nonEmpty)
    assert(toks.map(_.drop(1).toInt).sameElements(
      toks.map(_.drop(1).toInt).sorted))
    // dropout rate lands near 25% over 2000 tokens
    val surv = a.values.map(_.split(" ").count(_.nonEmpty)).sum
    assert(surv > 1300 && surv < 1700, s"survivors $surv of 2000")
    // rate 0 is the identity
    val id = TextStats.augmentWordDropout(docs, "doc_id", "text", 0.0, 11L)
      .collect().map(r => r.getString(1))
    assert(id.sameElements(docs.collect().map(_.getString(1))))
  }

  test("splitSentences applies the pinned boundary rule") {
    val docs = Seq(
      (1L, "First sentence. Second one! A third? trailing fragment"),
      (2L, "no terminators at all"),
      (3L, "Ellipsis wins... next.")).toDF("doc_id", "text")
    val out = TextStats.splitSentences(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(out((1L, 0L)) == ("First sentence.", 2L))
    assert(out((1L, 1L)) == ("Second one!", 2L))
    assert(out((1L, 2L)) == ("A third?", 2L))
    // the trailing fragment is dropped; doc 2 contributes nothing
    assert(!out.keySet.exists(_ == (1L, 3L)))
    assert(!out.keySet.exists(_._1 == 2L))
    // a terminator RUN stays attached to its sentence
    assert(out((3L, 0L)) == ("Ellipsis wins...", 2L))
    assert(out((3L, 1L)) == ("next.", 1L))
  }

  test("zscoreSignals standardizes per stratum and NULLs zero-variance strata") {
    val df = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L),  // mean 2, sample stddev 1
      ("B", 7L),                        // single row: no variance
      ("C", 5L), ("C", 5L)              // constant: stddev 0
    ).toDF("src", "x")
    val out = TextStats.zscoreSignals(df, Seq("x"), Seq("src"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("A", 1L)) == Some(-1.0))
    assert(out(("A", 2L)) == Some(0.0))
    assert(out(("A", 3L)) == Some(1.0))
    assert(out(("B", 7L)) == None)
    assert(out(("C", 5L)) == None)
    // global mode: one 1-row broadcast, same formula over all rows
    val g = TextStats.zscoreSignals(df.select("x"), Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val xs = Seq(1L, 2L, 3L, 7L, 5L, 5L).map(_.toDouble)
    val m = xs.sum / xs.size
    val sd = math.sqrt(xs.map(v => (v - m) * (v - m)).sum / (xs.size - 1))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g(1L) == r6((1 - m) / sd) && g(7L) == r6((7 - m) / sd))
  }

  test("zscoreSignals preserves NULL-stratum rows with NULL z-scores") {
    val df = Seq((Some("A"), 1L), (Some("A"), 3L), (None, 2L))
      .toDF("src", "x")
    val out = TextStats.zscoreSignals(df, Seq("x"), Seq("src"))
      .collect()
    assert(out.length == 3, "NULL-stratum rows must not be dropped")
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(nullRow.fieldIndex("x_z")),
      "NULL stratum carries NULL z, never another stratum's moments")
  }

  test("trainBpe recovers the classic merge sequence, ties broken by pair order") {
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val planted = Seq(words.mkString(" ")).toDF("text")
    val m = TextStats.trainBpe(planted, "text", numMerges = 5)
    assert(m == Seq(("u", "g", 20L), ("u", "n", 16L), ("h", "ug", 15L),
      ("p", "un", 12L), ("hug", "s", 5L)))
    // asking for more merges than the corpus supports stops at the
    // minPairCount floor instead of looping
    val m10 = TextStats.trainBpe(planted, "text", numMerges = 50)
    assert(m10.size < 50 && m10.take(5) == m)
    assert(m10.forall(_._3 >= 2L))
  }

  test("spanCorrupt: reconstruction, sentinel structure, edges, determinism") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextStats.spanCorrupt(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    val texts = docs.collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val sentinelRe = "<extra_id_\\d+>".r
    out.foreach { case (id, (n, nSpans, nCorrupt, inputs, targets)) =>
      val toks = texts(id).map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      assert(n == toks.size, s"doc $id token count")
      if (toks.size >= 2) {
        // structure: targets = <id_0> span0 <id_1> span1 ... <id_ns>
        val tParts = targets.split(" ").toSeq
        val sentAt = tParts.zipWithIndex.filter {
          case (t, _) => sentinelRe.pattern.matcher(t).matches
        }
        assert(sentAt.map(_._1) ==
          (0L to nSpans).map(k => s"<extra_id_$k>"),
          s"doc $id: ordered sentinel chain incl. the closing one")
        assert(nCorrupt == tParts.size - (nSpans + 1) && nCorrupt >= nSpans,
          s"doc $id: corrupted-token count vs targets shape")
        // reconstruction: substituting each input sentinel with its
        // target span yields the original token sequence exactly
        // split drops the trailing empty after the closing sentinel;
        // only the leading empty needs dropping
        val spans = targets.split("<extra_id_\\d+>").map(_.trim).toSeq.drop(1)
        assert(spans.size == nSpans, s"doc $id: $spans")
        var rebuilt = inputs
        spans.zipWithIndex.foreach { case (sp, k) =>
          rebuilt = rebuilt.replace(s"<extra_id_$k>", sp)
        }
        assert(rebuilt.split("\\s+").filter(_.nonEmpty).toSeq == toks,
          s"doc $id: inputs+targets must reconstruct the original tokens")
        assert(nCorrupt < toks.size,
          s"doc $id: corruption must never consume the whole doc")
      } else {
        assert(nSpans == 0 && nCorrupt == 0)
        assert(Option(inputs) == texts(id))
        assert(texts(id).isEmpty || targets == "")
      }
    }
    // realized corruption tracks the density knob on real docs
    val big = out.values.filter(_._1 >= 20)
    val rate = big.map(v => v._3.toDouble / v._1).sum / big.size
    assert(rate > 0.08 && rate < 0.25, s"mean corruption rate $rate")
    // deterministic: a second run derives identical rows
    val again = TextStats.spanCorrupt(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(again == out)
    // NULL text: NULL n_tokens/inputs/targets, zero spans
    import spark.implicits._
    val nullRow = TextStats.spanCorrupt(
      Seq((1L, Option.empty[String])).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(nullRow.isNullAt(1) && nullRow.getLong(2) == 0L &&
      nullRow.isNullAt(4) && nullRow.isNullAt(5))
  }

  test("denoiserMix: routing mix, per-branch reconstruction, edges, determinism") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextStats.denoiserMix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    val texts = docs.collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val byDen = out.values.groupBy(_._1).map { case (d, v) => d -> v.size }
    assert(Set("R", "X", "S").subsetOf(byDen.keySet),
      s"all three denoisers must fire on the corpus, got $byDen")
    val active = out.values.count(_._1 != "none").toDouble
    assert(math.abs(byDen("R") / active - 0.375) < 0.08 &&
      math.abs(byDen("X") / active - 0.375) < 0.08 &&
      math.abs(byDen("S") / active - 0.25) < 0.08,
      s"3:3:2 routing mix off: $byDen")
    out.foreach { case (id, (den, n, nCorrupt, inputs, targets)) =>
      val toks = texts(id).map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      assert(n == toks.size)
      den match {
        case "none" =>
          assert(nCorrupt == 0 && Option(inputs) == texts(id))
        case "S" =>
          // prefix-LM: inputs = prefix <id_0>; targets = <id_0> suffix <id_1>
          assert(inputs.endsWith(" <extra_id_0>"))
          assert(targets.startsWith("<extra_id_0> ") &&
            targets.endsWith(" <extra_id_1>"))
          val prefix = inputs.stripSuffix(" <extra_id_0>")
          val suffix = targets.stripPrefix("<extra_id_0> ")
            .stripSuffix(" <extra_id_1>")
          assert((prefix + " " + suffix)
            .split("\\s+").filter(_.nonEmpty).toSeq == toks,
            s"doc $id: prefix+suffix must reconstruct the tokens")
          val sufToks = suffix.split("\\s+").filter(_.nonEmpty).length
          assert(nCorrupt == sufToks && nCorrupt >= 1 && nCorrupt < toks.size,
            s"doc $id: cut in [1, n-1]")
        case _ => // R / X: the spanCorrupt reconstruction invariant
          val spans = targets.split("<extra_id_\\d+>").map(_.trim).toSeq.drop(1)
          var rebuilt = inputs
          spans.zipWithIndex.foreach { case (sp, k) =>
            rebuilt = rebuilt.replace(s"<extra_id_$k>", sp)
          }
          assert(rebuilt.split("\\s+").filter(_.nonEmpty).toSeq == toks,
            s"doc $id ($den): inputs+targets must reconstruct")
          assert(nCorrupt ==
            targets.split(" ").count(t => !t.matches("<extra_id_\\d+>")))
      }
    }
    // X really corrupts more than R on comparable docs
    val rRate = out.values.filter(v => v._1 == "R" && v._2 >= 20)
      .map(v => v._3.toDouble / v._2)
    val xRate = out.values.filter(v => v._1 == "X" && v._2 >= 20)
      .map(v => v._3.toDouble / v._2)
    assert(xRate.sum / xRate.size > 2 * (rRate.sum / rRate.size),
      "the X denoiser must corrupt a much larger share than R")
    // deterministic
    val again = TextStats.denoiserMix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(again == out)
  }

  test("byte-level BPE: GPT-2-style pre-tokens, byte alphabet, hand-checked merges") {
    // pre-tokenization: leading spaces attach, contractions split,
    // digit/punct runs separate, whitespace runs survive
    val pts = Seq(("it's 2 cats!  ok")).toDF("text")
      .select(TextStats.bytePretokens(col("text")).as("p"))
      .head().getSeq[String](0)
    assert(pts == Seq("it", "'s", " 2", " cats", "!", "  ", "ok"),
      s"got $pts")
    // byte-level training on the planted example + a multi-byte word:
    // merges are HEX BYTE symbols; the leading-space byte merges into
    // words; café's C3/A9 bytes merge as separate symbols
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs") ++
      Seq.fill(3)("café")
    val planted = Seq(words.mkString(" ")).toDF("text")
    val m = TextStats.trainBpeBytes(planted, "text", numMerges = 15)
    assert(m.take(6) == Seq(("75", "67", 20L), ("20", "70", 17L),
      ("75", "6E", 16L), ("68", "7567", 15L), ("20", "687567", 14L),
      ("2070", "756E", 12L)))
    assert(m(13) == (("20636166", "C3", 3L)) && m(14) == (("20636166C3", "A9", 3L)),
      "the multi-byte word must merge through its UTF-8 bytes")
    // encode under the learned merges: both 'hug' (h+ug learned
    // unprefixed at rank 4) and ' café' (6 bytes incl. the leading
    // space and the C3 A9 pair) collapse to ONE subword each
    val rows = TextStats.applyBpeBytes(
      Seq((1L, "hug café"), (2L, ""), (3L, "é")).toDF("doc_id", "text"),
      "doc_id", "text", m.map(x => (x._1, x._2)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((2L, 2L)),
      "pretokens [hug, ␠café] each collapse to one subword")
    assert(rows(2L) == ((0L, 0L)), "empty doc: zero pre-tokens, zero subwords")
    assert(rows(3L) == ((1L, 2L)), "unmerged é = its two raw bytes")
  }

  test("encodeBpeBytes pieces: exact symbols, count-consistent, round-trip through ModelStore") {
    val merges = Seq(("74", "68"), ("7468", "65"), ("20", "746865"))
    val docs = Seq((1L, "the théme"), (2L, "")).toDF("doc_id", "text")
    val pieces = TextStats.encodeBpeBytes(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // 'the' -> [746865]; ' théme' -> 20 74 68 C3 A9 6D 65: th merges
    // (7468), the C3/A9 bytes stay separate, '20'+'746865' cannot fire
    // (the é breaks the 'the' run) -> [20, 7468, C3, A9, 6D, 65]
    assert(pieces(1L) == Seq("746865", "20", "7468", "C3", "A9", "6D", "65"),
      s"got ${pieces(1L)}")
    assert(pieces(2L) == Seq.empty, "empty doc -> empty pieces")
    // the counting twin agrees with the pieces surface on real docs
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = TextStats.applyBpeBytes(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val p = TextStats.encodeBpeBytes(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).size).toMap
    assert(p.forall { case (id, k) => n(id) == k.toLong },
      "size(subwords) must equal n_subwords for every doc")
    // byte merges persist through the SAME ModelStore artifact as the
    // char-level trainer: train -> save -> load -> identical encode
    val words = Seq.fill(6)("hug") ++ Seq.fill(4)("pun")
    val planted = Seq(words.mkString(" ")).toDF("text")
    val trained = TextStats.trainBpeBytes(planted, "text", numMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe_bytes").toString
    graft.sources.ModelStore.saveMerges(spark, trained, dir)
    val loaded = graft.sources.ModelStore.loadMerges(spark, dir)
    assert(loaded == trained, "hex-symbol merges must round-trip exactly")
    val direct = TextStats.encodeBpeBytes(d, "doc_id", "text",
      trained.map(m => (m._1, m._2)))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaStore = TextStats.encodeBpeBytes(d, "doc_id", "text",
      loaded.map(m => (m._1, m._2)))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaStore == direct)
  }

  test("byte-BPE ids: total over the corpus, invertible through the vocab") {
    val merges = Seq(("74", "68"), ("7468", "65"), ("20", "746865"))
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = TextStats.bpeBytesVocab(spark, merges)
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(vocab.size == 259 && vocab(0L) == "00" && vocab(255L) == "FF" &&
      vocab(258L) == "20746865")
    val pieces = TextStats.encodeBpeBytes(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val ids = TextStats.encodeBpeBytesIds(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(ids.values.flatten.forall(_ != null),
      "byte-level ids are TOTAL: no document may produce a null id")
    assert(ids.map { case (k, v) => k -> v.map(i => vocab(i.asInstanceOf[Long])) }
      == pieces, "ids must decode back to the exact pieces")
  }

  test("fimTransform: lossless reassembly, modes, pass-throughs, determinism") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val orig = d.collect().map(r =>
      r.getLong(0) -> Option(r.getString(1)).map(_.split("\\s+")
        .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)).toMap
    val out = TextStats.fimTransform(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(out.map(_._2).toSet.subsetOf(Set("PSM", "SPM", "none")))
    val modes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(modes.getOrElse("PSM", 0) > 50 && modes.getOrElse("SPM", 0) > 50,
      s"both orders must occur at ~25% each of 500 docs: $modes")
    out.foreach { case (id, mode, text) =>
      if (mode == "none") {
        assert(text.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty) == orig(id), s"doc $id must pass through")
      } else {
        val t = text.get
        // every transformed doc carries all three sentinels exactly once
        Seq("<\\|fim_prefix\\|>", "<\\|fim_suffix\\|>", "<\\|fim_middle\\|>")
          .foreach(sn => assert(sn.r.findAllIn(t).size == 1, s"doc $id: $t"))
        // reassembly: P ++ M ++ S token streams equal the original
        def seg(t: String, from: String, until: Option[String]): Seq[String] = {
          val s0 = t.indexOf(from) + from.length
          val s1 = until.map(t.indexOf).getOrElse(t.length)
          t.substring(s0, s1).split("\\s+").filter(_.nonEmpty).toSeq
        }
        val (p, sfx, m) =
          if (mode == "PSM")
            (seg(t, "<|fim_prefix|>", Some("<|fim_suffix|>")),
              seg(t, "<|fim_suffix|>", Some("<|fim_middle|>")),
              seg(t, "<|fim_middle|>", None))
          else
            (seg(t, "<|fim_prefix|>", Some("<|fim_middle|>")),
              seg(t, "<|fim_suffix|>", Some("<|fim_prefix|>")),
              seg(t, "<|fim_middle|>", None))
        assert(p ++ m ++ sfx == orig(id),
          s"doc $id ($mode) must reassemble to the original tokens")
      }
    }
    // short docs never transform
    val tiny = Seq((1L, "a b"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val tOut = TextStats.fimTransform(tiny, "doc_id", "text", fimRate = 1.0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tOut.values.forall(_ == "none"), "under-3-token docs pass through")
    // deterministic across runs
    val again = TextStats.fimTransform(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(again.toSet == out.toSet)
  }

  test("byteBpeFertility equals a per-doc recomputation, strata preserved") {
    val docs = Seq((1L, "en", "the cat and the hat"),
      (2L, "en", "in there"), (3L, "de", "und und")).toDF("doc_id", "lang", "text")
    val merges = Seq(("74", "68"), ("7468", "65"), ("20", "746865"),
      ("69", "6E"), ("61", "6E"), ("616E", "64"))
    val card = TextStats.byteBpeFertility(docs, "text", Seq("lang"), merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val perDoc = TextStats.applyBpeBytes(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // en: docs 1,2 — words 5+2; de: doc 3 — words 2
    assert(card("en")._1 == 2L && card("en")._2 == 7L)
    assert(card("de")._1 == 1L && card("de")._2 == 2L)
    assert(card("en")._3 == perDoc(1L) + perDoc(2L),
      "card subwords must equal the per-doc encode sum")
    assert(card("de")._3 == perDoc(3L))
    assert(card("en")._4 == 19L + 8L && card("de")._4 == 7L, "raw byte totals")
  }

  test("applyBpe segments left-to-right non-overlapping in training order") {
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un"), ("hug", "s"))
    val docs = Seq((1L, "hugs pun bug"), (2L, ""), (3L, "aaa")).toDF("doc_id", "text")
    val out = TextStats.applyBpe(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r).toMap
    // hugs -> hug+s -> hugs (1); pun -> p+un -> pun (1); bug -> b|ug (2)
    assert(out(1L).getAs[Long]("n_tokens") == 3L)
    assert(out(1L).getAs[Long]("n_subwords") == 4L)
    assert(out(2L).getAs[Long]("n_subwords") == 0L)
    // no merge applies -> one subword per char
    assert(out(3L).getAs[Long]("n_subwords") == 3L)
    // left-to-right non-overlap: "aaa" under (a,a) merges the FIRST
    // pair only -> [aa, a] = 2 subwords
    val out2 = TextStats.applyBpe(docs, "doc_id", "text", Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_subwords")).toMap
    assert(out2(3L) == 2L)
  }

  test("applyBpe merges anchor on symbol boundaries, not raw substrings") {
    // 'other' under (t,h),(th,e),(e,r): o|t|h|e|r -> o|th|e|r -> o|the|r;
    // merge (e,r) must NOT fire on the 'e' that is the SUFFIX of 'the'
    // (an unanchored substring replace yields [o,ther] = 2 — the bug this
    // spec pins). Reference BPE gives [o,the,r] = 3.
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"))
    val docs = Seq((1L, "other"), (2L, "her there aaaa")).toDF("doc_id", "text")
    val out = TextStats.applyBpe(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_subwords")).toMap
    assert(out(1L) == 3L, s"'other' must segment [o,the,r], got ${out(1L)} subwords")
    // her: h|e|r -> (no th) -> e+r fires on a TRUE (e,r) symbol pair -> h|er = 2
    // there: t|h|e|r|e -> th|e|r|e -> the|r|e -> 'e,r' pair absent now -> 3
    // aaaa: untouched by these merges -> 4;  2 + 3 + 4 = 9
    assert(out(2L) == 9L, s"expected her=2 there=3 aaaa=4, total 9, got ${out(2L)}")
    // runs still merge non-overlapping left-to-right under paired sentinels
    val runs = TextStats.applyBpe(Seq((1L, "aaaa aaaaa")).toDF("doc_id", "text"),
      "doc_id", "text", Seq(("a", "a")))
      .collect().map(r => r.getAs[Long]("n_subwords")).head
    // aaaa -> [aa,aa] = 2; aaaaa -> [aa,aa,a] = 3
    assert(runs == 5L, s"run merging must stay non-overlapping, got $runs")
  }

  test("trainBpe does not count or merge pairs across symbol boundaries") {
    // vocab: 'othe' x3, 'er' x2.  Symbols after no merges: o|t|h|e x3, e|r x2.
    // TRUE pair counts: (o,t)=3 (t,h)=3 (h,e)=3 (e,r)=2.  An unanchored
    // counter ALSO sees (e,r) inside... nothing here yet, but after
    // merging, 'othe' ends in symbol 'e' only as part of larger symbols.
    val words = Seq.fill(3)("othe") ++ Seq.fill(2)("er")
    val planted = Seq(words.mkString(" ")).toDF("text")
    val m = TextStats.trainBpe(planted, "text", numMerges = 4, minPairCount = 2L)
    // rank1: count-3 three-way tie (h,e),(o,t),(t,h) -> pair ascending: (h,e)
    // then o|t|he x3, e|r x2: (o,t)=3,(t,he)=3,(e,r)=2 -> (o,t)
    // then ot|he x3: (ot,he)=3,(e,r)=2 -> (ot,he)
    // then othe x3, e|r x2: only (e,r)=2 — and it must NOT touch 'othe'
    assert(m == Seq(("h", "e", 3L), ("o", "t", 3L), ("ot", "he", 3L), ("e", "r", 2L)), m.toString)
  }

  test("fertilityStats computes hand-checked ratios and NULLs degenerate strata") {
    // "don't stop" -> words 2; bpe tokens: don|'|t|stop = 4; bytes 10
    // "résumé ok" -> words 2; bpe: résumé is non-ascii punct-class chars?
    //   [A-Za-z]+ matches "r" "sum" — é is neither letter-class nor digit:
    //   r|é|sum|é|ok = 5; utf-8 bytes = 6+2 + 1 + 2 = 11
    val docs = Seq(
      ("en", "don't stop"),
      ("fr", "résumé ok"),
      ("xx", "")).toDF("lang", "text")
    val out = TextStats.fertilityStats(docs, "text", Seq("lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("total_words") == 2L)
    assert(en.getAs[Long]("total_bpe_tokens") == 4L)
    assert(en.getAs[Long]("total_bytes") == 10L)
    assert(en.getAs[Double]("fertility") == 2.0)
    assert(en.getAs[Double]("bytes_per_token") == 2.5)
    val fr = out("fr")
    assert(fr.getAs[Long]("total_bpe_tokens") == 5L)
    assert(fr.getAs[Long]("total_bytes") == 11L)
    // empty stratum: zero words/tokens -> NULL ratios, not a crash
    val xx = out("xx")
    assert(xx.getAs[Long]("total_words") == 0L)
    assert(xx.isNullAt(xx.fieldIndex("fertility")))
    assert(xx.isNullAt(xx.fieldIndex("bytes_per_token")))
  }

  test("collocations: hand-computed PMI, floor, tie-break and k cut") {
    // 6x "san francisco has fog" + 6x "the fog the fog":
    // N1 = 48, c1: san/francisco/has = 6, fog = 18, the = 12; N2 = 36,
    // c2: (san,francisco)=(francisco,has)=(has,fog)=(fog,the)=6, (the,fog)=12
    val docs = ((1 to 6).map(i => (i.toLong, "san francisco has fog")) ++
      (7 to 12).map(i => (i.toLong, "the fog the fog"))).toDF("doc_id", "text")
    def pmi(c2: Double, ca: Double, cb: Double): Double =
      math.rint(math.log10((c2 / 36.0) / ((ca / 48.0) * (cb / 48.0))) * 1e6) / 1e6
    val out = TextStats.collocations(docs, "text", minCount = 5, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out.size == 5)
    // equal-PMI pair ties break by (w1, w2)
    assert(out(("francisco", "has")) == ((6L, pmi(6, 6, 6), 1L)))
    assert(out(("san", "francisco")) == ((6L, pmi(6, 6, 6), 2L)))
    // (has,fog) and (the,fog) tie at log10(3.5556) -> (w1,w2) order
    assert(out(("has", "fog")) == ((6L, pmi(6, 6, 18), 3L)))
    assert(out(("the", "fog")) == ((12L, pmi(12, 12, 18), 4L)))
    assert(out(("fog", "the")) == ((6L, pmi(6, 18, 12), 5L)))
    // floor: minCount 7 keeps only the 12-occurrence pair
    val floored = TextStats.collocations(docs, "text", minCount = 7, k = 100)
      .collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("the", "fog")))
    // k cut keeps the PMI-descending prefix
    val cut = TextStats.collocations(docs, "text", minCount = 5, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    assert(cut == Set(("francisco", "has", 1L), ("san", "francisco", 2L)))
  }

  test("UnigramSegment: max-score Viterbi, longest-match ties, unk fallback") {
    import graft.functions.UnigramSegment.unigramSegment
    val vocab = Seq("abc" -> -1.5, "ab" -> -1.0, "a" -> -2.0, "b" -> -2.0,
      "c" -> -2.0)
    val df = Seq((1L, "abc"), (2L, "abab"), (3L, "xa"), (4L, "")).toDF("id", "t")
    val out = df.select(col("id"), unigramSegment(col("t"), vocab).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // [abc] = -1.5 beats [ab,c] = -3.0 and [a,b,c] = -6.0
    assert(out(1L) == Seq("abc"))
    assert(out(2L) == Seq("ab", "ab"))
    // x is unknown -> unk single-char fallback, then known "a"
    assert(out(3L) == Seq("x", "a"))
    assert(out(4L) == Seq.empty)
    // tie: [ab] = -2.0 vs [a,b] = -4.0 no tie; force one: equal scores
    val tieVocab = Seq("ab" -> -4.0, "a" -> -2.0, "b" -> -2.0)
    val tie = Seq((1L, "ab")).toDF("id", "t")
      .select(unigramSegment(col("t"), tieVocab).as("p"))
      .head().getSeq[String](0)
    assert(tie == Seq("ab"), "equal-score segmentations prefer the longer piece")
    // astral-plane chars: the unk fallback must cover the WHOLE
    // surrogate pair — splitting it would emit unpaired halves ('?')
    val emoji = "😀" // U+1F600
    val astral = Seq((1L, s"a${emoji}b")).toDF("id", "t")
      .select(unigramSegment(col("t"), vocab).as("p"))
      .head().getSeq[String](0)
    assert(astral == Seq("a", emoji, "b"),
      s"surrogate pair must stay one unk piece, got $astral")
  }

  test("trainUnigramLm learns planted multi-char pieces; fertility beats chars; deterministic") {
    import spark.implicits._
    val docs = (Seq.fill(50)("aaaa") ++ Seq.fill(50)("bbbb") ++
      Seq.fill(20)("ab")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val pieces = TextStats.trainUnigramLm(docs, "text",
      vocabSize = 8, seedSize = 32, iters = 3, minCount = 2, maxPieceLen = 4)
    val byPiece = pieces.toMap
    assert(byPiece.contains("aaaa") && byPiece.contains("bbbb"),
      s"planted whole-word pieces must be learned, got ${pieces.map(_._1)}")
    assert(byPiece.contains("a") && byPiece.contains("b"),
      "single chars always retained for coverage")
    assert(pieces.size <= 8)
    // probabilities normalize
    val mass = pieces.map { case (_, lp) => math.pow(10, lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-9, s"prob mass $mass")
    // fertility: whole-word pieces segment the corpus near 1 piece/token
    val fert = TextStats.applyUnigramLm(docs, "doc_id", "text", pieces)
      .agg(avg(col("pieces_per_token"))).head().getDouble(0)
    assert(fert < 1.5, s"learned pieces must beat char segmentation, got $fert")
    // deterministic across runs
    val again = TextStats.trainUnigramLm(docs, "text",
      vocabSize = 8, seedSize = 32, iters = 3, minCount = 2, maxPieceLen = 4)
    assert(pieces == again)
  }

  test("psiReport: hand-computed Laplace shares and psi; identity drift is zero") {
    import spark.implicits._
    val base = (1 to 10).map(v => (v.toLong, v.toDouble)).toDF("id", "sig")
    val shifted = Seq(8.0, 9.0, 10.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "sig")
    // nBins=2: edge = median 5.5; base 5/5, cand 0/3
    val out = TextStats.psiReport(base, shifted, "sig", nBins = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0L) == ((5L, 0L, r6(-0.375 * math.log(0.25)))))
    assert(out(1L) == ((5L, 3L, r6(0.375 * math.log(1.75)))))
    // identical corpora: psi exactly zero in every bin
    val zero = TextStats.psiReport(base, base, "sig", nBins = 5)
      .agg(sum(abs(col("psi")))).head().getDouble(0)
    assert(zero == 0.0, "identity drift must be zero")
    // NULL signals excluded, not binned
    val nullFrame = spark.sql("SELECT CAST(99 AS BIGINT) AS id, CAST(NULL AS DOUBLE) AS sig")
    val counted = TextStats.psiReport(base, base.unionByName(nullFrame), "sig",
      nBins = 2).agg(sum(col("n_cand"))).head().getLong(0)
    assert(counted == 10L, "NULL signal rows must not be binned")
  }

  test("collocations plan: hash-keyed count shuffles, WindowGroupLimit rank") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nodes = PlanWalk.executedNodes(
      TextStats.collocations(docs, "text", minCount = 3, k = 10))
    // the PMI rank must trim map-side
    assert(nodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowGroupLimitExec]) >= 1,
      "expected WindowGroupLimitExec for the PMI rank")
    // the floored pair table probes the unigram counts via broadcast
    assert(nodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]) >= 2,
      "expected broadcast joins for both unigram probes")
    // the topNgrams discipline: no count shuffle keyed on word strings
    val shuffles = nodes.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    val wordKeyed = shuffles.exists(_.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions.exists(_.dataType ==
          org.apache.spark.sql.types.StringType)
      case _ => false
    })
    assert(!wordKeyed, "no shuffle may be keyed on token text")
  }

  test("phraseSearch: token boundaries, overlap counting, zero shuffle") {
    val docs = Seq(
      (1L, "the cat sat on the cat sat mat"),  // "cat sat" twice
      (2L, "concatenate satellites"),          // substring, NOT a token match
      (3L, "cat sat"),                         // exact doc == phrase
      (4L, "cat  \t sat"),                     // any whitespace run splits
      (5L, "a a a a"),                         // overlapping "a a" -> 3
      (6L, "cat"),                             // shorter than the phrase
      (7L, "sat cat")                          // right words, wrong order
    ).toDF("doc_id", "text")
    val out = TextStats.phraseSearch(docs, "doc_id", "text", "cat sat")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L), s"got $out")
    val ov = TextStats.phraseSearch(docs, "doc_id", "text", "a a")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov == Map(5L -> 3L), "overlapping occurrences all count")
    // phrase normalization: interior whitespace runs collapse
    val norm = TextStats.phraseSearch(docs, "doc_id", "text", "  cat \n sat ")
      .collect().map(_.getLong(0)).toSet
    assert(norm == Set(1L, 3L, 4L))
    intercept[IllegalArgumentException] {
      TextStats.phraseSearch(docs, "doc_id", "text", "   ")
    }
    // scale shape: a pure filter+projection over the scan — no exchange
    val plan = TextStats.phraseSearch(docs, "doc_id", "text", "cat sat")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phraseSearch must not shuffle:\n$plan")
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("lengthHistogram: exact power-of-two buckets incl. empty and boundary docs") {
    val docs = Seq(
      (1L, ""),                       // 0 tokens -> bucket -1
      (2L, "a"),                      // 1 -> bucket 0
      (3L, "a b"),                    // 2 -> bucket 1 (boundary)
      (4L, "a b c"),                  // 3 -> bucket 1
      (5L, "a b c d"),                // 4 -> bucket 2 (boundary)
      (6L, (1 to 7).map(_ => "w").mkString(" ")), // 7 -> bucket 2
      (7L, null.asInstanceOf[String]) // NULL excluded
    ).toDF("doc_id", "text")
    val out = TextStats.lengthHistogram(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out == Map(
      -1L -> ((0L, 1L, round6(1.0 / 6))),
      0L -> ((1L, 1L, round6(1.0 / 6))),
      1L -> ((2L, 2L, round6(2.0 / 6))),
      2L -> ((4L, 2L, round6(2.0 / 6)))), s"got $out")
  }

  test("vocabGrowthCurve: monotone, exact at hand-checked checkpoints, one scan") {
    val docs = Seq(
      (0L, "a b"), (1L, "a c"), (2L, "b c"),  // after 2 docs: {a,b,c}
      (3L, "d"), (4L, "a d e")                // after 4: +d; after 5: +e
    ).toDF("doc_id", "text")
    val out = TextStats.vocabGrowthCurve(docs, "doc_id", "text",
      Seq(2L, 4L, 5L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 3L, 4L -> 4L, 5L -> 5L), s"got $out")
    // one scan, one shuffle: the checkpoints share the first-id frame
    val nodes = PlanWalk.executedNodes(
      TextStats.vocabGrowthCurve(docs, "doc_id", "text", Seq(2L, 4L)))
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) <= 2,
      "all checkpoints must ride one first-appearance aggregate")
    intercept[IllegalArgumentException](
      TextStats.vocabGrowthCurve(docs, "doc_id", "text", Seq(5L, 2L)))
  }

  test("duplicateFamilySizes: hand-planted family shape") {
    val docs = (Seq.fill(3)("triple") ++ Seq.fill(2)("pair a") ++
      Seq.fill(2)("pair b") ++ Seq("solo x", "solo y", "solo z"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicateFamilySizes(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out == Map(
      1L -> ((3L, 3L, 0.3)), 2L -> ((2L, 4L, 0.4)), 3L -> ((1L, 3L, 0.3))),
      s"got $out")
  }

  test("sampleFidelity: near-zero PSI for a uniform sample, large for a biased one") {
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      (col("id") % 100).as("len"))
    val uniform = graft.operators.Sampling.hashSample(docs, "doc_id", 0.4)
    val fair = TextStats.sampleFidelity(docs, uniform, Seq("len"))
      .collect()(0)
    assert(fair.getString(0) == "len")
    assert(math.abs(fair.getDouble(3) - 0.4) < 0.05, "realized rate near 0.4")
    assert(fair.getDouble(4) < 0.05, s"uniform sample PSI ~0, got ${fair.getDouble(4)}")
    // a length-biased sample (only short docs survive) must light up
    val biased = docs.filter(col("len") < 30)
    val bad = TextStats.sampleFidelity(docs, biased, Seq("len")).collect()(0)
    assert(bad.getDouble(4) > 0.25, s"biased sample PSI must exceed 0.25, got ${bad.getDouble(4)}")
  }

  test("ngramNovelty: 0 for covered docs, 1 for unseen, partial overlap exact") {
    val ref = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d e f"),         // identical: novelty 0
      (2L, "x y z w v u"),         // disjoint: novelty 1
      (3L, "a b c d e f g"),       // 5 trigram... n=3: grams abc..efg
      (4L, "a b")                  // shorter than n: no row
    ).toDF("doc_id", "text")
    val out = TextStats.ngramNovelty(docs, ref, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 4L, 0.0)))
    assert(out(2L) == ((4L, 0L, 1.0)))
    // doc 3: 5 trigrams, 4 known ("e f g" is new) -> novelty 0.2
    assert(out(3L) == ((5L, 4L, 0.2)))
    assert(!out.contains(4L), "docs with < n tokens emit no row")
    // duplicate grams inside one doc count once (DISTINCT semantics)
    val rep = Seq((9L, "a b c a b c a b c")).toDF("doc_id", "text")
    val r9 = TextStats.ngramNovelty(rep, ref, "doc_id", "text", n = 3)
      .collect()(0)
    assert(r9.getLong(1) == 3L && r9.getLong(2) == 1L,
      "7 positions but 3 distinct trigrams (abc bca cab); only abc known")
  }

  test("phraseSearchMany: mixed lengths, one scan, broadcast probe") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a cat sat and a dog ran over the mat"),
      (3L, "dog ran dog ran dog"),
      (4L, "nothing to see")
    ).toDF("doc_id", "text")
    val out = TextStats.phraseSearchMany(docs, "doc_id", "text",
      Seq("cat sat", "dog ran", "the mat", "over the mat", "cat sat"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, "cat sat") -> 1L, (1L, "the mat") -> 1L,
      (2L, "cat sat") -> 1L, (2L, "dog ran") -> 1L,
      (2L, "the mat") -> 1L, (2L, "over the mat") -> 1L,
      (3L, "dog ran") -> 2L), s"got $out")
    val nodes = PlanWalk.executedNodes(TextStats.phraseSearchMany(
      docs, "doc_id", "text", Seq("cat sat", "over the mat")))
    // one corpus-side explode (no per-length scan union), broadcast join
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.GenerateExec]) == 1,
      "exactly one explode over the single flattened window array")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "phrase table must broadcast")
  }

  test("diversityCard: hand-computed entropy, TTR and perplexity") {
    val docs = Seq(("en", "a a b"), ("de", "x y")).toDF("lang", "text")
    val out = TextStats.diversityCard(docs, "text", Seq("lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // en: T=3, counts {a:2, b:1}: H = log2(3) - (2*log2 2 + 1*log2 1)/3
    val hEn = math.log(3) / math.log(2) - 2.0 / 3.0
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("en") == ((3L, 2L, 0.666667, r6(hEn), r6(math.pow(2, hEn)))))
    // de: two singletons: H = 1 bit, perplexity 2
    assert(out("de") == ((2L, 2L, 1.0, 1.0, 2.0)))
  }

  test("packFileManifest: per-file rollup matches the windows; arrays prune") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Seq(("74", "68"), ("7468", "65"))
    val packed = TextStats.materializePackedTokenIds(docs, "doc_id", "text",
      merges, budget = 64, shards = 4)
    val man = TextStats.packFileManifest(packed, windowsPerFile = 4)
    // like the datasheet: the manifest reads only the packer's scalar
    // columns, so the ids-mode kernel prunes out of the plan entirely
    val plan = man.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_byte_bpe_ids"),
      "token arrays must prune out of the manifest plan")
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val want = rows.groupBy { case (sh, sq, _, _) => (sh, sq / 4) }
      .map { case ((sh, f), ws) =>
        (sh, f) -> (ws.map(_._2).min, ws.map(_._2).max, ws.length.toLong,
          ws.map(_._3).sum, ws.map(_._4).sum, 0L)
      }
    val got = man.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    assert(got == want, "per-file rollup must match the materialized windows")
    // files never span shards; every non-terminal file is FULL
    val lastFile = got.keys.groupBy(_._1).map { case (sh, ks) =>
      sh -> ks.map(_._2).max }
    got.foreach { case ((sh, f), (_, _, nw, _, _, _)) =>
      if (f != lastFile(sh)) assert(nw == 4L, s"non-terminal file ($sh,$f) " +
        s"must hold exactly windowsPerFile windows, got $nw")
    }
    // the truncated flag aggregates when the input carries one
    val fake = Seq((0L, 0L, 10L, 2L, true), (0L, 1L, 8L, 1L, false),
      (0L, 4L, 10L, 3L, true))
      .toDF("shard", "seq_id", "n_tokens", "n_docs", "truncated")
    val m2 = TextStats.packFileManifest(fake, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(7)).toMap
    assert(m2 == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L))
  }

  test("packDatasheet: stats match the packed output; id arrays prune; truncation counted") {
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Seq(("74", "68"), ("7468", "65"))
    val packed = TextStats.materializePackedTokenIds(docs, "doc_id", "text",
      merges, budget = 64, shards = 4)
    val card = TextStats.packDatasheet(packed, 64)
    // the card must never build the token arrays: the ids-mode kernel
    // prunes out of the aggregate (only the count-mode sizing survives)
    val plan = card.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_byte_bpe_ids"),
      "token arrays must prune out of the datasheet plan")
    assert(plan.contains("graft_byte_bpe_count"),
      "the count-mode sizing is the only kernel the card needs")
    val rows = packed.collect()
    val r = card.collect().head
    val nw = rows.length.toLong
    val tot = rows.map(_.getLong(3)).sum
    val nds = rows.map(_.getLong(4))
    assert(r.getLong(0) == nw)
    assert(r.getLong(1) == rows.map(_.getLong(0)).distinct.length.toLong)
    assert(r.getLong(2) == tot)
    assert(r.getDouble(3) == r6(tot.toDouble / (nw * 64L).toDouble))
    assert(r.getLong(4) == rows.count(_.getLong(3) == 64L).toLong)
    assert(r.getDouble(5) == r6(nds.sum.toDouble / nw.toDouble))
    assert(r.getLong(6) == nds.min && r.getLong(7) == nds.max)
    assert(r.getLong(8) == 0L, "concat-and-chop never truncates")
    // a frame WITH the truncation flag counts truncated windows
    val fake = Seq((0L, 0L, 10L, 2L, true), (0L, 1L, 8L, 1L, false),
      (1L, 0L, 10L, 3L, true))
      .toDF("shard", "seq_id", "n_tokens", "n_docs", "truncated")
    val c2 = TextStats.packDatasheet(fake, 10).collect().head
    assert(c2.getLong(0) == 3L && c2.getLong(1) == 2L && c2.getLong(2) == 28L)
    assert(c2.getDouble(3) == r6(28.0 / 30.0))
    assert(c2.getLong(4) == 2L)
    assert(c2.getDouble(5) == 2.0)
    assert(c2.getLong(6) == 1L && c2.getLong(7) == 3L)
    assert(c2.getLong(8) == 2L)
  }
}
