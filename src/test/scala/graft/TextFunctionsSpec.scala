package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c).collect().head.get(0).asInstanceOf[T]

  test("tokenCount counts \\S+ runs") {
    assert(one[Long](tokenCount(col("t")), "a  b\tc\nd") == 4L)
  }

  test("stagedQuality evaluates TokenProfile exactly once per row (plan-asserted)") {
    // the whole point of the staging: six published columns referencing
    // the counts struct must not inline six copies of the byte-scan
    // (CollapseProject keeps the stage because the alias is referenced
    // by several non-cheap expressions). Walk the executed plan's
    // expression trees (shared PlanWalk helper) and count instances.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (staged, cols) = stagedQuality(docs, col("text"))
    val out = staged.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
    val count = PlanWalk.executedNodes(out)
      .flatMap(_.expressions)
      .map(_.collect { case t: graft.functions.TokenProfile => t }.size)
      .sum
    assert(count == 1, s"TokenProfile appears $count times in the physical plan")
  }

  test("staged native quality equals the declarative formulation on every sf0.01 doc") {
    // value oracle for the one-pass TokenProfile expression: the six
    // published columns must be row-identical (exact longs, bit-equal
    // doubles from the same integer divisions) across the corpus plus
    // adversarial edge docs — multi-space/tab/newline whitespace,
    // stopwords at token boundaries, CJK + accents (multi-byte chars),
    // control chars, punctuation runs, empty text
    val edge = Seq(
      (90001L, "the  a of\tand\nto in is it that for"), // all stopwords, mixed ws
      (90002L, "木木木 já già naïve £5 ... ?!;:,."),
      (90003L, ""), (90004L, "x"), (90005L, "the quick... brown fox!?"),
      (90006L, "athe thea the. .the the the"),
      (90007L, " ctrl chars")
    ).toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").unionAll(edge)
    val declCols = qualityColumns(col("text"))
    val decl = docs.select(col("doc_id") +: declCols.map { case (n, c) => c.as(n) }: _*)
    val (staged, natCols) = stagedQuality(docs, col("text"))
    val nat = staged.select(col("doc_id") +: natCols.map { case (n, c) => c.as(n) }: _*)
    assert(nat.exceptAll(decl).isEmpty && decl.exceptAll(nat).isEmpty,
      "staged native quality differs from declarative formulation")
    assert(nat.count() == decl.count())
  }
  test("bpeTokenCount splits letter/digit/punct runs") {
    // "Hello" "," "world" "!" "42" -> 5
    assert(one[Long](bpeTokenCount(col("t")), "Hello, world! 42") == 5L)
  }
  private def shingles(n: Int, text: String): Seq[String] =
    Seq(text).toDF("t").select(wordShingles(col("t"), n))
      .collect().head.getSeq[String](0).toList

  test("wordShingles builds n-grams, distinct, empty under n tokens") {
    assert(shingles(3, "a b c d") == Seq("a b c", "b c d"))
    assert(shingles(3, "a b").isEmpty)
    // repeated shingle collapses (distinct)
    assert(shingles(2, "x y x y") == Seq("x y", "y x"))
  }
  test("detectLanguage classifies stopword-profiled snippets") {
    val cases = Map(
      "the cat is in the house and it is fine" -> "en",
      "der Hund ist nicht das Problem und ein Freund" -> "de",
      "le chat est dans la maison et les chiens dorment" -> "fr",
      "el perro es un animal y los gatos duermen" -> "es",
      "你好世界" -> "zh",
      "xyzzy plugh qwertz" -> "unknown")
    for ((text, want) <- cases)
      assert(one[String](detectLanguage(col("t")), text) == want, text)
    // the staged form agrees on the same snippets
    val df = cases.keys.toSeq.toDF("t")
    val staged = withDetectedLanguage(df, col("t"), "lang")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(staged == cases)
  }

  test("withDetectedLanguage equals detectLanguage on every sf0.01 doc") {
    // the staged (tokenize-once) plan is the hot path; the single-Column
    // when-chain stays as its value oracle — they must never diverge
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val diff = withDetectedLanguage(docs, col("text"), "staged")
      .withColumn("reference", detectLanguage(col("text")))
      .filter(col("staged") =!= col("reference") ||
        col("staged").isNull =!= col("reference").isNull)
      .count()
    assert(diff == 0L)
  }
  test("quality metrics on a crafted doc") {
    val text = "the quick brown fox, it jumps!" // 6 tokens, 2 punct marks
    val df = Seq(text).toDF("t")
    val cols = qualityColumns(col("t"))
    val row = df.select(cols.map { case (n, c) => c.as(n) }: _*).collect().head
    assert(row.getAs[Long]("n_chars") == text.length)
    assert(row.getAs[Long]("n_tokens") == 6L)
    // stopwords present: the, it -> 2/6
    assert(math.abs(row.getAs[Double]("stopword_ratio") - 2.0 / 6) < 1e-12)
    assert(math.abs(row.getAs[Double]("punct_ratio") - 2.0 / text.length) < 1e-12)
    // score: n_tokens<10 (0) + mean_len in 3..12 (1) + stop ratio ok (1) + ascii (1)
    assert(row.getAs[Int]("quality_score") == 3)
  }
  test("contentFingerprint is md5 hex") {
    assert(one[String](contentFingerprint(col("t")), "abc")
      == "900150983cd24fb0d6963f7d28e17f72")
  }
  test("rollingHash is order-sensitive and deterministic") {
    val h1 = one[Long](rollingHash(col("t")), "a b c")
    val h2 = one[Long](rollingHash(col("t")), "c b a")
    val h3 = one[Long](rollingHash(col("t")), "a b c")
    assert(h1 != h2)
    assert(h1 == h3)
    assert(h1 >= 0 && h1 < 1000000007L) // modular range
  }
  test("redactPii scrubs emails, ssn-like ids, ipv4s and phone numbers; " +
    "clean text passes through byte-identical") {
    def red(t: String): String = one[String](redactPii(col("t")), t)
    assert(red("write to jane.doe+news@sub.example.co.uk today") ==
      "write to <EMAIL> today")
    assert(red("server at 192.168.0.17 and 8.8.8.8 replied") ==
      "server at <IP> and <IP> replied")
    assert(red("ssn 123-45-6789 on file") == "ssn <ID> on file")
    assert(red("call +14155550133 or 415-555-0133") ==
      "call <PHONE> or <PHONE>")
    // order: the SSN is tagged <ID>, never half-eaten by the phone rule
    assert(red("id 987-65-4321 tel 212-555-0100") ==
      "id <ID> tel <PHONE>")
    // versions, decimals, plain words survive untouched
    val clean = "release v2.4.1 costs 12.50 at example dot com, section 3-4"
    assert(red(clean) == clean)
  }

  test("piiCounts attributes each match to exactly one type, along the " +
    "redaction chain") {
    def counts(t: String): Map[String, Long] = {
      val df = Seq(t).toDF("t")
      val row = df.select(piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
        .collect().head
      PiiCountLabels.map(l => l -> row.getAs[Long](l)).toMap
    }
    assert(counts("a@b.com and c@d.org, ssn 123-45-6789, 10.0.0.1, +12025550199") ==
      Map("n_emails" -> 2L, "n_ids" -> 1L, "n_ips" -> 1L, "n_phones" -> 1L))
    // the SSN counts as an ID only — the phone rule never sees its digits
    assert(counts("987-65-4321")("n_phones") == 0L)
    assert(counts("987-65-4321")("n_ids") == 1L)
    // an IP inside an email's domain counts as part of the email, not an IP
    assert(counts("root@10.1.2.3.example.com") ==
      Map("n_emails" -> 1L, "n_ids" -> 0L, "n_ips" -> 0L, "n_phones" -> 0L))
    assert(counts("no pii here").values.sum == 0L)
  }

  test("scriptCounts fires per writing system and zeroes the rest") {
    def counts(t: String): Map[String, Long] = {
      val df = Seq(t).toDF("t")
      val row = df.select(scriptCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
        .collect().head
      ScriptRanges.map(_._1).map(l => l -> row.getAs[Long](l)).toMap
    }
    val ascii = counts("plain english 123")
    assert(ascii("n_latin") == 12L)
    assert(ascii.filterNot(_._1 == "n_latin").values.forall(_ == 0L))
    val ru = counts("привет мир")
    assert(ru("n_cyrillic") == 9L && ru("n_latin") == 0L)
    val zh = counts("你好世界 hello")
    assert(zh("n_cjk") == 4L && zh("n_latin") == 5L)
    val mixed = counts("καλά 한글 テスト परीक्षा اختبار")
    assert(mixed("n_greek") == 4L && mixed("n_hangul") == 2L &&
      mixed("n_kana") == 3L && mixed("n_arabic") == 6L)
    assert(mixed("n_devanagari") == 7L) // incl. combining marks in the block
  }

  test("zlib compressionRatio: boilerplate below prose, deterministic, bounded") {
    import graft.functions.ZlibSignal
    def ratio(t: String): Option[Double] = {
      val r = Seq(t).toDF("t")
        .select(ZlibSignal.compressionRatio(col("t")).as("r")).collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val rep = Seq.fill(50)("click here to subscribe now").mkString(" ")
    val prose = "the quick brown fox jumps over the lazy dog while autumn " +
      "leaves drift slowly past the quiet river and distant hills fade away"
    assert(ratio(rep).get < 0.2, s"boilerplate ${ratio(rep)}")
    assert(ratio(prose).get > 0.3 && ratio(prose).get < 1.5)
    assert(ratio(rep).get < ratio(prose).get)
    assert(ratio(rep) == ratio(rep), "deterministic")
    // empty doc: no ratio (the zlib header would dominate); length still > 0
    assert(ratio("") == None)
    val len = Seq("").toDF("t")
      .select(ZlibSignal.deflateLength(col("t")).as("l")).collect().head.getLong(0)
    assert(len > 0L)
  }

  test("simhash63: identical equal; near-dup closer than unrelated") {
    val base = "spark window merge join the fast table scan with hash keys and rows"
    val near = base.replace("fast", "quick")
    val far = "completely different words about gardens flowers bees honey sunshine rain"
    val Seq(hBase, hNear, hFar) = Seq(base, near, far).map(t => one[Long](simhash63(col("t")), t))
    assert(hBase == one[Long](simhash63(col("t")), base))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hBase, hNear) < ham(hBase, hFar))
    assert(hBase >= 0) // 63-bit: sign bit never set
  }

  test("HashingVector matches the declarative xxhash64 formulation exactly") {
    // value oracle: explode tokens, Spark's own xxhash64 (seed 42 = the
    // kernel's), signed bucket sums, L2-normalize driver-side. All
    // intermediate values are small integers in doubles -> the native
    // one-pass kernel must match BITWISE, doc for doc, on real corpus
    // text (multi-space runs, unicode, empty docs included).
    val dim = 16
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val native = docs.select(col("doc_id"),
        hashingVector(col("text"), dim).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ref = docs.select(col("doc_id"),
        explode_outer(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        val acc = new Array[Double](dim)
        rows.foreach { r =>
          if (!r.isNullAt(1)) { // explode_outer null for token-less docs
            val h = r.getLong(1)
            acc((((h % dim) + dim) % dim).toInt) += (if (h < 0) -1.0 else 1.0)
          }
        }
        val n = math.sqrt(acc.map(x => x * x).sum)
        id -> (if (n > 0) acc.map(_ / n) else acc)
      }
    assert(native.keySet == ref.keySet)
    native.foreach { case (id, v) =>
      assert(v.sameElements(ref(id)), s"doc $id vectors differ")
    }
    // unit norm for every non-empty doc; zero vector for empty
    native.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-12 || n == 0.0)
    }
  }

  test("hashing vectors plug text into the vector family: exact dups collapse") {
    // real corpus + PLANTED exact dups (the small SFs carry none): two
    // copies of existing docs under fresh ids
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val planted = base.filter(col("doc_id") < 2)
      .select((col("doc_id") + 10001L).as("doc_id"), col("text"))
    val docs = base.unionAll(planted)
    val vecs = docs.select(col("doc_id"),
      hashingVector(col("text"), 64).as("embedding"))
    // identical texts -> identical vectors -> cosine 1: semanticCollapse
    // at a high threshold must keep at most one doc per exact-dup group
    val kept = graft.operators.Similarity
      .semanticCollapse(vecs, "doc_id", "embedding", threshold = 0.999)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dupGroups = docs.groupBy("text").agg(
        collect_list("doc_id").as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .collect().map(_.getSeq[Long](1)) // row = (text, ids, n)
    assert(dupGroups.size >= 2, "planted dup groups missing")
    // (a group may keep ZERO members if its component's survivor is an
    // outside near-dup — never more than one)
    dupGroups.foreach { ids =>
      assert(ids.count(kept) <= 1, s"group $ids kept more than one")
    }
    assert(kept.size < docs.count(), "collapse must actually drop dups")
  }

  test("normalizeAggressive erases punctuation and digit cosmetics, keeps letters") {
    assert(one[String](normalizeAggressive(col("t")),
      "Hello, World! 2024 visits: 1,234") == "hello world 0000 visits 0 000")
    // two recrawls differing only in timestamps/punctuation share a form
    val a = one[String](normalizeAggressive(col("t")), "Posted 2024-01-02. Hello!")
    val b = one[String](normalizeAggressive(col("t")), "Posted 1999/12/31 - Hello")
    assert(a == b && a == "posted 0000 00 00 hello", s"$a / $b")
    // non-Latin letters survive the ASCII punctuation strip
    assert(one[String](normalizeAggressive(col("t")), "中文 text. 中文") == "中文 text 中文")
  }

  test("normalizeForDedup canonicalizes Unicode form, case and whitespace") {
    // NFD "café" (e + combining acute) must equal NFC "café"
    val nfd = "Café  au \t Lait"
    val nfc = "café au lait"
    assert(one[String](normalizeForDedup(col("t")), nfd) == nfc)
    assert(one[String](normalizeForDedup(col("t")), " CAFÉ AU LAIT ") == nfc)
    // already-canonical ASCII passes through untouched
    assert(one[String](normalizeForDedup(col("t")), "plain text") == "plain text")
    // distinct content stays distinct
    assert(one[String](normalizeForDedup(col("t")), "cafe au lait") != nfc)
    // fingerprints collapse across the normalization classes
    val docs = Seq((1L, nfd), (2L, nfc.toUpperCase), (3L, "unrelated"))
      .toDF("doc_id", "text")
    val groups = docs
      .groupBy(contentFingerprint(normalizeForDedup(col("text"))).as("fp"))
      .count().collect().map(_.getLong(1)).sorted
    assert(groups.toSeq == Seq(1L, 2L))
  }

  test("stripMarkup drops tags, decodes entities once, collapses whitespace") {
    assert(one[String](stripMarkup(col("t")),
      "<div class=\"x\"><p>Hello <b>world</b></p></div>") == "Hello world")
    // single-pass decode: &amp;lt; is the literal TEXT "&lt;", not "<"
    assert(one[String](stripMarkup(col("t")), "a &amp;lt; b") == "a &lt; b")
    assert(one[String](stripMarkup(col("t")),
      "x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; y") ==
      "x <tag> \"q\" 's' & y")
    // comments go with the tag pattern; nbsp becomes plain space
    assert(one[String](stripMarkup(col("t")),
      "a <!-- hidden --> b&nbsp;c") == "a b c")
    // documented floor: script BODIES survive, only their tags go
    assert(one[String](stripMarkup(col("t")),
      "<script>var x=1;</script> text") == "var x=1; text")
    // markup-free text passes through (modulo whitespace collapse)
    assert(one[String](stripMarkup(col("t")), "plain  text") == "plain text")
  }

  test("removeStopwords rebuilds text without listed tokens, case-insensitive") {
    val docs = Seq(
      (1L, "The cat is ON the mat"), // The/the/is removed, ON kept (not listed)
      (2L, "the a of"),              // everything removed -> empty string
      (3L, "keep everything here")).toDF("doc_id", "text")
    val out = graft.operators.CorpusClean.removeStopwords(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "cat ON mat")
    assert(out(2L) == "")
    assert(out(3L) == "keep everything here")
    // zero shuffle: one row-local projection
    assert(PlanWalk.shuffleCount(
      graft.operators.CorpusClean.removeStopwords(docs, "text")) == 0)
  }

  test("blocklistFilter drops any-phrase matches case-insensitively; audit inverts") {
    val docs = Seq(
      (1L, "totally fine text"),
      (2L, "contains a Banned Phrase here"),
      (3L, "BANNED PHRASE at the start"),
      (4L, "another bad thing entirely")).toDF("doc_id", "text")
    val kept = graft.operators.CorpusClean.blocklistFilter(docs, "text",
      Seq("banned phrase", "bad thing")).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L))
    val dropped = graft.operators.CorpusClean.blocklistFilter(docs, "text",
      Seq("banned phrase", "bad thing"), keepMatches = true).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(dropped.toSeq == Seq(2L, 3L, 4L))
    // zero-shuffle: the list compiles to a codegen'd filter
    assert(PlanWalk.shuffleCount(graft.operators.CorpusClean.blocklistFilter(
      docs, "text", Seq("banned phrase"))) == 0)
  }

  test("filterFunnel: cumulative per-stage survival in one pass; NULL condition drops") {
    val docs = Seq(
      (1L, "aaaa", Some("en")),   // survives s1 only
      (2L, "aaaa", Some("de")),   // survives s1 only
      (3L, "aaaaaaaa", Some("en")), // survives all
      (4L, "aa", Some("en")),     // dropped at s1
      (5L, "aaaaaaaa", None)      // NULL lang: dropped at s2
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.CorpusClean.filterFunnel(docs, Seq(
        "min_len" -> (length(col("text")) >= 4),
        "lang_en" -> (col("lang") === "en"),
        "long" -> (length(col("text")) >= 8)))
      .orderBy("stage_index").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("min_len", 5L, 4L), ("lang_en", 4L, 2L), ("long", 2L, 1L)))
    assert(out(0).getDouble(5) == 0.2) // 1 of 5 dropped
    // one pass: a single aggregate pair (partial+final), one exchange
    assert(PlanWalk.shuffleCount(graft.operators.CorpusClean.filterFunnel(docs,
      Seq("a" -> (length(col("text")) >= 4), "b" -> (col("lang") === "en")))) <= 1,
      "funnel must be one aggregation pass, not one scan per stage")
  }

  test("mojibakeHits counts each artifact family once, clean text zero") {
    import spark.implicits._
    val df = Seq(
      (1L, "café naïve résumé"),          // CORRECT accents: 0
      (2L, "cafÃ©"),                                // Ã© : 1
      (3L, "donâ€™t donâ€œ"),   // two â€ families: 2
      (4L, "ï»¿head"),                         // decoded BOM: 1
      (5L, "AÂ B"),                                 // Â+NBSP: 1
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        graft.functions.TextFunctions.mojibakeHits(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // NULL text -> actually NULL (NOT legacy size's -1) — pin the type
    assert(rows(6L).isNullAt(1), "NULL text must yield NULL hits")
    val out = rows.collect { case (id, r) if !r.isNullAt(1) => id -> r.getLong(1) }
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("filterLines: each line rule trips on its planted violation; doc-level share drop") {
    import spark.implicits._
    val prose = "this is a perfectly reasonable paragraph of running text"
    val docs = Seq(
      // one violation per rule, sandwiched in prose
      (1L, s"$prose\nBUY NOW CLICK HERE\n12345 67890 424242\n  Sign In  \nok\n$prose"),
      (2L, prose),                       // clean: byte-identical passthrough
      (3L, "SHOUT ME\n999 111"),         // everything removed -> share 1.0 -> doc dropped
      (4L, null.asInstanceOf[String])    // NULL text passes through untouched
    ).toDF("doc_id", "text")
    val out = graft.operators.CorpusClean.filterLines(docs, "text")
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(3L), "all-furniture doc must drop on removed_char_share")
    assert(rows(1L).getString(1) == s"$prose\n$prose",
      "upper-ratio, digit-ratio, boilerplate and short lines must all be removed")
    assert(rows(1L).getAs[Long]("n_lines") == 6L &&
      rows(1L).getAs[Long]("n_lines_kept") == 2L)
    assert(rows(2L).getString(1) == prose && rows(2L).getAs[Double]("removed_char_share") == 0.0)
    assert(rows(4L).isNullAt(1) && rows(4L).isNullAt(rows(4L).fieldIndex("n_lines")) &&
      rows(4L).getAs[Double]("removed_char_share") == 0.0,
      "NULL text: NULL text/counts, share 0, row kept")
    // mixed-case prose survives the upper rule; "  Sign In  " trims+lowers
    // to the boilerplate entry even though its raw form differs
    // idempotence: corrected text has no removable lines left
    val again = graft.operators.CorpusClean.filterLines(out.drop(
      "n_lines", "n_lines_kept", "removed_char_share"), "text")
    assert(again.filter(col("doc_id") === 1L).head().getString(1) == s"$prose\n$prose")
    // row-local: zero shuffle, no join
    val nodes = PlanWalk.executedNodes(graft.operators.CorpusClean.filterLines(docs, "text"))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "filterLines must not shuffle")
  }

  test("dedupLinesWithinDoc keeps first occurrences, spares blanks, row-local") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Home | About\ncontent one\nHome | About\ncontent two\nhome |  about"),
      (2L, "a\n\nb\n\nc"),          // blank lines never dedup
      (3L, "unique one\nunique two"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.operators.CorpusClean.dedupLinesWithinDoc(docs, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // normalized compare: case + interior whitespace runs fold together
    assert(out(1L).getString(1) == "Home | About\ncontent one\ncontent two",
      s"got ${out(1L).getString(1)}")
    assert(out(1L).getAs[Long]("n_lines") == 5L &&
      out(1L).getAs[Long]("n_dup_lines_removed") == 2L)
    assert(out(2L).getString(1) == "a\n\nb\n\nc" &&
      out(2L).getAs[Long]("n_dup_lines_removed") == 0L,
      "blank lines are layout, not dupes")
    assert(out(3L).getString(1) == "unique one\nunique two")
    assert(out(4L).isNullAt(1) &&
      out(4L).isNullAt(out(4L).fieldIndex("n_lines")),
      "NULL text passes through")
    // scale shape: zero shuffle
    val nodes = PlanWalk.executedNodes(
      graft.operators.CorpusClean.dedupLinesWithinDoc(docs, "text"))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "dedupLinesWithinDoc must not shuffle")
  }
}
