package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseJson extracts typed fields with an explicit schema") {
    val df = Seq((1L, """{"k": 42}"""), (2L, """{"k": null}""")).toDF("id", "props")
    val parsed = Multimodal.parseJson(df, "props",
      StructType(Seq(StructField("k", LongType))), "p")
    val ks = parsed.select(col("p.k")).collect()
    assert(ks(0).getLong(0) == 42L)
    assert(ks(1).isNullAt(0))
  }
  test("binaryMeta computes length, md5, first byte columnar") {
    val df = Seq("abc").toDF("t").withColumn("bin", encode(col("t"), "UTF-8"))
    val meta = Multimodal.binaryMeta(col("bin"))
    val row = df.select(meta.map { case (n, c) => c.as(n) }: _*).collect().head
    assert(row.getAs[Long]("n_bytes") == 3L)
    assert(row.getAs[String]("content_md5") == "900150983cd24fb0d6963f7d28e17f72")
    assert(row.getAs[Long]("first_byte") == 'a'.toLong)
  }
  test("binaryMeta first_byte is the raw byte for non-UTF8 payloads (magic bytes)") {
    // JPEG (0xFF) and PNG (0x89) magic bytes are invalid UTF-8 lead bytes;
    // a decode-based extraction would fold both into U+FFFD (65533).
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
    val png = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)
    val df = Seq(Tuple1(jpeg), Tuple1(png), Tuple1(Array.empty[Byte])).toDF("bin")
    val meta = Multimodal.binaryMeta(col("bin"))
    val rows = df.select(meta.map { case (n, c) => c.as(n) }: _*)
      .orderBy(desc("n_bytes"), asc_nulls_first("first_byte")).collect()
    val bytes = rows.map(r => if (r.isNullAt(2)) -1L else r.getAs[Long]("first_byte"))
    assert(bytes.toSet == Set(0x89L, 0xFFL, -1L), bytes.mkString(","))
  }
  test("stub decoder is deterministic and byte-sensitive") {
    val dec = new Multimodal.StubMediaDecoder
    val a1 = dec.decode(Multimodal.MediaRow(1, "image", Array[Byte](1, 2, 3)))
    val a2 = dec.decode(Multimodal.MediaRow(1, "image", Array[Byte](1, 2, 3)))
    val b = dec.decode(Multimodal.MediaRow(1, "image", Array[Byte](9, 9, 9)))
    assert(a1 == a2.copy(feature = a1.feature) && a1.feature.sameElements(a2.feature))
    assert(a1.width != b.width || a1.height != b.height)
    assert(a1.width > 0 && a1.height > 0 && a1.feature.length == 8)
  }
  // --- real ImageIO decode path -------------------------------------------

  private def encodeImg(fmt: String, w: Int, h: Int,
                        px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("ImageIoDecoder decodes real PNG/BMP/GIF pixels exactly") {
    val dec = new Multimodal.ImageIoDecoder()
    val red = dec.decode(Multimodal.MediaRow(1, "image",
      encodeImg("png", 8, 5, (_, _) => 0xFF0000)))
    assert(red.width == 8 && red.height == 5 && red.nFrames == 1)
    assert(red.feature(0) == 1f && red.feature(1) == 0f && red.feature(2) == 0f)
    assert(math.abs(red.feature(3) - 1f / 3f) < 1e-6, "gray of pure red is 1/3")
    val bw = dec.decode(Multimodal.MediaRow(2, "image",
      encodeImg("bmp", 6, 4, (_, y) => if (y < 2) 0x000000 else 0xFFFFFF)))
    assert(bw.width == 6 && bw.height == 4)
    assert(bw.feature(0) == 0.5f && bw.feature(3) == 0.5f)
    assert(bw.feature(4) == 0f && bw.feature(5) == 1f, "gray spans [0,1]")
    val white = dec.decode(Multimodal.MediaRow(3, "image",
      encodeImg("gif", 3, 7, (_, _) => 0xFFFFFF)))
    assert(white.width == 3 && white.height == 7)
    assert(white.feature.take(6).forall(_ == 1f), "white survives GIF palette")
  }

  test("ImageIoDecoder dims agree with the independent header parsers") {
    // two implementations, same answer: the codec-free byte parser and
    // the real JDK raster decode
    val fixtures = Seq(
      "png" -> encodeImg("png", 21, 13, (x, y) => (x * 7 + y) << 8),
      "bmp" -> encodeImg("bmp", 9, 17, (_, _) => 0x123456),
      "gif" -> encodeImg("gif", 5, 6, (_, _) => 0x000000),
      "jpeg" -> encodeImg("jpg", 32, 24, (_, _) => 0x808080))
    val dec = new Multimodal.ImageIoDecoder()
    fixtures.zipWithIndex.foreach { case ((fmt, bytes), i) =>
      val hexed = bytes.map("%02X".format(_)).mkString
      val hdr = dims(i.toLong -> hexed)(i.toLong)
      val d = dec.decode(Multimodal.MediaRow(i.toLong, "image", bytes))
      assert(hdr._1.contains(if (fmt == "jpg") "jpeg" else fmt), s"$fmt header format")
      assert(hdr._2.contains(d.width) && hdr._3.contains(d.height),
        s"$fmt: header ${hdr._2}x${hdr._3} vs decode ${d.width}x${d.height}")
    }
  }

  test("ImageIoDecoder JPEG decode: exact dims, approximate pixels") {
    // JPEG is lossy — dims are exact, means only approximate
    val d = new Multimodal.ImageIoDecoder().decode(Multimodal.MediaRow(
      1, "image", encodeImg("jpg", 16, 12, (_, _) => 0xC08040)))
    assert(d.width == 16 && d.height == 12)
    assert(math.abs(d.feature(0) - 0xC0 / 255f) < 0.05 &&
      math.abs(d.feature(1) - 0x80 / 255f) < 0.05 &&
      math.abs(d.feature(2) - 0x40 / 255f) < 0.05)
  }

  test("ImageIoDecoder degrades cleanly and honors the fallback") {
    val garbage = Multimodal.MediaRow(9, "image", Array[Byte](1, 2, 3, 4))
    val bare = new Multimodal.ImageIoDecoder().decode(garbage)
    assert(bare.width == 0 && bare.height == 0 && bare.nFrames == 0 &&
      bare.feature.isEmpty && bare.nBytes == 4L)
    val viaStub = new Multimodal.ImageIoDecoder(
      Some(new Multimodal.StubMediaDecoder)).decode(garbage)
    assert(viaStub.width > 0, "fallback decoder handles what ImageIO cannot")
    // truncated real container: header parser resolves format, decode degrades
    val png = encodeImg("png", 4, 4, (_, _) => 0xFF0000)
    val trunc = new Multimodal.ImageIoDecoder().decode(
      Multimodal.MediaRow(10, "image", png.take(12)))
    assert(trunc.width == 0 && trunc.height == 0)
  }

  test("decodeBatch with ImageIoDecoder is distributed and row-local") {
    val png = encodeImg("png", 8, 5, (_, _) => 0xFF0000)
    val rows = (1L to 20L).map(i => (i, "image", png))
    val df = spark.createDataFrame(rows).toDF("id", "kind", "bytes")
    val out = Multimodal.decodeBatch(df, () => new Multimodal.ImageIoDecoder(),
      partitions = 4).collect()
    assert(out.length == 20 && out.forall(d => d.width == 8 && d.height == 5))
  }

  test("averageHash: hand-computable 8x8 blocks, format-invariant") {
    // top-black/bottom-white 8x8: blocks are the pixels; bottom 32
    // blocks exceed the grid mean -> bits 32..63
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (y < 4) 0x000000 else 0xFFFFFF)
    assert(Multimodal.averageHash(img) == 0xFFFFFFFF00000000L)
    // the same pixels through three containers hash identically
    import spark.implicits._
    def px(x: Int, y: Int) = if (y < 4) 0x000000 else 0xFFFFFF
    val df = Seq(
      (1L, encodeImg("png", 8, 8, px)), (2L, encodeImg("bmp", 8, 8, px)),
      (3L, encodeImg("gif", 8, 8, px)),
      (4L, Array[Byte](1, 2, 3))).toDF("id", "bin")
    val got = Multimodal.withPerceptualHash(df, "id", "bin")
      .collect().map(h => h.id -> h.phash).toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L) &&
      got(1L).contains(0xFFFFFFFF00000000L))
    assert(got(4L).isEmpty, "undecodable payloads hash to None")
  }

  test("averageHash: small edits move few bits, different pictures many") {
    def hashOf(px: (Int, Int) => Int): Long = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, px(x, y))
      Multimodal.averageHash(img)
    }
    val base = hashOf((x, y) => if (y < 32) 0x000000 else 0xFFFFFF)
    // flip a 3x3 corner patch: no 8x8 block's mean crosses the grid mean
    val edited = hashOf((x, y) =>
      if (x < 3 && y < 3) 0xFFFFFF
      else if (y < 32) 0x000000 else 0xFFFFFF)
    val other = hashOf((x, y) => if (x < 32) 0x000000 else 0xFFFFFF)
    assert(java.lang.Long.bitCount(base ^ edited) <= 2,
      "a tiny edit is perceptually near")
    assert(java.lang.Long.bitCount(base ^ other) >= 16,
      "a different composition is perceptually far")
  }

  test("phashNearDupPairs: banding finds the near pair, skips the far one") {
    import spark.implicits._
    def topBottom(x: Int, y: Int) = if (y < 32) 0x000000 else 0xFFFFFF
    def blockFlip(x: Int, y: Int) =
      if (x < 8 && y < 8) 0xFFFFFF else topBottom(x, y)
    def leftRight(x: Int, y: Int) = if (x < 32) 0x000000 else 0xFFFFFF
    // hand-derivation of the oracle's hamming values: flipping one
    // full 8x8 block makes exactly that block cross the new grid mean
    val base = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, topBottom(x, y))
      Multimodal.averageHash(img)
    }
    val flipped = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, blockFlip(x, y))
      Multimodal.averageHash(img)
    }
    assert(java.lang.Long.bitCount(base ^ flipped) == 1,
      "the graded oracle pins hamming 1 for the block flip")
    val df = Seq(
      (1L, encodeImg("png", 64, 64, topBottom)),
      (2L, encodeImg("bmp", 64, 64, topBottom)),
      (3L, encodeImg("png", 64, 64, blockFlip)),
      (4L, encodeImg("png", 64, 64, leftRight)),
      (5L, Array[Byte](1, 2))).toDF("img_id", "payload")
    val got = Multimodal.phashNearDupPairs(df, "img_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)),
      "re-encode at 0, block flip at 1; far composition and garbage never pair")
  }

  test("video header parse: mp4 box walk, v1 mvhd, largesize, crafted sizes") {
    import spark.implicits._
    def box(tp: String, payload: String): String =
      f"${8 + payload.length / 2}%08X" +
        tp.map(c => f"${c.toInt}%02X").mkString + payload
    val ftyp = box("ftyp", "69736F6D" + "00000200")
    val tkhdV = "00" * 76 + "05000000" + "02D00000" // 1280x720
    val mvhdV1 = "01000000" + "00" * 16 +           // v1: 8+8 creation/mod
      "00000258" +                                   // timescale 600
      "0000000000000E10"                             // duration 3600 -> 6000ms
    def parse(hex: String) = {
      val r = Multimodal.withVideoMeta(
        Seq((1L, hex)).toDF("id", "hex")
          .select(col("id"), unhex(col("hex")).as("p")), "p")
        .select("format", "width", "height", "duration_ms", "n_tracks")
        .collect()(0)
      (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getInt(4))
    }
    assert(parse(ftyp + box("moov", box("mvhd", mvhdV1) +
      box("trak", box("tkhd", tkhdV)))) == (("mp4", 1280, 6000L, 1)),
      "v1 mvhd: 64-bit duration over timescale 600")
    // audio track FIRST (0x0 dims): the first NONZERO pair wins
    val tkhdA = "00" * 76 + "00000000" + "00000000"
    assert(parse(ftyp + box("moov", box("mvhd", mvhdV1) +
      box("trak", box("tkhd", tkhdA)) + box("trak", box("tkhd", tkhdV))))
      ._2 == 1280)
    // 64-bit largesize box wrapping moov
    val inner = box("mvhd", mvhdV1)
    val largeMoov = "00000001" + "6D6F6F76" +
      f"${16 + inner.length / 2}%016X" + inner
    assert(parse(ftyp + largeMoov)._3 == 6000L, "largesize header walks")
    // crafted sizes must terminate, not hang: size < header, size 0 tail
    assert(parse(ftyp + "00000003" + "6D6F6F76") == (("mp4", null, null, null)))
    assert(parse(ftyp + "00000000" + "6D6F6F76" + inner)._3 == 6000L,
      "size-0 box extends to EOF")
    assert(parse("00000000") == ((null, null, null, null)), "not a container")
  }

  test("video header parse: AVI and WebM/Matroska, adversarial EBML") {
    import spark.implicits._
    def parse(hex: String) = {
      val r = Multimodal.withVideoMeta(
        Seq((1L, hex)).toDF("id", "hex")
          .select(col("id"), unhex(col("hex")).as("p")), "p")
        .select("format", "width", "height", "duration_ms", "n_tracks")
        .collect()(0)
      (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getInt(4))
    }
    def le(v: Long, n: Int) = (0 until n).map(k => f"${(v >> (8 * k)) & 0xFF}%02X").mkString
    def eb(id: String, p: String) = id + f"${0x80 | (p.length / 2)}%02X" + p
    // AVI: 33367 us/frame x 300 frames = 10010 ms (integer floor)
    val avih = le(33367, 4) + le(0, 4) * 3 + le(300, 4) + le(0, 4) +
      le(1, 4) + le(0, 4) + le(320, 4) + le(200, 4)
    val hdrl = "6864726C" + "61766968" + le(avih.length / 2, 4) + avih
    val avi = "52494646" + le(4 + 8 + hdrl.length / 2, 4) + "41564920" +
      "4C495354" + le(hdrl.length / 2, 4) + hdrl
    assert(parse(avi) == (("avi", 320, 10010L, 1)))
    // truncated AVI (no hdrl): format resolves, fields degrade
    assert(parse("52494646" + "00000000" + "41564920") ==
      (("avi", null, null, null)))
    // Matroska without a webm DocType reads as mkv; UNKNOWN-SIZE
    // Segment (all-ones varint) extends to EOF
    val mkv = eb("1A45DFA3", eb("4282", "6D6174726F736B61")) + // "matroska"
      "18538067" + "FF" + // unknown-size Segment
      eb("1549A966", eb("2AD7B1", "0F4240") + eb("4489", "447A0000")) + // 1000.0
      eb("1654AE6B", eb("AE", eb("E0", eb("B0", "0280") + eb("BA", "01E0"))))
    assert(parse(mkv) == (("mkv", 640, 1000L, 1)))
    // truncated / zero-byte varints terminate instead of hanging
    assert(parse("1A45DFA3" + "00") == (("mkv", null, null, null)))
    assert(parse("1A45DFA3" + "84" + "42") == (("mkv", null, null, null)))
  }

  test("wavPcmSamples decodes 16-bit LE samples; rejects non-PCM") {
    def hex2bytes(h: String) = h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val hdr = "52494646" + "FFFFFF00" + "57415645" + "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "08000000"
    // samples 0x1000, -0x1000 (0xF000 sign-extended), 0x7FFF, 0x8000(min)
    val wav = hex2bytes(hdr + "0010" + "00F0" + "FF7F" + "0080")
    val got = Multimodal.wavPcmSamples(wav)
    assert(got.exists(_.sameElements(Array(0x1000, -0x1000, 0x7FFF, -0x8000))),
      s"got ${got.map(_.toSeq)}")
    assert(Multimodal.wavPcmSamples(hex2bytes("0BAD")).isEmpty)
    assert(Multimodal.wavPcmSamples(
      hex2bytes("664C6143" + "80000022" + "00" * 34)).isEmpty, "flac is not pcm")
    // 8-bit PCM (bits=0x08) rejected: only 16-bit streams fingerprint
    val wav8 = hex2bytes(hdr.replace("0200" + "1000", "0100" + "0800") +
      "00112233")
    assert(Multimodal.wavPcmSamples(wav8).isEmpty)
  }

  test("envelopeHash: hand-computable windows, container-metadata invariant") {
    // 64 samples: quiet half then loud half -> bits 32..63, the same
    // grid shape as the image hash
    val samples = Array.fill(32)(0x1000) ++ Array.fill(32)(0x7000)
    assert(Multimodal.envelopeHash(samples) == 0xFFFFFFFF00000000L)
    // negative samples carry the same energy as positive
    assert(Multimodal.envelopeHash(samples.map(-_)) == 0xFFFFFFFF00000000L)
    // the fingerprint sees through container bytes the md5 cannot:
    // identical samples + a trailing LIST chunk hash identically
    def hex2bytes(h: String) = h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val hdr = "52494646" + "FFFFFF00" + "57415645" + "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "80000000"
    val body = "0010" * 32 + "0070" * 32
    val a = Multimodal.wavPcmSamples(hex2bytes(hdr + body)).get
    val b = Multimodal.wavPcmSamples(
      hex2bytes(hdr + body + "4C495354" + "04000000" + "494E464F")).get
    assert(Multimodal.envelopeHash(a) == Multimodal.envelopeHash(b))
  }

  test("phash index: build, dedup-against, O(batch) append") {
    import spark.implicits._
    def solid(c: Int) = (_: Int, _: Int) => c
    def split_(x: Int, y: Int) = if (y < 8) 0x000000 else 0xFFFFFF
    val path = java.nio.file.Files
      .createTempDirectory("graft_phash_idx").resolve("idx").toString
    Multimodal.buildPhashIndex(
      Seq((1L, encodeImg("png", 16, 16, split_))).toDF("id", "bin"),
      "id", "bin", path)
    val batch = Seq(
      (10L, encodeImg("gif", 16, 16, split_)),          // dup of indexed
      (11L, encodeImg("png", 16, 16, (x, _) =>          // new picture
        if (x < 8) 0x000000 else 0xFFFFFF)),
      (12L, Array[Byte](7, 7)))                         // no evidence: kept
      .toDF("id", "bin")
    val kept = Multimodal.phashDedupAgainstIndex(batch, "id", "bin", path)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L),
      "cross-format re-encode of indexed picture drops; new + undecodable keep")
    // append only the batch's survivors; the appended picture now dedups
    Multimodal.appendPhashIndex(
      batch.filter(col("id") === 11L), "id", "bin", path)
    val kept2 = Multimodal.phashDedupAgainstIndex(
      Seq((20L, encodeImg("bmp", 16, 16, (x, _) =>
        if (x < 8) 0x000000 else 0xFFFFFF))).toDF("id", "bin"),
      "id", "bin", path)
      .select("id").collect()
    assert(kept2.isEmpty, "appended hash is live without any index rewrite")
  }

  test("dedupByPerceptualHash collapses re-encodes, keeps lowest id") {
    import spark.implicits._
    def px(x: Int, y: Int) = if ((x + y) % 2 == 0) 0x000000 else 0xFFFFFF
    val df = Seq(
      (10L, encodeImg("png", 16, 16, px)),
      (11L, encodeImg("bmp", 16, 16, px)),
      (12L, Array[Byte](9, 9)),
      (13L, Array[Byte](8, 8))).toDF("img_id", "payload")
    val got = Multimodal.dedupByPerceptualHash(df, "img_id", "payload")
      .select("img_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 2L, 12L -> 1L, 13L -> 1L),
      "re-encodes collapse; undecodables stay singletons, never one bucket")
  }

  test("resize preserves aspect ratio and never upscales") {
    import spark.implicits._
    val ds = Seq(
      Multimodal.DecodedMedia(1L, "image", 10L, 4000, 2000, 1, Array.fill(8)(0f)),
      Multimodal.DecodedMedia(2L, "image", 10L, 100, 50, 1, Array.fill(8)(0f))
    ).toDS()
    val out = Multimodal.resize(ds, 1024, 1024).collect().sortBy(_.id)
    assert(out(0).width == 1024 && out(0).height == 512) // 4000x2000 -> fit 1024 box
    assert(out(1).width == 100 && out(1).height == 50)   // small: untouched
  }
  test("sampleFrames emits every Nth frame for videos only") {
    import spark.implicits._
    val ds = Seq(
      Multimodal.DecodedMedia(1L, "video", 10L, 100, 100, 10, Array.fill(8)(0.5f)),
      Multimodal.DecodedMedia(2L, "image", 10L, 100, 100, 1, Array.fill(8)(0.5f))
    ).toDS()
    val frames = Multimodal.sampleFrames(ds, everyN = 3).collect()
    assert(frames.map(_.id).distinct.toSeq == Seq(1L))
    assert(frames.map(_.frameIdx).sorted.toSeq == Seq(0, 3, 6, 9))
    // deterministic per-frame feature
    val f3 = frames.find(_.frameIdx == 3).get.feature
    assert(math.abs(f3(0) - (0.5f + 3e-3f)) < 1e-6)
  }
  test("decodeBatch runs the decoder per partition over a binary frame") {
    val df = Seq((1L, "image", "aa"), (2L, "video", "bbbb")).toDF("id", "kind", "s")
      .withColumn("bytes", encode(col("s"), "UTF-8")).drop("s")
    val out = Multimodal.decodeBatch(df, () => new Multimodal.StubMediaDecoder, partitions = 2)
      .collect().sortBy(_.id)
    assert(out.length == 2)
    assert(out(0).nBytes == 2L && out(1).nBytes == 4L)
    assert(out(1).kind == "video" && out(1).nFrames >= 1)
  }

  private def dims(hexes: (Long, String)*): Map[Long, (Option[String], Option[Int], Option[Int])] = {
    import spark.implicits._
    Multimodal.withImageMeta(
        hexes.toSeq.toDF("id", "hex")
          .select(col("id"), unhex(col("hex")).as("payload")), "payload")
      .select("id", "format", "width", "height")
      .collect().map { r =>
        def o[T](i: Int): Option[T] =
          if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
        r.getLong(0) -> ((o[String](1), o[Int](2), o[Int](3)))
      }.toMap
  }

  test("image header parse: the four formats, hand-assembled headers") {
    val out = dims(
      1L -> "89504E470D0A1A0A0000000D494844520000032000000258", // png 800x600
      2L -> "FFD8FFC000110803000400",                           // jpeg SOF0 direct
      3L -> "47494638376110012000",                             // GIF87a 272x32
      4L -> "424D0000000000000000000000002800000040000000D0FFFFFF") // bmp 64, h=-48
    assert(out(1L) == ((Some("png"), Some(800), Some(600))))
    assert(out(2L) == ((Some("jpeg"), Some(1024), Some(768))))
    assert(out(3L) == ((Some("gif"), Some(272), Some(32))))
    // negative BMP height = top-down row order; dimension is |h|
    assert(out(4L) == ((Some("bmp"), Some(64), Some(48))))
  }

  test("image header parse: jpeg marker walk skips segments, fill bytes, restarts") {
    val out = dims(
      // COM then APP0 then fill-FF + SOF2 (progressive): must walk to it
      1L -> ("FFD8" + "FFFE0004AAAA" + "FFE00004BBBB" + "FFFF" + "FFC2001108" + "00100020"),
      // SOS before any SOF: format only
      2L -> ("FFD8" + "FFDA0002"),
      // structural corruption (segment does not start with FF): format only
      3L -> ("FFD8" + "00C0001108" + "00100020"),
      // segment length < 2 is corrupt: format only
      4L -> ("FFD8" + "FFFE0001"))
    assert(out(1L) == ((Some("jpeg"), Some(32), Some(16))))
    assert(out(2L) == ((Some("jpeg"), None, None)))
    assert(out(3L) == ((Some("jpeg"), None, None)))
    assert(out(4L) == ((Some("jpeg"), None, None)))
  }

  test("image header parse: truncation and non-image payloads degrade cleanly") {
    val out = dims(
      1L -> "89504E470D0A1A0A",              // png magic only
      2L -> "89504E470D0A1A0A0000000D49444154000003200000025800", // first chunk not IHDR
      3L -> "474946383961",                  // gif magic only
      4L -> "424D00",                        // bmp magic only
      5L -> "DEADBEEF",                      // unknown -> NULL row
      6L -> "")                              // empty -> NULL row
    assert(out(1L) == ((Some("png"), None, None)))
    assert(out(2L) == ((Some("png"), None, None)))
    assert(out(3L) == ((Some("gif"), None, None)))
    assert(out(4L) == ((Some("bmp"), None, None)))
    assert(out(5L) == ((None, None, None)))
    assert(out(6L) == ((None, None, None)))
  }

  private def audio(hexes: (Long, String)*)
      : Map[Long, (Option[String], Option[Int], Option[Int], Option[Int], Option[Long])] = {
    import spark.implicits._
    Multimodal.withAudioMeta(
        hexes.toSeq.toDF("id", "hex")
          .select(col("id"), unhex(col("hex")).as("payload")), "payload")
      .select("id", "format", "sample_rate", "channels", "bits_per_sample",
        "duration_ms")
      .collect().map { r =>
        def o[T](i: Int): Option[T] =
          if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
        r.getLong(0) ->
          ((o[String](1), o[Int](2), o[Int](3), o[Int](4), o[Long](5)))
      }.toMap
  }

  test("audio header parse: WAV chunk walk and FLAC STREAMINFO bit unpack") {
    val wav = "52494646" + "34000000" + "57415645" +
      "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "10000000" + "00" * 16
    // same WAV but with a LIST chunk (odd size 3 -> pad byte) BEFORE fmt:
    // the walk must skip it, including the alignment pad
    val wavSkip = "52494646" + "3F000000" + "57415645" +
      "4C495354" + "03000000" + "AABBCC" + "00" + // LIST, 3 bytes + pad
      "666D7420" + "10000000" +
      "0100" + "0200" + "80BB0000" + "00EE0200" + "0400" + "1000" +
      "64617461" + "40000000" + "00" * 64          // 64 bytes, stereo -> 16 samples
    val flac = "664C6143" + "80000022" +
      "1000" + "1000" + "000000" + "000000" +
      "0AC442F0" + "0000AC44" + "00" * 16
    val out = audio(1L -> wav, 2L -> wavSkip, 3L -> flac,
      4L -> ("52494646" + "00000000" + "57415645"), // wav, no chunks
      5L -> "664C6143",                             // flac magic only
      6L -> "00FFEE")                               // not audio
    assert(out(1L) == ((Some("wav"), Some(8000), Some(1), Some(16), Some(1L))))
    // 48 kHz stereo 16-bit, 64 data bytes -> 16 samples -> 0 ms (floor)
    assert(out(2L) == ((Some("wav"), Some(48000), Some(2), Some(16), Some(0L))))
    assert(out(3L) == ((Some("flac"), Some(44100), Some(2), Some(16), Some(1000L))))
    assert(out(4L) == ((Some("wav"), None, None, None, None)))
    assert(out(5L) == ((Some("flac"), None, None, None, None)))
    assert(out(6L) == ((None, None, None, None, None)))
  }

  test("audio header parse: crafted chunk sizes terminate (no executor hang)") {
    // chunk size 0xFFFFFFF8 would step the cursor by 8 + (-8) = 0 if
    // truncated to Int — the Long walk must terminate with format-only
    val out = audio(
      1L -> ("52494646" + "00000000" + "57415645" + "4A554E4B" + "F8FFFFFF"),
      2L -> ("52494646" + "00000000" + "57415645" + "4A554E4B" + "FFFFFFFF"))
    assert(out(1L) == ((Some("wav"), None, None, None, None)))
    assert(out(2L) == ((Some("wav"), None, None, None, None)))
  }

  test("bmp header: legacy 12-byte core header u16 dims; unknown DIB size degrades") {
    val out = dims(
      // BITMAPCOREHEADER: size 12, width 100 (u16 LE), height 50 (u16 LE)
      1L -> ("424D000000000000000000000000" + "0C000000" + "6400" + "3200" + "01001800"),
      // nonsense DIB size 20: format only, never fused-garbage dims
      2L -> ("424D000000000000000000000000" + "14000000" + "6400000032000000"))
    assert(out(1L) == ((Some("bmp"), Some(100), Some(50))))
    assert(out(2L) == ((Some("bmp"), None, None)))
  }
}
