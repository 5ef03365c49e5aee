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
