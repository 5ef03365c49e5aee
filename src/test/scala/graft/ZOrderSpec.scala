package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave: hand-checked Morton codes, wrap past bitsPerCol") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (4L, 0L) // 4 = 100b wraps at bits=2 -> contributes nothing
    ).toDF("x", "y")
    val out = rows.select(col("x"), col("y"),
      ZOrder.interleave(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bit j of col i -> position j*2+i: x bits at even, y bits at odd
    assert(out((0L, 0L)) == 0L)
    assert(out((1L, 0L)) == 1L)
    assert(out((0L, 1L)) == 2L)
    assert(out((1L, 1L)) == 3L)
    // x=3 (11b) -> bits 0,2 = 5; y=5 masked to 01b -> bit 1 = 2 -> z=7
    assert(out((3L, 5L)) == 7L)
    assert(out((4L, 0L)) == 0L, "bits past bitsPerCol mask off")
  }

  test("interleave: locality — adjacent cells share high bits (quadrants)") {
    // 2-bit grid: z >> 2 identifies the 2x2 quadrant
    val all = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val z = all.toDF("x", "y").select(col("x"), col("y"),
      ZOrder.interleave(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all.map(z).sorted == (0L to 15L).toList, "bijective on the grid")
    for (x <- 0L to 1L; y <- 0L to 1L)
      assert(z((x, y)) >> 2 == 0L, "low-low quadrant occupies z 0..3")
    for (x <- 2L to 3L; y <- 2L to 3L)
      assert(z((x, y)) >> 2 == 3L, "high-high quadrant occupies z 12..15")
  }

  test("three columns at 21 bits stay in a positive long") {
    val m = (1L << 21) - 1
    val z = Seq((m, m, m)).toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 21))
      .head().getLong(0)
    assert(z == (1L << 63) - 1 && z > 0)
  }

  test("normalizeToBits maps range ends to 0 and 2^bits-1") {
    val out = Seq(10L, 110L, 60L).toDF("v")
      .select(ZOrder.normalizeToBits(col("v"), 10L, 110L, 8).as("n"))
      .as[Long].collect().toSet
    assert(out.contains(0L) && out.contains(255L))
    assert(out.forall(v => v >= 0L && v <= 255L))
  }

  test("clusterWrite: z-clustered files have tight per-file ranges on BOTH columns") {
    val e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("user_id"), col("event_id"))
    val (uMin, uMax, eMin, eMax) = {
      val r = e.agg(min("user_id"), max("user_id"),
        min("event_id"), max("event_id")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val z = ZOrder.interleave(Seq(
      ZOrder.normalizeToBits(col("user_id"), uMin, uMax, 16),
      ZOrder.normalizeToBits(col("event_id"), eMin, eMax, 16)), 16)
    val dirZ = java.nio.file.Files.createTempDirectory("zorder").toString
    val dirR = java.nio.file.Files.createTempDirectory("roundrobin").toString
    ZOrder.clusterWrite(e, z, dirZ, numFiles = 16)
    e.repartition(16).write.mode("overwrite").parquet(dirR)

    // the quantity pruning relies on: sum over files of the per-file
    // value span, as a fraction of files * full span (1.0 = every
    // file covers everything, like round-robin; clustered ~ 1/sqrt(F))
    def spanFraction(dir: String, c: String, lo: Long, hi: Long): Double = {
      val per = spark.read.parquet(dir)
        .select(input_file_name().as("f"), col(c))
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("span"))
        .agg(sum("span"), count(lit(1))).head()
      per.getLong(0).toDouble / ((hi - lo).toDouble * per.getLong(1))
    }
    for (c <- Seq("user_id", "event_id")) {
      val (lo, hi) = if (c == "user_id") (uMin, uMax) else (eMin, eMax)
      val fz = spanFraction(dirZ, c, lo, hi)
      val fr = spanFraction(dirR, c, lo, hi)
      assert(fr > 0.9, s"round-robin files each span ~the full $c range ($fr)")
      assert(fz < fr / 2,
        s"z-clustered files must be at least 2x tighter on $c ($fz vs $fr)")
    }
  }
}
