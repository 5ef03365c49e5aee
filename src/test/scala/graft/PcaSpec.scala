package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded planted-subspace frame: variance 9 along u1, 4 along u2
    * (orthonormal), isotropic noise sigma 0.05 — eigengaps are wide, so
    * the power iteration's recovery is unambiguous. */
  private def planted = {
    val rnd = new scala.util.Random(19)
    val dim = 64
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val u1 = unit()
    val raw2 = unit()
    val d12 = raw2.zip(u1).map { case (a, b) => a * b }.sum
    val o2 = raw2.zip(u1).map { case (a, b) => a - d12 * b }
    val n2 = math.sqrt(o2.map(x => x * x).sum)
    val u2 = o2.map(_ / n2)
    val rows = (0 until 2000).map { i =>
      val a = 3.0 * rnd.nextGaussian()
      val b = 2.0 * rnd.nextGaussian()
      val v = Array.tabulate(dim)(k =>
        (a * u1(k) + b * u2(k) + 0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, v)
    }
    (rows.toDF("vec_id", "embedding"), u1, u2)
  }

  private def cosAbs(a: Array[Double], b: Array[Double]): Double =
    math.abs(a.zip(b).map { case (x, y) => x * y }.sum) /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))

  test("trainPca recovers the planted 2D subspace with the right variances") {
    val (df, u1, u2) = planted
    val m = Pca.trainPca(df, "vec_id", "embedding", d = 2)
    assert(cosAbs(m.components(0), u1) >= 0.999,
      f"c1 must align with u1, got ${cosAbs(m.components(0), u1)}%.4f")
    assert(cosAbs(m.components(1), u2) >= 0.999,
      f"c2 must align with u2, got ${cosAbs(m.components(1), u2)}%.4f")
    // population variances of a*u1 with a ~ N(0,3): ~9 and ~4 (sampling
    // tolerance at n=2000), and the two axes dominate the trace
    assert(math.abs(m.variances(0) - 9.0) < 1.0, s"lambda1 = ${m.variances(0)}")
    assert(math.abs(m.variances(1) - 4.0) < 0.6, s"lambda2 = ${m.variances(1)}")
    assert(m.explainedVarianceRatio >= 0.95,
      f"2 of 64 dims must explain the planted frame, got ${m.explainedVarianceRatio}%.4f")
  }

  test("pcaProjectColumn equals the hand-computed centered dots; whitening unit-variances the coords") {
    val (df, _, _) = planted
    val m = Pca.trainPca(df, "vec_id", "embedding", d = 2)
    val out = Pca.pcaProject(df, "vec_id", "embedding", d = 2)
    // hand-check one row on the driver
    val row = df.filter(col("vec_id") === 7L).select("embedding")
      .collect().head.getSeq[Float](0).map(_.toDouble).toArray
    val centered = row.zip(m.mean).map { case (x, mu) => x - mu }
    val expected = m.components.map(c =>
      c.zip(centered).map { case (a, b) => a * b }.sum)
    val got = out.filter(col("vec_id") === 7L).select("projection")
      .collect().head.getSeq[Double](0).toArray
    assert(got.zip(expected).forall { case (g, e) => math.abs(g - e) < 1e-9 },
      s"projection mismatch: ${got.toSeq} vs ${expected.toSeq}")
    // whitened coordinates have population variance ~1 per kept dim
    val w = Pca.pcaProject(df, "vec_id", "embedding", d = 2, whiten = true)
      .select(posexplode(col("projection")).as(Seq("k", "x")))
      .groupBy("k").agg((sum(col("x") * col("x")) / count(lit(1))).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(w(0) - 1.0) < 0.05 && math.abs(w(1) - 1.0) < 0.05,
      s"whitened variances must be ~1, got $w")
  }

  test("trainPca is deterministic up to double-sum rounding") {
    val (df, _, _) = planted
    val m1 = Pca.trainPca(df, "vec_id", "embedding", d = 2)
    val m2 = Pca.trainPca(df, "vec_id", "embedding", d = 2)
    assert(m1.components.flatMap(_.toSeq).zip(m2.components.flatMap(_.toSeq))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(m1.variances.zip(m2.variances)
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }
}
