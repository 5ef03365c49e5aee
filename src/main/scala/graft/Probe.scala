package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def margins(spark: SparkSession, df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String, k0: Int, label: String): Unit = {
    // deterministic hash-order sample, mirrors ivfCentroids' draw
    val drawn = df.select(col(idCol).cast("string").as("__id"), col(vecCol).as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id")).limit(8 * k0).collect()
      .map { r =>
        val a = r.getSeq[Number](1).map(_.doubleValue()).toArray
        val n = math.sqrt(a.map(x => x * x).sum)
        if (n == 0) a else a.map(_ / n)
      }
    val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
    drawn.iterator.takeWhile(_ => seen.size < k0).foreach(a => seen += a.toSeq)
    val cents = seen.iterator.map(_.toArray).toArray
    // margins over up to 256 sample vectors, skipping centroid-identical ones
    val ms = drawn.iterator.map { v =>
      cents.map(c => c.zip(v).map { case (a, b) => a * b }.sum).max
    }.filter(_ < 0.999).take(256).toArray.sorted
    if (ms.isEmpty) { println(s"MARGIN $label: no non-centroid samples"); return }
    def pct(p: Double) = ms(math.min(ms.length - 1, (p * ms.length).toInt))
    println(f"MARGIN $label%s k0=$k0%d n=${ms.length}%d p10=${pct(0.1)}%.4f median=${pct(0.5)}%.4f p90=${pct(0.9)}%.4f")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val n = e.count()
      val k0 = math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))
      margins(spark, e, "vec_id", "embedding", k0, s"random-$sf(n=$n)")
    }
    // the seeded clustered frame from q_gate_ivf_clustered
    val rnd = new scala.util.Random(11)
    val dim = 32
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 1000).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    margins(spark, df, "vec_id", "embedding", 32, "clustered-seed11")
    margins(spark, df, "vec_id", "embedding", 20, "clustered-k20")
    spark.stop()
  }
}
