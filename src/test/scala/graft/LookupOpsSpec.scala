package graft

import graft.config.LookupConfig
import graft.operators.LookupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LookupOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src = Seq((1, "10"), (2, "20"), (3, "99"), (4, null)).toDF("id", "k")
  private def dim = Seq((10, "TEN"), (20, "TWENTY")).toDF("dk", "dv")
  private def lk(onMissing: String) =
    LookupConfig("dim", "dk", Some("dv"), Option(onMissing))

  private def run(onMissing: String): Map[Int, String] = {
    val res = LookupOps.externalLookup(src, "k", lk(onMissing), dim)
    res.df.select("id", "k").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
  }

  test("on_missing=null: match rewrites to value, miss -> null, null key stays null") {
    val out = run("null")
    assert(out(1) == "TEN" && out(2) == "TWENTY")
    assert(out(3) == null && out(4) == null)
  }
  test("on_missing=skip drops missing rows but keeps null keys") {
    val res = LookupOps.externalLookup(src, "k", lk("skip"), dim)
    val ids = res.df.select("id").as[Int].collect().toSet
    assert(ids == Set(1, 2, 4)) // 3 dropped; 4 (null key) bypasses
  }
  test("on_missing=default:N/A injects the ORIGINAL-case payload") {
    val out = run("default:N/A")
    assert(out(3) == "N/A")
    assert(out(1) == "TEN")
    assert(out(4) == null) // null key bypasses even the default
  }
  test("on_missing dispatch is case-insensitive (DEFAULT:x, SKIP)") {
    assert(run("DEFAULT:Mixed")(3) == "Mixed")
    val ids = LookupOps.externalLookup(src, "k", lk("SKIP"), dim)
      .df.select("id").as[Int].collect().toSet
    assert(ids == Set(1, 2, 4))
  }
  test("on_missing=error flags violations for the abort check") {
    val res = LookupOps.externalLookup(src, "k", lk("error"), dim)
    assert(res.abortViolationCol.isDefined)
    val viol = res.df.filter(col(res.abortViolationCol.get)).select("id").as[Int].collect()
    assert(viol.toSeq == Seq(3))
  }
  test("duplicate dim keys resolve deterministically to MIN value") {
    val dupDim = Seq((10, "B"), (10, "A")).toDF("dk", "dv")
    val res = LookupOps.externalLookup(Seq((1, "10")).toDF("id", "k"),
      "k", lk("null"), dupDim)
    assert(res.df.select("k").collect().head.getString(0) == "A")
  }
  test("keys compare as text (int key vs string column)") {
    val res = LookupOps.externalLookup(Seq((1, 10)).toDF("id", "k"), "k", lk("null"), dim)
    assert(res.df.select("k").collect().head.getString(0) == "TEN")
  }
  test("existence probe marks present/missing/null-bypass") {
    val (joined, okCol) = LookupOps.existenceProbe(src, "k", lk(null), dim)
    val ok = joined.select(col("id"), col(okCol)).collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(ok(1) && ok(2) && !ok(3) && ok(4))
  }
  test("self-lookup re-keys through the dataset's own rows") {
    val df = Seq((1, "root", null), (2, "a", "1"), (3, "b", "2"))
      .toDF("id", "name", "parent")
    val out = LookupOps.selfLookup(df, "parent", LookupConfig("self", "id", Some("name")))
      .select("id", "parent").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == null && out(2) == "root" && out(3) == "a")
  }
}
