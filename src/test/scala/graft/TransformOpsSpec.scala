package graft

import graft.functions.TransformOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TransformOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalStr(op: String, in: String): Any =
    Seq(in).toDF("v").select(TransformOps(op, col("v"), StringType)).collect().head.get(0)

  test("strip removes all whitespace incl tabs/newlines (Python str.strip)") {
    assert(evalStr("strip", "\t  hi there \n") == "hi there")
  }
  test("trim removes spaces only") {
    assert(evalStr("trim", "  x  ") == "x")
  }
  test("upper / lower") {
    assert(evalStr("upper", "aBc") == "ABC")
    assert(evalStr("lower", "aBc") == "abc")
  }
  test("capitalize is Python str.capitalize: first upper, REST LOWER") {
    assert(evalStr("capitalize", "bUILDING") == "Building")
  }
  test("capitalize passes null through") {
    assert(Seq[String](null).toDF("v")
      .select(TransformOps("capitalize", col("v"), StringType)).collect().head.isNullAt(0))
  }
  test("initcap word-capitalizes") {
    assert(evalStr("initcap", "john smith") == "John Smith")
  }
  test("to_int is a permissive cast (invalid -> null)") {
    val out = Seq("42", "x").toDF("v")
      .select(TransformOps("to_int", col("v"), StringType)).collect()
    assert(out(0).getLong(0) == 42L)
    assert(out(1).isNullAt(0))
  }
  test("to_date from string and from timestamp") {
    assert(evalStr("to_date", "2024-03-05").toString == "2024-03-05")
    val ts = Seq(java.sql.Timestamp.valueOf("2024-03-05 10:30:00")).toDF("v")
      .select(TransformOps("to_date", col("v"), TimestampType)).collect().head.get(0)
    assert(ts.toString == "2024-03-05")
  }
  test("insert:VAL injects the constant; insert:null injects NULL") {
    assert(evalStr("insert:loaded", "whatever") == "loaded")
    assert(Seq("x").toDF("v")
      .select(TransformOps("insert:null", col("v"), StringType)).collect().head.isNullAt(0))
  }
  test("Y/N -> bool dispatches on op name merely containing true/false") {
    for (opName <- Seq("to_true_false", "truefalse", "y_n_to_true_false")) {
      val out = Seq("Y", "N").toDF("v")
        .select(TransformOps(opName, col("v"), StringType)).collect()
      assert(out(0).getBoolean(0) === true, opName)
      assert(out(1).getBoolean(0) === false, opName)
    }
  }
  test("Y/N -> bool on numeric 0/1") {
    val out = Seq(1, 0).toDF("v")
      .select(TransformOps("to_true_false", col("v"), IntegerType)).collect()
    assert(out(0).getBoolean(0) === true)
    assert(out(1).getBoolean(0) === false)
  }
  test("unknown op is identity (reference logs+skips)") {
    assert(evalStr("no_such_op", "keep") == "keep")
  }
  test("string op on a non-string column is identity (isinstance guard)") {
    val out = Seq(7).toDF("v")
      .select(TransformOps("upper", col("v"), IntegerType)).collect().head.getInt(0)
    assert(out == 7)
  }
  test("chain applies ops in order") {
    val out = Seq("  bUILDING  ").toDF("v")
      .select(TransformOps.chain(Seq("strip", "capitalize"), col("v"), StringType))
      .collect().head.getString(0)
    assert(out == "Building")
  }
  test("chain threads result types (to_int then to_string)") {
    val out = Seq("12").toDF("v")
      .select(TransformOps.chain(Seq("to_int", "to_string"), col("v"), StringType))
      .collect().head.getString(0)
    assert(out == "12")
  }
  test("register adds a custom op") {
    TransformOps.register("test_rev", (c, dt) => if (dt == StringType) reverse(c) else c)
    assert(evalStr("test_rev", "abc") == "cba")
  }
}
