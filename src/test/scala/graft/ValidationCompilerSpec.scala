package graft

import graft.config.ValidationRule
import graft.rules.ValidationCompiler
import graft.rules.ValidationCompiler._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ValidationCompilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // parseRange is private[rules]; exercise through okPredicate.
  private def rangeOk(pattern: String, v: Double): Boolean =
    Seq(v).toDF("v")
      .select(okPredicate(ValidationRule("range", pattern = Some(pattern)), col("v"), DoubleType))
      .collect().head.getBoolean(0)

  test("range min-max is inclusive on both ends") {
    assert(rangeOk("0-100", 0))
    assert(rangeOk("0-100", 100))
    assert(!rangeOk("0-100", 100.5))
  }
  test("range >=X / <=X forms") {
    assert(rangeOk(">=5", 5) && !rangeOk(">=5", 4.9))
    assert(rangeOk("<=7", 7) && !rangeOk("<=7", 7.1))
  }
  test("range strict >X / <X forms") {
    assert(!rangeOk(">3", 3) && rangeOk(">3", 3.0001))
    assert(!rangeOk("<9", 9) && rangeOk("<9", 8.9999))
  }
  test("unparseable range passes everything (reference logs + moves on)") {
    assert(rangeOk("garbage", 12345))
    assert(rangeOk("-5-10", 999)) // leading-minus form is unparseable, like the reference's split
  }
  test("NULL value bypasses range validation") {
    val ok = Seq[java.lang.Double](null).toDF("v")
      .select(okPredicate(ValidationRule("range", pattern = Some("0-1")), col("v"), DoubleType))
      .collect().head.getBoolean(0)
    assert(ok)
  }
  test("uncastable value passes range (float() failure tolerated)") {
    val ok = Seq("notanumber").toDF("v")
      .select(okPredicate(ValidationRule("range", pattern = Some("0-1")), col("v"), StringType))
      .collect().head.getBoolean(0)
    assert(ok)
  }
  test("regex is PREFIX-anchored like Python re.match") {
    def ok(p: String, v: String): Boolean =
      Seq(v).toDF("v")
        .select(okPredicate(ValidationRule("regex", pattern = Some(p)), col("v"), StringType))
        .collect().head.getBoolean(0)
    assert(ok("B.*", "BUILDING"))
    assert(!ok("UILD", "BUILDING")) // matches mid-string only -> re.match fails
    assert(ok("[0-9]+", "42x"))     // prefix match suffices, no full anchor
  }
  test("actions map like the reference") {
    assert(action(ValidationRule("regex")) == NullOut)
    assert(action(ValidationRule("regex", onFail = Some("skip"))) == Skip)
    assert(action(ValidationRule("regex", onFail = Some("default:N/A"))) == Default("N/A"))
    assert(action(ValidationRule("regex", onFail = Some("error"))) == Abort)
    assert(action(ValidationRule("regex", onFail = Some("boom"))) == Abort) // anything else aborts
  }
  test("default payload keeps its original case") {
    assert(action(ValidationRule("range", onFail = Some("default:N/A"))) == Default("N/A"))
  }
  test("assertNoViolations throws on violating rows and passes on clean ones") {
    val df = Seq(1, -2, 3).toDF("v")
    val ex = intercept[IllegalStateException] {
      assertNoViolations(df, col("v") < 0, "test-ctx")
    }
    assert(ex.getMessage.contains("test-ctx"))
    assertNoViolations(df, col("v") > 100, "never") // no violation: no throw
  }
}
