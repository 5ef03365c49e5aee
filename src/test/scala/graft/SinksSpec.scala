package graft

import graft.sinks.JdbcSink
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {
  test("identifier quoting escapes embedded quotes and qualifies schemas") {
    assert(JdbcSink.quote("employees") == "\"employees\"")
    assert(JdbcSink.quote("Mixed Case") == "\"Mixed Case\"")
    assert(JdbcSink.quote("we\"ird") == "\"we\"\"ird\"")
    assert(JdbcSink.quoteQualified("public.employees") == "\"public\".\"employees\"")
  }
  test("identifier quoting rejects control characters and empties") {
    intercept[IllegalArgumentException] { JdbcSink.quote("") }
    intercept[IllegalArgumentException] { JdbcSink.quote("bad\nname") }
  }
}
