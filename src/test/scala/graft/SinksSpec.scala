package graft

import graft.sinks.JdbcSink
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {
  test("identifier quoting escapes embedded quotes and qualifies schemas") {
    assert(JdbcSink.quote("employees") == "\"employees\"")
    assert(JdbcSink.quote("Mixed Case") == "\"Mixed Case\"")
    assert(JdbcSink.quote("we\"ird") == "\"we\"\"ird\"")
  }
  test("identifier quoting rejects control characters and empties") {
    intercept[IllegalArgumentException] { JdbcSink.quote("") }
    intercept[IllegalArgumentException] { JdbcSink.quote("bad\nname") }
  }
  test("raw table names pass through validation; injection attempts are rejected") {
    assert(JdbcSink.rawTableName("public.employees") == "public.employees")
    assert(JdbcSink.rawTableName("EVENTS_2024") == "EVENTS_2024")
    intercept[IllegalArgumentException] { JdbcSink.rawTableName("t; DROP TABLE x") }
    intercept[IllegalArgumentException] { JdbcSink.rawTableName("t\"x") }
    intercept[IllegalArgumentException] { JdbcSink.rawTableName("") }
  }

  test("restart-identity truncate emits the reference statement with a portable fallback") {
    assert(JdbcSink.restartIdentityTruncateSql("emp", cascade = true) ==
      Seq("TRUNCATE TABLE emp RESTART IDENTITY CASCADE", "TRUNCATE TABLE emp"))
    assert(JdbcSink.restartIdentityTruncateSql("hr.emp", cascade = false) ==
      Seq("TRUNCATE TABLE hr.emp RESTART IDENTITY", "TRUNCATE TABLE hr.emp"))
    intercept[IllegalArgumentException] {
      JdbcSink.restartIdentityTruncateSql("emp; DROP TABLE x", cascade = true)
    }
  }
}
