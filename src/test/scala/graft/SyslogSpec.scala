package graft

import graft.syslog.{Syslog, SyslogMessage}
import org.scalatest.funsuite.AnyFunSuite

/** Golden values from the reference's unit tests (src/parse.rs:62-106). */
class SyslogSpec extends AnyFunSuite {
  test("invalid line fails to parse (src/parse.rs:66-74)") {
    assert(Syslog.parseLine("blah").isEmpty)
  }

  test("RFC 5424 golden (src/parse.rs:77-89)") {
    val line = """<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - [timeQuality tzKnown="1" isSynced="1" syncAccuracy="505061"] hi"""
    val m = Syslog.parseLine(line).get
    assert(m.msg == "hi")
    assert(m.hostname.contains("coconut"))
    assert(m.appname.contains("tyler"))
    assert(m.facility.contains("user"))
    assert(m.severity.contains("notice"))
  }

  test("RFC 3164 golden (src/parse.rs:91-105)") {
    val m = Syslog.parseLine("<190>May 13 21:45:18 coconut hotdog: hi").get
    assert(m.msg == "hi")
    assert(m.hostname.contains("coconut"))
    assert(m.appname.contains("hotdog"))
    assert(m.facility.contains("local7"))
    assert(m.severity.contains("info"))
  }

  test("5424 nil hostname/appname → null") {
    val m = Syslog.parseLine("<34>1 2003-10-11T22:14:15.003Z - - - - - msg here").get
    assert(m == SyslogMessage("msg here", Some("crit"), Some("auth"), None, None))
  }

  test("5424 with structured data only, no msg") {
    val m = Syslog.parseLine("""<13>1 2020-01-01T00:00:00Z h a - - [x y="1"]""").get
    assert(m.msg == "")
  }

  test("pri range: >191 rejected as 5424") {
    assert(Syslog.parse5424("<192>1 2020-01-01T00:00:00Z h a - - - m").isEmpty)
  }

  test("severity/facility decode covers full pri space") {
    // pri 0 → kern/emerg; pri 191 → local7/debug
    val lo = Syslog.parseLine("<0>1 2020-01-01T00:00:00Z h a - - - m").get
    assert(lo.facility.contains("kern") && lo.severity.contains("emerg"))
    val hi = Syslog.parseLine("<191>1 2020-01-01T00:00:00Z h a - - - m").get
    assert(hi.facility.contains("local7") && hi.severity.contains("debug"))
  }

  test("3164 without pri still parses if timestamp present (loose)") {
    val m = Syslog.parseLine("May 13 21:45:18 coconut hotdog: hi").get
    assert(m.severity.isEmpty && m.facility.isEmpty)
    assert(m.hostname.contains("coconut"))
  }

  test("column-expression parse agrees with the ParseSyslog expression") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val lines = Seq(
      "<13>1 2024-01-01T00:00:00Z host-3 app-error - - - hello world3 extra",
      "<190>1 2024-01-01T00:00:00Z host-0 app-view - - - {\"k\": 5}",
      "<0>1 2024-01-01T00:00:00Z - - - - - nil fields",
      "<99>May 13 21:45:18 host-7 app-click: body here",
      "garbage <13>1 2024-01-01T00:00:00Z h a - - - x",
      "not parseable").toDF("line")
    val both = lines.select(
      graft.syslog.SyslogCols.parseAuto($"line").as("c"),
      call_function("parse_syslog", $"line").as("e"))
    both.collect().foreach { r =>
      assert(r.get(0) == r.get(1), s"column vs expression parse mismatch: $r")
    }
  }
}
