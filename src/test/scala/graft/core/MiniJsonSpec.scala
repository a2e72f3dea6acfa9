package graft.core

import graft.core.MiniJson._
import org.scalatest.funsuite.AnyFunSuite

class MiniJsonSpec extends AnyFunSuite {

  test("parses the engine's own metadata shapes exactly") {
    val o = parseObject(
      """{"format_version":3,"max_bits":8,"table_hash":-3543122733817864430,
        |"context_model":"zuckerli","bins_added":[0,2,7],"nested":{"a":[1,{"b":null}]},
        |"quote":"a \"quoted\" value, with: colons}and braces"}""".stripMargin,
      where = "test"
    )
    assert(o.long("format_version") == 3L)
    assert(o.long("table_hash") == -3543122733817864430L) // exact Long, no double detour
    assert(o.str("context_model") == "zuckerli")
    assert(o.longArrOpt("bins_added").get == Seq(0L, 2L, 7L))
    // the case the regex reader silently mis-read: a string value containing
    // '"' and structural characters
    assert(o.str("quote") == """a "quoted" value, with: colons}and braces""")
    assert(o.longOpt("absent").isEmpty)
  }

  test("fails loudly, naming the field, on type mismatches and absence") {
    val o = parseObject("""{"n":"not a number","s":17}""", where = "t")
    assert(intercept[ParseException](o.long("n")).getMessage.contains("n"))
    assert(intercept[ParseException](o.str("s")).getMessage.contains("s"))
    assert(intercept[ParseException](o.long("gone")).getMessage.contains("gone"))
  }

  test("fails loudly, with position, on malformed documents") {
    for (bad <- Seq("{", """{"a":1""", """{"a":}""", """{"a":1} x""", """{"a":"unterminated""", "", "[1,]"))
      assert(intercept[ParseException](parse(bad)).getMessage.nonEmpty, bad)
    assert(intercept[ParseException](parseObject("[1]", where = "f")).getMessage.contains("f"))
    // signed "hex" in \u escapes must be rejected (Integer.parseInt would
    // accept +/-), as must non-hex. (Strings built by concat: scalac
    // itself interprets \uXXXX even inside triple quotes.)
    for (suffix <- Seq("-001", "+123", "ZZ12")) {
      val bad = "{\"s\":\"\\" + "u" + suffix + "\"}"
      assert(intercept[ParseException](parse(bad)).getMessage.contains("escape"), bad)
    }
    assert(
      intercept[ParseException](parseObject("""{"bins":[1,2.5]}""", "t").longArrOpt("bins"))
        .getMessage.contains("bins")
    )
  }

  test("escapes, unicode, numbers round-trip") {
    val o = parseObject("""{"s":"a\n\tA\\","d":-0.5,"e":1e3,"b":true,"x":false}""", "t")
    assert(o.str("s") == "a\n\tA\\")
    assert(o.get("b").contains(JBool(true)))
    assert(o.get("d").contains(JNum("-0.5")))
    // a non-integral number read as long names the field
    assert(intercept[ParseException](o.long("d")).getMessage.contains("d"))
  }
}
