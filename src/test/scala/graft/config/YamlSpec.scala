package graft.config

import org.scalatest.funsuite.AnyFunSuite

class YamlSpec extends AnyFunSuite {

  test("comments, quoting, inline lists") {
    val v = Yaml.parse(
      """# top comment
        |a: "hash # inside quotes"
        |b: plain  # trailing comment
        |c: [x, y, 'z w']
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(v("a") === "hash # inside quotes")
    assert(v("b") === "plain")
    assert(v("c") === List("x", "y", "z w"))
  }

  test("nested maps and block lists of maps") {
    val v = Yaml.parse(
      """outer:
        |  inner:
        |    k: 1
        |items:
        |  - name: first
        |    opt: a
        |  - name: second
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    val outer = v("outer").asInstanceOf[Map[String, Any]]
    assert(outer("inner").asInstanceOf[Map[String, Any]]("k") === "1")
    val items = v("items").asInstanceOf[List[Map[String, Any]]]
    assert(items.map(_("name")) === List("first", "second"))
    assert(items.head("opt") === "a")
  }

  test("scalar list and empty values") {
    val v = Yaml.parse(
      """xs:
        |  - one
        |  - two
        |empty:
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(v("xs") === List("one", "two"))
    assert(v("empty") === "")
  }

  test("colons inside quoted values survive") {
    val v = Yaml.parse("""w: "a: b"""").asInstanceOf[Map[String, Any]]
    assert(v("w") === "a: b")
  }

  test("zero-indent block list under a key (common YAML style)") {
    val v = Yaml.parse(
      """tableMigrations:
        |- tableName: t1
        |- tableName: t2
        |next: x
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    val items = v("tableMigrations").asInstanceOf[List[Map[String, Any]]]
    assert(items.map(_("tableName")) === List("t1", "t2"))
    assert(v("next") === "x")
  }

  test("extra spaces after the dash align continuations correctly") {
    val v = Yaml.parse(
      """items:
        |  -  name: first
        |     opt: a
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    val items = v("items").asInstanceOf[List[Map[String, Any]]]
    assert(items.head("name") === "first")
    assert(items.head("opt") === "a")
  }
}
