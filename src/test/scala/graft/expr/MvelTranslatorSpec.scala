package graft.expr

import org.scalatest.funsuite.AnyFunSuite

class MvelTranslatorSpec extends AnyFunSuite {

  test("referenced columns extracted like CassandraSchemaUtil regex") {
    assert(MvelTranslator.referencedColumns(
      "row.clust_key_col_2 >= 3000 && row.clust_key_col_2 < 10000") ===
      Seq("clust_key_col_2"))
    assert(MvelTranslator.referencedColumns("row.a + row.b * row.a") === Seq("a", "b"))
  }

  test("boolean filter expression (reference yaml:95)") {
    // reference config/migration-config.example.yaml:95 verbatim
    val sql = MvelTranslator.toSql(
      "row.clust_key_col_2 >= 3000 && row.clust_key_col_2 < 10000")
    assert(sql === "clust_key_col_2 >= 3000 AND clust_key_col_2 < 10000")
  }

  test("equality and negation operators") {
    assert(MvelTranslator.toSql("row.a == 'x' && row.b != 3") ===
      "a = 'x' AND b != 3")
  }

  test("cast binds to the next primary term only (Java precedence)") {
    // ADVICE r1: (short) x % 32 must be ((short)x) % 32, not CAST(x % 32)
    assert(MvelTranslator.toSql("(short) row.x % 32") ===
      "CAST(x AS SMALLINT) % 32")
    // parenthesized group takes the whole group
    assert(MvelTranslator.toSql("(short)(row.x % 32)") ===
      "CAST((x % 32) AS SMALLINT)")
  }

  test("hashCode call maps to java_hash_code") {
    assert(MvelTranslator.toSql("abs(row.my_col.hashCode()) % 32") ===
      "abs(java_hash_code(my_col)) % 32")
  }

  test("ternary maps to IF") {
    assert(MvelTranslator.toSql("row.a >= 10 ? 'BIG' : 'SMALL'") ===
      "IF(a >= 10, 'BIG', 'SMALL')")
  }

  test("embedded ternary rewrites with correct precedence (ADVICE r2)") {
    // parenthesized embedded ternary
    assert(MvelTranslator.toSql("row.x + (row.c > 0 ? 1 : 2)") ===
      "x + (IF(c > 0, 1, 2))")
    // top-level ternary with an arithmetic condition prefix
    assert(MvelTranslator.toSql("row.c > 0 ? row.x + 1 : row.x - 1") ===
      "IF(c > 0, x + 1, x - 1)")
    // nested ternary in the then-branch finds ITS colon first
    assert(MvelTranslator.toSql("row.a > 0 ? (row.b > 0 ? 1 : 2) : 3") ===
      "IF(a > 0, (IF(b > 0, 1, 2)), 3)")
    // right-associative else-chain
    assert(MvelTranslator.toSql("row.a > 9 ? 'hi' : row.a > 5 ? 'mid' : 'lo'") ===
      "IF(a > 9, 'hi', IF(a > 5, 'mid', 'lo'))")
  }

  test("ternary with no matching colon throws, not malformed SQL") {
    assertThrows[MvelTranslator.UnsupportedMvel](
      MvelTranslator.toSql("row.a > 0 ? 1"))
  }

  test("reference example verbatim: typed declaration and compound ops") {
    // the reference's calculated-column script uses `int hash = ...`
    // (config/migration-config.example.yaml:112-120)
    val sql = MvelTranslator.toSql(
      """int hash = row.my_col.hashCode();
        |if (hash < 0) { hash *= -1; }
        |hash %= 32;
        |return (short) hash;""".stripMargin)
    assert(sql.contains("java_hash_code(my_col)"))
    assert(sql.startsWith("CAST(") && sql.endsWith("AS SMALLINT)"))
  }

  test("escaped quotes inside literals survive masking") {
    assert(MvelTranslator.toSql("""row.name == 'O\'Brien'""") ===
      """name = 'O\'Brien'""")
  }

  test("multi-statement script (reference yaml:112-120 shape) normalizes") {
    // the reference's calculated-column example: local var, if-block,
    // compound assignment, cast+return
    val script =
      """var hash = row.my_col.hashCode();
        |if (hash < 0) { hash = -1 * hash; }
        |hash %= 32;
        |return (short) hash;""".stripMargin
    val sql = MvelTranslator.toSql(script)
    // semantics: ((short)(IF(h<0, -1*h, h) % 32))
    assert(sql.contains("java_hash_code(my_col)"))
    assert(sql.contains("IF("))
    assert(sql.contains("% (32)"))
    assert(sql.startsWith("CAST("))
    assert(sql.endsWith("AS SMALLINT)"))
  }

  test("unsupported statements throw (no garbage SQL)") {
    // ADVICE r1: detect assignments/statements we can't translate
    assertThrows[MvelTranslator.UnsupportedMvel](
      MvelTranslator.toSql("for (i = 0; i < 3; i++) { x = x + 1; }; return x;"))
    assertThrows[MvelTranslator.UnsupportedMvel](
      MvelTranslator.toSql("var a = 1; var b = 2;")) // no return
  }

  test("operators inside string literals are never rewritten") {
    assert(MvelTranslator.toSql("row.tag == 'a&&b'") === "tag = 'a&&b'")
    assert(MvelTranslator.toSql("row.note == 'see row.id'") === "note = 'see row.id'")
    assert(MvelTranslator.toSql("row.x == 'a ? b : c'") === "x = 'a ? b : c'")
  }

  test("local var sharing a column name does not corrupt row refs") {
    val sql = MvelTranslator.toSql(
      "var value = row.value * 2; value += row.value; return value;")
    // row.value must survive as the column ref `value`, locals substituted
    assert(sql === "((value * 2) + (value))")
  }

  test("string-method fast paths translate instead of falling back") {
    assert(MvelTranslator.toSql("row.text.length() > 0") ===
      "java_str_len(text) > 0")
    assert(MvelTranslator.toSql("row.text.isEmpty()") ===
      "(java_str_len(text) = 0)")
    assert(MvelTranslator.toSql("row.path.startsWith('s3://bucket/')") ===
      "startswith(path, 's3://bucket/')")
    assert(MvelTranslator.toSql("!row.line.startsWith('skip')") ===
      "!startswith(line, 'skip')")
    assert(MvelTranslator.toSql("row.name.endsWith('.txt') && row.body.contains('x')") ===
      "endswith(name, '.txt') AND contains(body, 'x')")
    // outside the arg subset (nested call) still falls back, never garbage
    assertThrows[MvelTranslator.UnsupportedMvel](
      MvelTranslator.toSql("row.a.startsWith(row.b.substring(1, 2).trim())"))
  }

  test("substring/indexOf translate to the JVM-exact kernels") {
    assert(MvelTranslator.toSql("row.text.substring(4)") ===
      "java_substring(text, 4)")
    assert(MvelTranslator.toSql("row.text.substring(0, 8)") ===
      "java_substring(text, 0, 8)")
    assert(MvelTranslator.toSql("row.text.indexOf('x') >= 0") ===
      "java_index_of(text, 'x') >= 0")
  }
}
