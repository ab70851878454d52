package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over [[SparkEntry]]'s query/oracle maps — pure map
  * inspection, no SparkSession needed.
  *
  * Signed-zero convention: the driver's correctness gate hashes canonical
  * bytes, and IEEE `-0.0` and `+0.0` hash differently. DuckDB's `round`
  * preserves the sign of zero (`round(-1e-9, 4)` → `-0.0`) while Spark's
  * BigDecimal-based `round` always returns `+0.0` — so any oracle that
  * emits `round(x)` of a possibly-negative double can flake on a single
  * cell (this bit `s10_standardize` in round 6). The convention: every
  * final rounded-double emission in the oracle SQL appends `+ 0.0`
  * (identity except `-0.0` → `+0.0`, NULL-preserving), matching the
  * engine's `round` behavior by construction. Rounds that feed a cast to
  * DECIMAL or an integer type are exempt (those types have no signed
  * zero).
  */
class EntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle (driver downgrades " +
      s"these to rows-only checks — add the SQL or consciously exempt here): " +
      s"${(q -- o).toSeq.sorted}")
  }

  test("README query counts match SparkEntry (counts drifted twice before)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val counts = """(\d+)\s+(?:driver\s+)?queries""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(counts.nonEmpty, "README no longer states the query count")
    assert(counts.forall(_ == SparkEntry.queries.size),
      s"README claims $counts queries but SparkEntry has " +
        s"${SparkEntry.queries.size} — update README.md")
    // SURVEY.md states the count too and drifted in round 7 — pin it
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val surveyCounts = """ALL (\d+) driver queries""".r
      .findAllMatchIn(survey).map(_.group(1).toInt).toSeq
    assert(surveyCounts.forall(_ == SparkEntry.queries.size),
      s"SURVEY claims $surveyCounts queries but SparkEntry has " +
        s"${SparkEntry.queries.size} — update SURVEY.md")
  }

  test("oracle round() emissions are signed-zero canonicalized (+ 0.0)") {
    // anchored to EACH round's matching closing paren (a flat window could
    // be satisfied by a NEIGHBORING column's `+ 0.0`): immediately after
    // `round(...)` must come `+ 0.0`, or the tail up to the emission
    // boundary must cast to a type without signed zero
    val roundRe = "(?i)round\\(".r
    def closingParen(s: String, open: Int): Int = {
      var depth = 0
      var i = open
      while (i < s.length) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    val zeroSignFreeCast =
      "(?i)AS\\s+(DECIMAL|TINYINT|SMALLINT|INT|INTEGER|BIGINT)\\b".r
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      m <- roundRe.findAllMatchIn(sql)
      close = closingParen(sql, m.end - 1)
      tail = sql.substring(close + 1).dropWhile(_.isWhitespace)
      // emission boundary: the next comma / line break caps how far a cast
      // may legitimately sit — a neighboring column cannot start before it
      scope = tail.takeWhile(c => c != ',' && c != '\n')
      if !tail.startsWith("+ 0.0") && zeroSignFreeCast.findFirstIn(scope).isEmpty
    } yield s"$name @${m.start}: round(...) ${scope.take(60)}"
    assert(offenders.isEmpty,
      "naked round() emission(s) — append `+ 0.0` right after the paren " +
        "(see scaladoc):\n" + offenders.mkString("\n"))
  }

  test("oracle window/aggregate SUMs over integers are cast (no HUGEINT)") {
    // DuckDB types SUM over a BIGINT input as HUGEINT (int128). The
    // driver's gate hashes canonical value BYTES, so int128(42) !=
    // int64(42) even when every value matches — this failed
    // t33_heaps_growth in round 9 as the ONLY uncast window sum of 174
    // oracles. Convention (e09): wrap every `SUM(...) OVER` in
    // `CAST(... AS BIGINT)`. Plain GROUP BY sums are equally affected
    // unless their input is already DOUBLE/DECIMAL or they feed a cast,
    // but those are covered by the runtime dtype gate in
    // scripts/check_correctness.py (which executes every oracle in
    // DuckDB and fails on any HUGEINT output column); this static lint
    // pins the window-sum class that slipped through.
    def closingParen(s: String, open: Int): Int = {
      var depth = 0
      var i = open
      while (i < s.length) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    val sumRe = "(?i)\\bsum\\s*\\(".r
    def depthAt(s: String, pos: Int): Int = {
      var depth = 0
      var i = 0
      while (i < pos) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      depth
    }
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      m <- sumRe.findAllMatchIn(sql)
      close = closingParen(sql, m.end - 1)
      if close > 0
      tail = sql.substring(close + 1).dropWhile(_.isWhitespace)
      if tail.toLowerCase.startsWith("over")
      // only FINAL-select emissions are the failure class: a window sum
      // at paren depth 0 lands in the output schema uncoerced (t33's
      // bug); one inside a CTE or a wrapping CAST/expression (depth > 0)
      // is consumed downstream and the runtime dtype gate covers it
      if depthAt(sql, m.start) == 0
    } yield s"$name @${m.start}: final-select SUM(...) OVER without a CAST"
    assert(offenders.isEmpty,
      "uncast window sum(s) — DuckDB types these HUGEINT and the driver " +
        "hash gate fails on the byte width; wrap in CAST(... AS BIGINT) " +
        "(the e09/t33 convention):\n" + offenders.mkString("\n"))
  }
}
