package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/**
 * MVEL-subset → Catalyst translator.
 *
 * The reference's entire user-expression surface is MVEL strings over
 * `row.<col>` references, used by FieldValueFilter predicates
 * (reference: implementation/FieldValueFilter.java:35-89) and calculated
 * columns (implementation/DefaultMigratorPlugin.java:137-173). Column
 * dependencies are extracted there with the regex
 * `row\.(?<columnName>[a-zA-Z0-9_]*)`
 * (util/CassandraSchemaUtil.java:26-28). We translate the practically-used
 * subset (comparisons, boolean algebra, arithmetic, a few method calls) to a
 * Spark SQL expression string — so the predicate lands in Catalyst, gets
 * pushed down / codegen'd, and never runs row-at-a-time.
 *
 * Supported subset (everything the reference's example config uses —
 * config/migration-config.example.yaml:95,112-120):
 *   - `row.col` column refs (prefix stripped, like FieldValueFilter.java:60-62)
 *   - `&&  ||  !` → `AND OR NOT`; `==` → `=`; `!=` stays
 *   - arithmetic `+ - * / %`, parens, numeric/string/bool literals
 *   - `x.hashCode()` → `java_hash_code(x)` (JVM-exact, codegen'd —
 *     see [[graft.functions.JavaHashCode]])
 *   - `abs(...)`, ternary `c ? a : b` → `IF(c, a, b)`
 *   - `(short)/(int)/(long)/(byte)/(double)/(float)` casts → SQL CAST
 *
 * Anything outside the subset throws at plan time (fail-fast, matching the
 * reference's unsupported-type contract) — callers can fall back to a
 * registered UDF for full-MVEL parity if ever needed.
 */
object MvelTranslator {

  private val ColRef = """row\.([a-zA-Z0-9_]+)""".r
  private val HashCall = """([a-zA-Z0-9_]+)\.hashCode\(\)""".r
  private val CastRe = """\((short|int|long|byte|float|double)\)\s*""".r
  private val Ternary = """(?s)^(.*?)\?(.*):(.*)$""".r

  /** Column names referenced as `row.x` — mirrors
    * CassandraSchemaUtil.findRowColumnReferencesInString (:58-65).
    */
  def referencedColumns(mvel: String): Seq[String] =
    ColRef.findAllMatchIn(mvel).map(_.group(1)).toSeq.distinct

  private val castType = Map(
    "short" -> "SMALLINT", "int" -> "INT", "long" -> "BIGINT",
    "byte" -> "TINYINT", "float" -> "FLOAT", "double" -> "DOUBLE")

  /** Translate an MVEL-subset expression into a Spark SQL expression string. */
  def toSql(mvel: String): String = {
    var s = mvel.trim
    // strip a trailing `;` / leading `return` (MVEL statement style)
    s = s.stripSuffix(";").trim
    if (s.startsWith("return ")) s = s.drop(7).trim
    // `row.x` → `x` (FieldValueFilter.java:60-62 strips the same prefix)
    s = ColRef.replaceAllIn(s, m => m.group(1))
    // method-call mappings
    s = HashCall.replaceAllIn(s, m => s"java_hash_code(${m.group(1)})")
    // java casts → SQL cast: `(short) expr` — apply to the next balanced term
    s = rewriteCasts(s)
    // ternary → IF (single, non-nested — enough for the reference subset)
    s = Ternary.findFirstMatchIn(s) match {
      case Some(m) if !s.contains("?:") =>
        s"IF(${m.group(1).trim}, ${m.group(2).trim}, ${m.group(3).trim})"
      case _ => s
    }
    // boolean algebra / equality
    s = s.replace("&&", " AND ").replace("||", " OR ")
    s = s.replaceAll("""!=""", "<#NEQ#>")
      .replaceAll("""==""", " = ")
      .replace("<#NEQ#>", " != ")
      .replaceAll("""!\s*\(""", " NOT (")
    s
  }

  /** `(short) x % 32` → `CAST(x % 32 AS SMALLINT)` — the cast binds to the
    * remainder of the expression (MVEL evaluates the full arithmetic before
    * the cast in the reference's example yaml:117).
    */
  private def rewriteCasts(s: String): String =
    CastRe.findFirstMatchIn(s) match {
      case Some(m) =>
        val rest = rewriteCasts(s.substring(m.end))
        s"${s.substring(0, m.start)}CAST(${rest.trim} AS ${castType(m.group(1))})"
      case None => s
    }

  /** Translate to a Column ready for `df.filter` / `df.withColumn`. */
  def toColumn(mvel: String): Column = expr(toSql(mvel))
}
