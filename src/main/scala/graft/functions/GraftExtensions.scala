package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Public-API function registration (SURVEY §2 O22 — the reference's
 * reflective plugin loading, TableDataMigratorPluginDefinition.java:32-53,
 * re-expressed as Spark's sanctioned extension point):
 *
 * {{{
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)   // or
 *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
 * }}}
 *
 * Sessions not built this way can call `GraftFunctions.register(spark)`
 * (the planner does so defensively).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("java_hash_code"),
      info("java_hash_code", "java_hash_code(str) - exact JVM String.hashCode"),
      (es: Seq[Expression]) => JavaHashCode(es.head)))
    ext.injectFunction((FunctionIdentifier("poly_hash64"),
      info("poly_hash64", "poly_hash64(str) - base-31 rolling hash"),
      (es: Seq[Expression]) => PolyHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - float-array dot product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("java_str_len"),
      info("java_str_len", "java_str_len(str) - exact JVM String.length (UTF-16 units)"),
      (es: Seq[Expression]) => JavaStrLen(es.head)))
    ext.injectFunction((FunctionIdentifier("java_substring"),
      info("java_substring", "java_substring(str, from[, to]) - exact JVM String.substring"),
      (es: Seq[Expression]) => es match {
        case Seq(s, f) => JavaSubstringFrom(s, f)
        case Seq(s, f, t) => JavaSubstringRange(s, f, t)
        case other => throw new IllegalArgumentException(
          s"java_substring takes 2 or 3 args, got ${other.length}")
      }))
    ext.injectFunction((FunctionIdentifier("java_index_of"),
      info("java_index_of", "java_index_of(str, sub) - exact JVM String.indexOf"),
      (es: Seq[Expression]) => JavaIndexOf(es.head, es(1))))
  }
}
