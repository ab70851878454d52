package graft.plugin

import org.apache.spark.sql.DataFrame

/**
 * The reflective extension SPI — the counterpart of the reference's
 * `Class.forName` plugin contract (reference:
 * model/config/TableDataFilterDefinition.java:53-71 for filters,
 * model/config/TableDataMigratorPluginDefinition.java:32-53 for whole
 * migrator plugins).
 *
 * A stage is a DataFrame → DataFrame function: it can filter, derive,
 * rename, repartition — anything the reference's row-loop plugins did,
 * expressed against the full plan (so a well-written plugin stays
 * declarative and Catalyst keeps optimizing through it).
 *
 * Config surface (`type:` carrying a fully-qualified class name is a
 * plugin; the two built-in names stay built-in):
 * {{{
 * filters:
 *   - type: com.example.MyStage
 *     options:
 *       threshold: "10"
 * }}}
 * Implementations need a public no-arg constructor.
 */
trait GraftStage extends Serializable {
  def apply(df: DataFrame, options: Map[String, String]): DataFrame
}

object GraftStage {

  final case class PluginLoadError(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

  /** Instantiate a stage by class name — fail with a config-shaped error,
    * not a bare reflection stack.
    */
  def load(className: String): GraftStage =
    try Class.forName(className).getDeclaredConstructor().newInstance() match {
      case s: GraftStage => s
      case other => throw PluginLoadError(
        s"plugin class '$className' does not implement graft.plugin.GraftStage " +
          s"(got ${other.getClass.getName})", null)
    } catch {
      case e: PluginLoadError => throw e
      case e: ClassNotFoundException =>
        throw PluginLoadError(s"plugin class '$className' not found on classpath", e)
      case e: ReflectiveOperationException =>
        throw PluginLoadError(
          s"plugin class '$className' needs a public no-arg constructor", e)
    }
}
