package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Zero-arg-constructible injector for declarative cluster wiring:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * Spark instantiates this class reflectively for every new session and
  * applies it; it delegates to [[graft.plans.GraftExtensions]] (the native
  * function registrations + BandJoinRule). `graft.Main` also applies the
  * same extensions via `builder.withExtensions`, so either wiring (or both —
  * all registrations are create-or-replace and the rule is idempotent)
  * yields identical sessions. GraftExtensionsSpec drives the reflective path
  * exactly as Spark's applyExtensions does; `graft.tools.ExtensionsCheck`
  * is the fresh-JVM end-to-end twin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.plans.GraftExtensions(ext)
}
