package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for running the engine's drivers/suites under
  * `local-cluster[W,C,MB]` — the mode that launches REAL executor JVMs
  * (separate processes, real task/broadcast serialization, executor-side
  * classloading) instead of the single-JVM `local[*]` shortcut.
  *
  * Executor JVMs are spawned from SPARK_HOME and know nothing of sbt's
  * classpath, so (1) application classes must ship as jars
  * (`spark.jars`, served by the driver's file server), and (2) the
  * JDK-17 `--add-opens` flags build.sbt injects into the forked DRIVER
  * must be repeated for the executors — spark-submit would do both,
  * but these JVMs are born from a SparkSession builder.
  * (The invoking shell must also export SPARK_SCALA_VERSION=2.13: the
  * release layout has no launcher/target build dirs for the executor
  * command builder to sniff the version from.) */
object ClusterEnv {
  /** Mirrors org.apache.spark.launcher.JavaModuleOptions /
    * build.sbt's jdk17AddOpens. */
  val addOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  /** Apply executor-side jar shipping + JVM options to a builder when
    * `jars` (comma-separated) is provided — no-op otherwise, so the
    * default local[] paths are untouched. */
  def withExecutorEnv(b: SparkSession.Builder, jars: Option[String],
      executorMem: String): SparkSession.Builder = {
    jars.foreach { j =>
      b.config("spark.jars", j)
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory", executorMem)
    }
    b
  }
}
