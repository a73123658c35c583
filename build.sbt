ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wuserflowfeaturestorespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// The full suite battery is ~36 min sequential in one forked JVM (the
// r17 driver's test run was killed at budget with every suite green) —
// split the suites across four concurrently-forked JVMs. Each group
// gets its OWN spark.sql.warehouse.dir: the serving layouts (AnnIndex
// roots, bucketed silver tables) key off the warehouse path, and
// concurrent groups must not race on one directory tree. Everything
// else a suite touches is already per-JVM (in-memory catalog,
// localCheckpoint blocks) or unique-per-call (tmpDir).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  val whBase = (Test / target).value / "spark-warehouse"
  val n = 4
  tests.sortBy(_.name).zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(
        s"group$g",
        ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(
          baseOpts :+ s"-Dspark.sql.warehouse.dir=$whBase-g$g")))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(8),
)
