package graft

import java.nio.file.Files
import graft.store.GraphStore

/** Workspace CLI: one store per project (the reference's workspace model —
  * one DB per project, queries routed by project).
  */
class CliSpec extends SparkSpec {

  test("index-workspace writes one store per project; list-projects finds them") {
    val ws = Files.createTempDirectory("graft-ws")
    def put(rel: String, content: String): Unit = {
      val p = ws.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    // two projects with a COLLIDING relative path — per-project stores keep
    // them separate (a naive merged graph would conflate them)
    put("alpha/app.py", "def alpha_main():\n    pass\n")
    put("beta/app.py", "def beta_main():\n    pass\n")
    val out = Files.createTempDirectory("graft-ws-store").toString

    Cli.run(spark, List("index-workspace", ws.toString, out))

    assert(Cli.listProjects(out) === Seq("alpha", "beta"))
    val alpha = GraphStore.read(spark, s"$out/alpha")
    val beta = GraphStore.read(spark, s"$out/beta")
    import org.apache.spark.sql.functions.col
    assert(alpha.definitions.where(col("fqn") === "alpha_main").count() === 1)
    assert(alpha.definitions.where(col("fqn") === "beta_main").count() === 0)
    assert(beta.definitions.where(col("fqn") === "beta_main").count() === 1)
    assert(alpha.files.where(col("path") === "app.py").count() === 1)
    assert(beta.files.where(col("path") === "app.py").count() === 1)
  }

  test("index --stats writes the reference-style stats JSON") {
    val ws = Files.createTempDirectory("graft-stats-repo")
    Files.writeString(ws.resolve("m.py"),
      "class A:\n    def f(self):\n        pass\n")
    val out = Files.createTempDirectory("graft-stats-store").toString
    val statsPath = out + "/stats.json"
    Cli.run(spark, List("index", ws.toString, out, "statsrepo", statsPath))
    val txt = Files.readString(java.nio.file.Paths.get(statsPath))
    assert(txt.contains(""""total_files": 1"""))
    assert(txt.contains(""""total_definitions": 2"""))
    assert(txt.contains(""""python": 1""")) // files_per_language
    assert(txt.contains(""""stage_durations_sec""""))
  }
}
