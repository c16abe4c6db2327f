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
}
