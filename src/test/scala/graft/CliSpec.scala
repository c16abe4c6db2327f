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

  test("server/clean round-trip: index, serve, query over HTTP, stop, clean") {
    val repo = Files.createTempDirectory("graft-cli-srv-repo")
    Files.writeString(repo.resolve("m.py"),
      "class A:\n    def f(self):\n        return 1\n")
    val store = Files.createTempDirectory("graft-cli-srv-store").toString
    Cli.run(spark, List("index", repo.toString, store, "srvrepo"))

    val dataDir = store + "/.graft-data"
    // the `server start` wiring minus the blocking loop (main blocks until
    // the lock disappears; specs own the lifecycle directly)
    val (srv, lockPath) = Cli.startServer(spark, store, port = 0,
      workspace = "ws", project = "proj",
      dataDir = dataDir, jwtSecretPath = None)
    try {
      // lock carries this JVM's pid and the bound port (server.rs:119-125)
      val lock = Cli.readLock(dataDir)
      assert(lock.exists(_._2 === java.lang.ProcessHandle.current.pid))
      val port = lock.get._1
      def get(path: String): (Int, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        try (conn.getResponseCode,
          new String(conn.getInputStream.readAllBytes(), "UTF-8"))
        finally conn.disconnect()
      }
      assert(get("/health")._1 === 200) // health.rs: bare 200
      assert(get("/info")._2.contains(s""""port":$port"""))
      // a real graph query over the wire
      val stats = get("/graph/stats/ws/proj")._2
      assert(stats.contains(""""definition_count":2"""), stats)

      // clean refuses while the lock names this live server (clean.rs:11-14)
      val refused = intercept[IllegalStateException] {
        Cli.run(spark, List("clean", dataDir))
      }
      assert(refused.getMessage.contains("stop it before running clean"))
    } finally {
      srv.stop()
      Files.deleteIfExists(java.nio.file.Paths.get(lockPath))
    }
    // server gone + lock removed: clean wipes the data dir
    Cli.run(spark, List("clean", dataDir))
    assert(!new java.io.File(dataDir).exists())
  }

  test("clean removes a symlink without following it into its target") {
    val external = Files.createTempDirectory("graft-clean-external")
    Files.writeString(external.resolve("precious.txt"), "keep me\n")
    val dataDir = Files.createTempDirectory("graft-clean-data")
    Files.writeString(dataDir.resolve("store.bin"), "x\n")
    Files.createSymbolicLink(dataDir.resolve("link-out"), external)

    Cli.run(spark, List("clean", dataDir.toString))

    assert(!Files.exists(dataDir), "data dir should be gone")
    assert(Files.exists(external.resolve("precious.txt")),
      "clean must not follow the symlink into external data")
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
    // per-language definition_types (stats.rs LanguageStats.definition_types):
    // class A + def f → one Class, one Method under python
    assert(txt.contains(""""definition_types_per_language""""))
    assert(txt.contains(""""Class": 1"""))
    assert(txt.contains(""""Method": 1"""))
  }
}
