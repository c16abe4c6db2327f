package graft.serve

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The desktop server's watch-after-index loop end-to-end at the
  * WorkspaceManager level (the HTTP face is covered by HttpSpec): index a
  * workspace, start the watch, edit a project file on disk, and observe the
  * STORE update and the `WorkspaceReindexed` bus event with no manual feed
  * writes — the behavior of watcher.rs + the indexing queue combined.
  */
class WorkspaceWatchSpec extends SparkSpec {

  test("watchWorkspace: an on-disk edit reindexes the project store") {
    val ws = Files.createTempDirectory("graft-ww")
    val proj = ws.resolve("svc")
    Files.createDirectories(proj.resolve(".git"))
    Files.writeString(proj.resolve("m.py"), "def first():\n    return 1\n")

    val bus = new EventPublisher
    val (_, events) = bus.subscribe()
    val mgr = new WorkspaceManager(spark,
      Files.createTempDirectory("graft-ww-data").toString, bus,
      autoWatch = true)
    val state = mgr.getOrRegister(ws.toString).getOrElse(fail("register failed"))
    mgr.dispatchIndex(state)
    try {
      // generous deadline: under a full parallel `sbt test` run the index
      // job shares the JVM with 30+ suites and can take well over a minute
      def drainUntil(tpe: String, deadlineMs: Long = 240000): String = {
        val deadline = System.currentTimeMillis() + deadlineMs
        while (System.currentTimeMillis() < deadline) {
          val e = events.poll(250, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (e != null && e.contains(s""""type":"$tpe"""")) return e
        }
        fail(s"no $tpe event within ${deadlineMs}ms")
      }
      drainUntil("WorkspaceIndexingCompleted")
      val storeDir = mgr.storeDirFor(state, state.projects.head)
      assert(graft.store.GraphStore.read(spark, storeDir).definitions
        .where(col("name") === "first").count() == 1)

      // edit on disk; the watcher + streaming query must pick it up
      Files.writeString(proj.resolve("m.py"),
        "def first():\n    return 1\n\ndef second():\n    return 2\n")
      drainUntil("WorkspaceReindexed")
      val names = graft.store.GraphStore.read(spark, storeDir).definitions
        .select("name").collect().map(_.getString(0)).toSet
      assert(names.contains("second"), s"store not reindexed: $names")
    } finally mgr.shutdown()
  }

  test("concurrent index requests on one workspace serialize: event pairs " +
    "never interleave, the store stays consistent") {
    // the reference serializes per-project indexing through its queue
    // worker (queue/worker.rs); the Spark side uses a single-threaded job
    // dispatcher — prove the *observable* contract: N racing requests
    // produce N strictly consecutive Started/Completed pairs on the bus
    val ws = Files.createTempDirectory("graft-race")
    val proj = ws.resolve("svc")
    Files.createDirectories(proj.resolve(".git"))
    Files.writeString(proj.resolve("m.py"), "def races():\n    return 1\n")

    val bus = new EventPublisher
    val (_, events) = bus.subscribe()
    val mgr = new WorkspaceManager(spark,
      Files.createTempDirectory("graft-race-data").toString, bus)
    val state = mgr.getOrRegister(ws.toString).getOrElse(fail("register failed"))
    try {
      val n = 4
      // racing dispatchers, the same call the POST /workspace/index
      // handler makes from the HTTP pool threads
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val gate = new java.util.concurrent.CountDownLatch(1)
      (1 to n).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = { gate.await(); mgr.dispatchIndex(state) }
        })
      }
      gate.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))

      // collect 2n lifecycle events (generous deadline under parallel suites)
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      val deadline = System.currentTimeMillis() + 240000
      while (seen.length < 2 * n && System.currentTimeMillis() < deadline) {
        val e = events.poll(250, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (e != null) {
          if (e.contains("\"WorkspaceIndexingFailed\"")) fail(s"job failed: $e")
          if (e.contains("\"WorkspaceIndexingStarted\"")) seen += "S"
          if (e.contains("\"WorkspaceIndexingCompleted\"")) seen += "C"
        }
      }
      // strict serialization: every Started is followed by its own
      // Completed before the next job's Started appears
      assert(seen.toSeq == Seq.fill(n)(Seq("S", "C")).flatten,
        s"interleaved lifecycle: ${seen.mkString(",")}")
      assert(state.status == "Indexed")
      assert(state.projects.forall(_.status == "Indexed"))
      val store = graft.store.GraphStore.read(spark,
        mgr.storeDirFor(state, state.projects.head))
      assert(store.definitions.where(col("name") === "races").count() == 1)
    } finally mgr.shutdown()
  }
}
