package graft.stream

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** T1 — a real filesystem watcher closing the loop the reference's
  * watchexec-based project watcher provides
  * (http-server-desktop/src/watcher.rs:440-600): watch a project tree,
  * debounce raw events into change windows, and hand each window to the
  * incremental indexing pipeline.
  *
  * Spark-native shape: the watcher is driver-side (the project tree is a
  * local filesystem, exactly as in the reference's desktop server) and its
  * only output is the change feed — one JSON-lines file per debounce window
  * with (changed_path, change_type) rows — which
  * [[IncrementalIndexer.start]] already consumes via `readStream.json`.
  * Everything downstream (delete + reindex + merged-graph re-resolution)
  * stays a distributed Structured Streaming job; the watcher replaces only
  * the reference's watchexec event source.
  *
  * Detection is snapshot-diff polling over [[graft.extract.FileScanner]]'s
  * gitignore-honoring listing (watcher.rs filters through the project's
  * ignore files the same way — resolve_ignore_filter). The poll interval IS
  * the debounce window (DEBOUNCE_DURATION in watcher.rs): every edit inside
  * one interval lands in one feed file, hence one micro-batch. Added and
  * modified files emit `added`/`modified`; removed files emit `deleted` —
  * the vocabulary of mutation/changes.rs.
  */
final class FileWatcher(projectDir: String, changeFeedDir: String,
    pollMs: Long = 500L) {

  private val running = new AtomicBoolean(false)
  private val batchNo = new AtomicLong(0)
  @volatile private var thread: Thread = _
  @volatile private var snapshot: Map[String, (Long, Long)] = Map.empty

  /** One poll tick: diff the tree against the last snapshot and append a
    * feed file if anything changed. Public so tests (and a manual trigger
    * face) can drive a deterministic window without sleeping.
    */
  def tick(): Int = {
    val now = graft.extract.FileScanner.listPaths(projectDir)
      .map { case (p, size, mtime) => p -> (size, mtime) }.toMap
    val prev = snapshot
    val added = now.keySet.diff(prev.keySet).toSeq.sorted.map(_ -> "added")
    val deleted = prev.keySet.diff(now.keySet).toSeq.sorted.map(_ -> "deleted")
    val modified = now.keySet.intersect(prev.keySet).toSeq.sorted
      .filter(p => now(p) != prev(p)).map(_ -> "modified")
    snapshot = now
    val changes = added ++ modified ++ deleted
    if (changes.nonEmpty) {
      // full JSON string escaping: a control character in a file name
      // (newline is legal on POSIX) must not split the line — the streaming
      // source would mark both fragments _corrupt_record and silently drop
      // the change from the reindex batch
      def esc(s: String): String = s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val lines = changes.map { case (p, t) =>
        s"""{"changed_path":"${esc(p)}","change_type":"$t"}"""
      }.mkString("", "\n", "\n")
      val out = java.nio.file.Paths.get(changeFeedDir)
      Files.createDirectories(out)
      // write-then-rename: the streaming source must never see a partial file
      val tmp = out.resolve(s".batch-${batchNo.get}.json.tmp")
      Files.write(tmp, lines.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, out.resolve(s"batch-${batchNo.getAndIncrement()}.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    changes.size
  }

  /** Start watching. The first snapshot is taken WITHOUT emitting changes
    * (the initial index is the baseline — watcher.rs watches post-index).
    */
  def start(): Unit = {
    if (!running.compareAndSet(false, true)) return
    snapshot = graft.extract.FileScanner.listPaths(projectDir)
      .map { case (p, size, mtime) => p -> (size, mtime) }.toMap
    thread = new Thread(() => {
      while (running.get()) {
        try tick() catch { case _: java.io.IOException => () }
        try Thread.sleep(pollMs) catch { case _: InterruptedException => () }
      }
    }, s"graft-watcher-${Path.of(projectDir).getFileName}")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = {
    running.set(false)
    if (thread != null) { thread.interrupt(); thread.join(2000) }
  }
}
