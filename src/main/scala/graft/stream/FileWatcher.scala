package graft.stream

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.file.{ClosedWatchServiceException, Files, Path, Paths,
  StandardWatchEventKinds, WatchEvent, WatchKey, WatchService}
import java.nio.file.StandardWatchEventKinds._
import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.collection.mutable.ArrayBuffer

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
  * Detection is EVENT-DRIVEN (java.nio WatchService = inotify on Linux,
  * like watchexec's backend): every candidate directory is registered
  * recursively, raw events are debounced for `pollMs` (DEBOUNCE_DURATION in
  * watcher.rs) and reconciled against the last snapshot, so one window =
  * one feed file = one micro-batch, and a quiet tree costs nothing — the
  * former 500 ms full-tree snapshot poll paid O(tree) per tick regardless
  * of activity. Events are filtered through the same nested-.gitignore +
  * ignored-dir semantics as the indexer's scan (watcher.rs
  * resolve_ignore_filter); a `.gitignore` edit or an event-queue overflow
  * falls back to one full snapshot diff, which also re-baselines. Added and
  * modified files emit `added`/`modified`; removed files emit `deleted` —
  * the vocabulary of mutation/changes.rs.
  *
  * [[tick]] remains the deterministic full-scan window for tests and the
  * manual-trigger face; it shares the snapshot with the event path, so a
  * change consumed by either side is never double-emitted.
  */
final class FileWatcher(projectDir: String, changeFeedDir: String,
    pollMs: Long = 500L) {

  private val running = new AtomicBoolean(false)
  private val batchNo = new AtomicLong(0)
  @volatile private var thread: Thread = _
  @volatile private var service: WatchService = _
  private val root = Paths.get(projectDir).toAbsolutePath.normalize
  private val keyDirs = new java.util.concurrent.ConcurrentHashMap[WatchKey, Path]()
  // snapshot + feed emission are guarded by `lock`: the event loop and a
  // manual tick() must never interleave a diff
  private val lock = new Object
  private var snapshot: Map[String, (Long, Long)] = Map.empty

  private def relOf(p: Path): String =
    root.relativize(p.toAbsolutePath.normalize).toString.replace('\\', '/')

  /** One full-scan window: diff the tree against the last snapshot and
    * append a feed file if anything changed. Public so tests (and a manual
    * trigger face) can drive a deterministic window without sleeping.
    */
  def tick(): Int = lock.synchronized(fullDiffLocked())

  private def fullDiffLocked(): Int = {
    val now = graft.extract.FileScanner.listPaths(projectDir)
      .map { case (p, size, mtime) => p -> (size, mtime) }.toMap
    val prev = snapshot
    val added = now.keySet.diff(prev.keySet).toSeq.sorted.map(_ -> "added")
    val deleted = prev.keySet.diff(now.keySet).toSeq.sorted.map(_ -> "deleted")
    val modified = now.keySet.intersect(prev.keySet).toSeq.sorted
      .filter(p => now(p) != prev(p)).map(_ -> "modified")
    snapshot = now
    val changes = added ++ modified ++ deleted
    if (changes.nonEmpty) emitLocked(changes)
    changes.size
  }

  private def emitLocked(changes: Seq[(String, String)]): Unit = {
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

  /** Start watching. The first snapshot is taken WITHOUT emitting changes
    * (the initial index is the baseline — watcher.rs watches post-index).
    */
  def start(): Unit = {
    if (!running.compareAndSet(false, true)) return
    service = root.getFileSystem.newWatchService()
    // ONE walk arms the watch and takes the baseline: every directory is
    // registered (pre-order) BEFORE its contents are listed, so a change
    // landing mid-walk either made it into the snapshot or is queued as an
    // event — reconciling against the snapshot turns duplicates into
    // no-ops, and nothing falls between registration and baseline
    lock.synchronized {
      snapshot = graft.extract.FileScanner
        .listPathsRegistering(projectDir, register)
        .map { case (p, size, mtime) => p -> (size, mtime) }.toMap
    }
    thread = new Thread(() => eventLoop(),
      s"graft-watcher-${root.getFileName}")
    thread.setDaemon(true)
    thread.start()
  }

  private def register(d: Path): Unit =
    try keyDirs.put(
      d.register(service, ENTRY_CREATE, ENTRY_MODIFY, ENTRY_DELETE), d)
    catch { case _: IOException => () } // dir vanished mid-registration

  /** Register every candidate directory of a NEW subtree (ignored dirs and
    * gitignored paths skipped with full ancestor-chain semantics; the
    * caller's window-scoped checker memoizes the chains).
    */
  private def registerSubtree(d: Path,
      checker: graft.extract.FileScanner.IgnoreChecker): Unit = {
    register(d)
    val entries =
      try { val s = Files.list(d); try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toVector } finally s.close() }
      catch { case _: IOException => Vector.empty }
    val nofollow = java.nio.file.LinkOption.NOFOLLOW_LINKS
    entries.foreach { p =>
      if (Files.isDirectory(p, nofollow) && !checker.isIgnored(p, isDir = true))
        registerSubtree(p, checker)
    }
  }

  private def eventLoop(): Unit = {
    while (running.get()) {
      val first =
        try service.poll(250, TimeUnit.MILLISECONDS)
        catch { case _: ClosedWatchServiceException => return }
      if (first != null) {
        val pending = ArrayBuffer[(Path, Path)]() // (watched dir, entry name)
        var overflow = false
        def drain(k: WatchKey): Unit = {
          val d = keyDirs.get(k)
          k.pollEvents().forEach { ev =>
            if (ev.kind() == StandardWatchEventKinds.OVERFLOW) overflow = true
            else if (d != null)
              pending += ((d, ev.asInstanceOf[WatchEvent[Path]].context()))
          }
          if (!k.reset()) keyDirs.remove(k) // dir gone or inaccessible
        }
        drain(first)
        // debounce: every event inside one window lands in one feed file,
        // hence one micro-batch (watcher.rs DEBOUNCE_DURATION)
        val deadline = System.nanoTime + pollMs * 1000000L
        var remainingMs = pollMs
        while (running.get() && remainingMs > 0) {
          val k =
            try service.poll(math.min(remainingMs, 250L), TimeUnit.MILLISECONDS)
            catch { case _: ClosedWatchServiceException => return }
          if (k != null) drain(k)
          remainingMs = (deadline - System.nanoTime) / 1000000L
        }
        if (running.get())
          try processWindow(pending.toSeq, overflow)
          catch { case _: IOException => () }
      }
    }
  }

  /** Reconcile one debounce window of raw events against the snapshot and
    * emit at most one feed file. A `.gitignore` change re-filters the whole
    * tree, an inotify overflow may have dropped arbitrary events, and a
    * per-path IO race (a file vanishing between its type check and its
    * stat) leaves that path's state unknown — all three fall back to ONE
    * full snapshot diff, so a single bad path can never silently drop the
    * rest of the window (the old poll loop self-healed every tick; the
    * event path self-heals by rescanning exactly when reconciliation is
    * not trustworthy).
    */
  private def processWindow(events: Seq[(Path, Path)],
      overflow: Boolean): Unit = lock.synchronized {
    var fullRescan = overflow ||
      events.exists(_._2.getFileName.toString == ".gitignore")
    val checker = new graft.extract.FileScanner.IgnoreChecker(projectDir)
    val nofollow = java.nio.file.LinkOption.NOFOLLOW_LINKS
    val added = scala.collection.mutable.SortedMap.empty[String, (Long, Long)]
    val modified = scala.collection.mutable.SortedMap.empty[String, (Long, Long)]
    val deleted = scala.collection.mutable.SortedSet.empty[String]
    val paths = events.map { case (dir, name) => dir.resolve(name) }.distinct
    paths.foreach { p =>
      if (!fullRescan) try {
        val rel = relOf(p)
        if (Files.isDirectory(p, nofollow)) {
          if (!checker.isIgnored(p, isDir = true)) {
            // a directory appeared (or churned): files may have landed
            // inside before its registration — register the subtree, sweep
            // it, and diff away snapshot entries the sweep did NOT see (a
            // directory REPLACED within one window, or a file→dir swap,
            // must surface its vanished files as deletes)
            registerSubtree(p, checker)
            val seen = scala.collection.mutable.Set.empty[String]
            graft.extract.FileScanner.listPathsUnder(projectDir, p).foreach {
              case (r, size, mtime) =>
                seen += r
                snapshot.get(r) match {
                  case None => added.update(r, (size, mtime))
                  case Some(prev) if prev != ((size, mtime)) =>
                    modified.update(r, (size, mtime))
                  case _ => ()
                }
            }
            if (snapshot.contains(rel)) deleted += rel // was a FILE, now a dir
            val prefix = rel + "/"
            snapshot.keysIterator
              .filter(k => k.startsWith(prefix) && !seen(k))
              .foreach(deleted += _)
          }
        } else if (Files.isRegularFile(p, nofollow)) {
          if (!checker.isIgnored(p, isDir = false)) {
            val st = (Files.size(p), Files.getLastModifiedTime(p).toMillis)
            snapshot.get(rel) match {
              case None => added.update(rel, st)
              case Some(prev) if prev != st => modified.update(rel, st)
              case _ => ()
            }
          }
        } else {
          // gone: a tracked file, or a whole tracked directory's subtree.
          // Ignored paths were never in the snapshot, so they no-op here —
          // and a create+delete inside one window nets to zero rows.
          if (snapshot.contains(rel)) deleted += rel
          val prefix = rel + "/"
          snapshot.keysIterator.filter(_.startsWith(prefix)).foreach(deleted += _)
        }
      } catch { case _: IOException => fullRescan = true }
    }
    if (fullRescan) { fullDiffLocked(); return }
    // a path swept as added by one event but observed gone by another in
    // the same window: the deleted verdict wins (conservative — a racing
    // re-create fires its own event and the next window re-adds it)
    deleted.foreach { k => added.remove(k); modified.remove(k) }
    if (added.nonEmpty || modified.nonEmpty || deleted.nonEmpty) {
      snapshot = snapshot -- deleted ++ added ++ modified
      emitLocked(added.keys.map(_ -> "added").toSeq ++
        modified.keys.map(_ -> "modified").toSeq ++
        deleted.toSeq.map(_ -> "deleted"))
    }
  }

  def stop(): Unit = {
    running.set(false)
    if (service != null)
      try service.close() catch { case _: IOException => () }
    if (thread != null) { thread.interrupt(); thread.join(2000) }
  }
}
