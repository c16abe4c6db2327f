package graft.stream

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.Eventually.{eventually, timeout, interval}
import org.scalatest.time.{Seconds, Millis, Span}

/** The event-driven face of [[FileWatcher]] (round 5): with a short
  * debounce window and NO manual tick() calls, inotify events alone must
  * produce the feed files — including gitignore filtering, new-directory
  * subtrees, and deletion of whole directories. (StreamingSpec keeps
  * covering the deterministic tick() face.)
  */
class FileWatcherEventSpec extends AnyFunSuite {

  private def feedFiles(feed: Path): Seq[Path] = {
    if (!Files.isDirectory(feed)) return Nil
    val s = Files.list(feed)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.getFileName.toString.endsWith(".json"))
        .toVector.sortBy(_.getFileName.toString)
    } finally s.close()
  }

  private def rows(feed: Path): Set[(String, String)] =
    feedFiles(feed).flatMap { f =>
      Files.readAllLines(f).toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
        .map { line =>
          val p = """"changed_path":"([^"]*)"""".r.findFirstMatchIn(line).get.group(1)
          val t = """"change_type":"([^"]*)"""".r.findFirstMatchIn(line).get.group(1)
          (p, t)
        }
    }.toSet

  test("events alone drive feed windows: edit/add/delete, gitignore honored") {
    val repo = Files.createTempDirectory("graft-evw-repo")
    Files.writeString(repo.resolve("a.py"), "def a():\n    return 1\n")
    Files.writeString(repo.resolve(".gitignore"), "*.log\n")
    val feed = Files.createTempDirectory("graft-evw-feed")
    val w = new FileWatcher(repo.toString, feed.toString, pollMs = 150L)
    w.start()
    try {
      Files.writeString(repo.resolve("a.py"), "def a():\n    return 10\n# more\n")
      Files.writeString(repo.resolve("b.py"), "def b():\n    return 2\n")
      Files.writeString(repo.resolve("noise.log"), "ignored\n")
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        assert(rows(feed) === Set("a.py" -> "modified", "b.py" -> "added"))
      }
      val before = feedFiles(feed).size
      Files.delete(repo.resolve("b.py"))
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        assert(rows(feed).contains("b.py" -> "deleted"))
      }
      assert(feedFiles(feed).size === before + 1) // one window, one file
    } finally w.stop()
  }

  test("a created directory's files are swept in; deleting it emits per-file deletes") {
    val repo = Files.createTempDirectory("graft-evw2-repo")
    Files.writeString(repo.resolve("root.py"), "def r():\n    return 0\n")
    val feed = Files.createTempDirectory("graft-evw2-feed")
    val w = new FileWatcher(repo.toString, feed.toString, pollMs = 150L)
    w.start()
    try {
      val sub = Files.createDirectory(repo.resolve("pkg"))
      Files.writeString(sub.resolve("m1.py"), "def m1():\n    return 1\n")
      Files.writeString(sub.resolve("m2.py"), "def m2():\n    return 2\n")
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        val r = rows(feed)
        assert(r.contains("pkg/m1.py" -> "added") && r.contains("pkg/m2.py" -> "added"))
      }
      // a file created inside the NEW dir after the first window: the
      // subtree registration must have picked the dir up
      Files.writeString(sub.resolve("m3.py"), "def m3():\n    return 3\n")
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        assert(rows(feed).contains("pkg/m3.py" -> "added"))
      }
      // drop the whole directory: every tracked file under it is a delete
      Files.delete(sub.resolve("m1.py"))
      Files.delete(sub.resolve("m2.py"))
      Files.delete(sub.resolve("m3.py"))
      Files.delete(sub)
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        val r = rows(feed)
        assert(r.contains("pkg/m1.py" -> "deleted") &&
          r.contains("pkg/m2.py" -> "deleted") &&
          r.contains("pkg/m3.py" -> "deleted"))
      }
    } finally w.stop()
  }

  test("replacing a directory within one window surfaces vanished files as deletes") {
    val repo = Files.createTempDirectory("graft-evw4-repo")
    val pkg = Files.createDirectory(repo.resolve("pkg"))
    Files.writeString(pkg.resolve("a.py"), "def a():\n    return 1\n")
    Files.writeString(pkg.resolve("b.py"), "def b():\n    return 2\n")
    val feed = Files.createTempDirectory("graft-evw4-feed")
    // long debounce: the whole replace lands in ONE window
    val w = new FileWatcher(repo.toString, feed.toString, pollMs = 1500L)
    w.start()
    try {
      // replace: rm -r pkg && mkdir pkg && add a different file
      Files.delete(pkg.resolve("a.py"))
      Files.delete(pkg.resolve("b.py"))
      Files.delete(pkg)
      val pkg2 = Files.createDirectory(repo.resolve("pkg"))
      Files.writeString(pkg2.resolve("c.py"), "def c():\n    return 3\n")
      eventually(timeout(Span(15, Seconds)), interval(Span(200, Millis))) {
        val r = rows(feed)
        assert(r.contains("pkg/a.py" -> "deleted") &&
          r.contains("pkg/b.py" -> "deleted") &&
          r.contains("pkg/c.py" -> "added"), s"got $r")
        // the replaced directory's survivors-only sweep must not resurrect
        // the old files
        assert(!r.contains("pkg/a.py" -> "added") &&
          !r.contains("pkg/b.py" -> "added"), s"got $r")
      }
    } finally w.stop()
  }

  test("editing .gitignore re-filters via a full snapshot diff") {
    val repo = Files.createTempDirectory("graft-evw3-repo")
    Files.writeString(repo.resolve(".gitignore"), "secret.py\n")
    Files.writeString(repo.resolve("a.py"), "def a():\n    return 1\n")
    Files.writeString(repo.resolve("secret.py"), "def s():\n    return 9\n")
    val feed = Files.createTempDirectory("graft-evw3-feed")
    val w = new FileWatcher(repo.toString, feed.toString, pollMs = 150L)
    w.start()
    try {
      // un-ignore secret.py: the full diff must surface it as added
      Files.writeString(repo.resolve(".gitignore"), "# nothing ignored\n")
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        assert(rows(feed).contains("secret.py" -> "added"))
      }
    } finally w.stop()
  }
}
