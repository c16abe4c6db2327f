package graft.extract

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Dataset, SparkSession}

/** S1/S2 — repository file scan + text read.
  *
  * The reference enumerates repo files honoring .gitignore with a 5 MB size
  * cutoff and binary skip (indexer/src/indexer.rs:58-72,266-321). Local
  * driver-side walk here; on a cluster the same Dataset comes from
  * `spark.read.format("binaryFile")` over a distributed FS — the downstream
  * pipeline is identical either way.
  */
object FileScanner {

  val MaxFileBytes: Long = 5L * 1000 * 1000 // reference: indexer.rs:64-72

  private val ignoredDirs = Set(".git", ".hg", ".svn", "node_modules",
    "__pycache__", "target", ".idea")

  def scan(spark: SparkSession, rootDir: String,
           repositoryName: String): Dataset[SourceFile] = {
    import spark.implicits._
    val root = Paths.get(rootDir).toAbsolutePath.normalize
    val files = walkDir(root, root, Vector.empty, repositoryName).toSeq
    // distribute: extraction parallelism is per-file
    spark.createDataset(files).repartition(spark.sparkContext.defaultParallelism)
  }

  /** Recursive walk honoring nested .gitignore files ([[GitIgnore]]
    * semantics: per-directory scope, negation, anchoring, last-match-wins).
    * Ignored directories are not descended into — which is also how git's
    * "cannot re-include inside an excluded directory" rule falls out.
    *
    * Directory symlinks are not followed (NOFOLLOW type checks): a link
    * pointing at an ancestor would otherwise recurse unboundedly, and git
    * itself treats symlinks as entries, not trees. Each directory's listing
    * is materialized and the stream closed before recursing, so the walk
    * holds one open descriptor at a time instead of one per tree level.
    */
  private def walkDir(root: Path, dir: Path,
                      inherited: Vector[(String, Seq[GitIgnore.Rule])],
                      repo: String): Iterator[SourceFile] = {
    val gi = dir.resolve(".gitignore")
    val scopes =
      if (Files.isRegularFile(gi))
        inherited :+ (relOf(root, dir) ->
          GitIgnore.parse(Files.readAllLines(gi).asScala.toSeq))
      else inherited
    val entries = {
      val s = Files.list(dir)
      try s.iterator().asScala.toVector finally s.close()
    }
    val nofollow = java.nio.file.LinkOption.NOFOLLOW_LINKS
    entries.iterator.flatMap { p =>
      val name = p.getFileName.toString
      val isDir = Files.isDirectory(p, nofollow)
      if (isDir && ignoredDirs(name)) Iterator.empty
      else if (GitIgnore.ignored(relOf(root, p), isDir, scopes)) Iterator.empty
      else if (isDir) walkDir(root, p, scopes, repo)
      else if (Files.isRegularFile(p, nofollow)) readOne(root, p, repo).iterator
      else Iterator.empty
    }
  }

  private def relOf(root: Path, p: Path): String =
    root.relativize(p).toString.replace('\\', '/')

  /** Light listing for the filesystem watcher: (relative path, size, mtime)
    * of every candidate file under `rootDir`, honoring the same nested
    * .gitignore + ignored-dir semantics as [[scan]] but reading no content.
    */
  def listPaths(rootDir: String): Seq[(String, Long, Long)] = {
    val root = Paths.get(rootDir).toAbsolutePath.normalize
    def walk(dir: Path,
             inherited: Vector[(String, Seq[GitIgnore.Rule])]): Iterator[(String, Long, Long)] = {
      val gi = dir.resolve(".gitignore")
      val scopes =
        if (Files.isRegularFile(gi))
          inherited :+ (relOf(root, dir) ->
            GitIgnore.parse(Files.readAllLines(gi).asScala.toSeq))
        else inherited
      val entries = {
        val s = Files.list(dir)
        try s.iterator().asScala.toVector finally s.close()
      }
      val nofollow = java.nio.file.LinkOption.NOFOLLOW_LINKS
      entries.iterator.flatMap { p =>
        val name = p.getFileName.toString
        val isDir = Files.isDirectory(p, nofollow)
        if (isDir && ignoredDirs(name)) Iterator.empty
        else if (GitIgnore.ignored(relOf(root, p), isDir, scopes)) Iterator.empty
        else if (isDir) walk(p, scopes)
        else if (Files.isRegularFile(p, nofollow))
          Iterator.single((relOf(root, p), Files.size(p),
            Files.getLastModifiedTime(p).toMillis))
        else Iterator.empty
      }
    }
    if (!Files.isDirectory(root)) Nil else walk(root, Vector.empty).toSeq
  }

  private def readOne(root: Path, p: Path, repo: String): Option[SourceFile] = {
    val size = Files.size(p)
    if (size > MaxFileBytes) return None // oversized → Skipped record
    val bytes = Files.readAllBytes(p)
    if (bytes.contains(0.toByte)) return None // binary → Skipped record
    val rel = root.relativize(p).toString.replace('\\', '/')
    val name = p.getFileName.toString
    val ext = name.lastIndexOf('.') match {
      case -1 => ""
      case i => name.substring(i + 1)
    }
    Some(SourceFile(
      path = rel,
      absolutePath = p.toString,
      repositoryName = repo,
      name = name,
      extension = ext,
      language = LanguageDetect(ext),
      content = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
  }
}
