package graft.extract

import java.nio.file.{Files, Path}
import graft.SparkSpec

/** Nested-.gitignore semantics: the same file set git (and the reference's
  * git-backed FileSource, indexer/src/project/source.rs) would produce —
  * anchoring, negation, dir-only rules, `**`, nested scope override,
  * last-match-wins.
  */
class GitIgnoreSpec extends SparkSpec {

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("FileScanner honors nested .gitignore files like git would") {
    val root = Files.createTempDirectory("graft-gitignore")
    write(root, ".gitignore",
      "*.log\nbuild/\n/top.txt\ntemp*\n!temp-keep.txt\n**/vendor/\n")
    write(root, "a/.gitignore", "!special.log\nsub/\n")
    write(root, "top.txt", "anchored: ignored at root only")
    write(root, "b/top.txt", "kept: /top.txt is anchored")
    write(root, "x.log", "ignored by *.log")
    write(root, "a/special.log", "kept: nested negation overrides outer *.log")
    write(root, "a/other.log", "ignored by outer *.log")
    write(root, "a/sub/file.txt", "ignored: nested dir-only rule")
    write(root, "build/gen.txt", "ignored: dir-only rule")
    write(root, "temp1.txt", "ignored by temp*")
    write(root, "temp-keep.txt", "kept: same-file negation after temp*")
    write(root, "c/vendor/v.txt", "ignored: **/vendor/ at any depth")
    write(root, "src/keep.py", "print('kept')")

    val scanned = FileScanner.scan(spark, root.toString, "gi-test")
      .collect().map(_.path).toSet
    assert(scanned === Set(
      ".gitignore", "a/.gitignore",
      "b/top.txt", "a/special.log", "temp-keep.txt", "src/keep.py"))
  }

  test("GitIgnore.ignored: rule mechanics") {
    val rules = GitIgnore.parse(Seq(
      "doc/*.pdf", "!doc/keep.pdf", "deep/**/x.txt", "cache?/"))
    val scopes = Seq("" -> rules)
    assert(GitIgnore.ignored("doc/a.pdf", isDir = false, scopes))
    assert(!GitIgnore.ignored("doc/keep.pdf", isDir = false, scopes))
    assert(!GitIgnore.ignored("other/doc/a.pdf", isDir = false, scopes)) // anchored
    assert(GitIgnore.ignored("deep/a/b/x.txt", isDir = false, scopes))
    assert(GitIgnore.ignored("deep/x.txt", isDir = false, scopes))
    assert(GitIgnore.ignored("cache1", isDir = true, scopes))
    assert(!GitIgnore.ignored("cache1", isDir = false, scopes)) // dir-only
  }

  test("GitIgnore character classes: ranges, negation, metacharacter safety") {
    val rules = GitIgnore.parse(Seq("tmp[0-9].log", "v[!0].txt", "a[[]b.txt"))
    val scopes = Seq("" -> rules)
    assert(GitIgnore.ignored("tmp3.log", isDir = false, scopes))
    assert(!GitIgnore.ignored("tmpx.log", isDir = false, scopes))
    // [!0] negates: matches any char EXCEPT '0' (and not a literal '!')
    assert(GitIgnore.ignored("v1.txt", isDir = false, scopes))
    assert(!GitIgnore.ignored("v0.txt", isDir = false, scopes))
    assert(GitIgnore.ignored("v!.txt", isDir = false, scopes))
    // regex metacharacter inside the class stays a literal glob char
    assert(GitIgnore.ignored("a[b.txt", isDir = false, scopes))
  }
}
