package graft.extract

import java.nio.file.{Files, Path}

/** Deterministic synthetic Python tree generator (seeded counter content,
  * no RNG) — used by the indexing benchmark and the pipeline gate query.
  */
object SyntheticTree {
  def generate(root: Path, nFiles: Int): Unit = {
    (0 until nFiles).foreach { i =>
      val pkg = s"pkg${i % 50}"
      Files.createDirectories(root.resolve(pkg))
      val content = new StringBuilder()
      content.append(s"from pkg${(i + 1) % 50}.mod${(i + 1) % nFiles} import helper_${(i + 1) % nFiles}\n")
      content.append(s"import pkg${(i + 2) % 50}.mod${(i * 3) % nFiles}\n\n")
      (0 until 3).foreach { c =>
        content.append(s"class C${i}_$c:\n")
        (0 until 4).foreach { m =>
          content.append(s"    def m${c}_$m(self):\n")
          content.append(s"        return helper_$i(self, $m)\n")
        }
        content.append("\n")
      }
      content.append(s"def helper_$i(x, y):\n    return x\n")
      Files.writeString(root.resolve(s"$pkg/mod$i.py"), content.toString)
    }
  }
}
