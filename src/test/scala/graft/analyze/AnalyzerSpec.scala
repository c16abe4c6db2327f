package graft.analyze

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class AnalyzerSpec extends SparkSpec {

  test("deriveDirectories emits every ancestor exactly once") {
    import spark.implicits._
    val files = Seq("a/b/c.py", "a/b/d.py", "a/e.py", "root.py", "x/y/z/w.rb")
      .toDF("path")
    val dirs = Analyzer.deriveDirectories(files).collect()
      .map(r => (r.getAs[String]("path"), Option(r.getAs[String]("parent_path")),
        r.getAs[String]("name"), r.getAs[Long]("depth"))).toSet
    assert(dirs == Set(
      ("a", None, "a", 1L), ("a/b", Some("a"), "b", 2L),
      ("x", None, "x", 1L), ("x/y", Some("x"), "y", 2L),
      ("x/y/z", Some("x/y"), "z", 3L)))
  }

  test("property: derived dirs = all proper path prefixes") {
    import spark.implicits._
    val seg = Gen.oneOf("a", "b", "c", "dd", "e1")
    val pathGen = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, seg).map(_.mkString("/") + ".py"))
    val listGen = Gen.listOfN(8, pathGen)
    (0 until 20).foreach { i =>
      val paths = listGen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val expected = paths.flatMap { p =>
        val segs = p.split("/").dropRight(1)
        (1 to segs.length).map(j => segs.take(j).mkString("/"))
      }.toSet
      val got = Analyzer.deriveDirectories(paths.toDF("path"))
        .select("path").collect().map(_.getString(0)).toSet
      assert(got == expected, s"seed ${42 + i}, paths $paths")
    }
  }

  test("assignIds is dense and deterministic across runs") {
    import spark.implicits._
    val df = Seq("c", "a", "b", "d").toDF("k")
    val ids1 = Analyzer.assignIds(df, Seq("k")).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("id")).toMap
    val ids2 = Analyzer.assignIds(df.repartition(3), Seq("k")).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("id")).toMap
    assert(ids1 == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    assert(ids1 == ids2)
  }

  test("linkNestedDefinitions emits typed nesting edges") {
    import spark.implicits._
    val defs = Seq(
      (0L, "A", "Class", "f.py"),
      (1L, "A.run", "Method", "f.py"),
      (2L, "helper", "Function", "f.py"),
      (3L, "A.run.inner", "Function", "f.py")
    ).toDF("id", "fqn", "definition_type", "primary_file_path")
    val links = Analyzer.linkNestedDefinitions(defs)
      .select("parent_fqn", "child_fqn", "rel_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(links == Set(
      ("A", "A.run", "CLASS_TO_METHOD"),
      ("A.run", "A.run.inner", "METHOD_TO_FUNCTION")))
  }
}
