package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 regression coverage for two ADVICE findings:
  * multi-line declaration headers whose continuation line carries a
  * language-specific clause keyword (`where` / `implements` / `throws`),
  * and commented-out TypeScript imports fabricating import rows.
  */
class HeaderContinuationSpec extends AnyFunSuite {

  private def src(lang: String, ext: String, content: String) =
    SourceFile(s"t.$ext", s"/t.$ext", "t", s"t.$ext", ext, lang, content)

  test("rust: where clause between generic header and its brace keeps the scope") {
    val e = RustExtractor.extract(src("rust", "rs",
      """pub struct Pair<T>
        |where
        |    T: Clone,
        |{
        |    left: T,
        |    right: T,
        |}
        |
        |impl<T> Pair<T>
        |where
        |    T: Clone + Send,
        |{
        |    pub fn swap(&mut self) { }
        |}
        |""".stripMargin))
    val fqns = e.definitions.map(d => d.fqn -> d.definitionType).toMap
    // without the continuation the scope closes body-less and the members
    // land at module level (Pair absent from their FQNs)
    assert(fqns("Pair") === "Class")
    assert(fqns("Pair.left") === "Field")
    assert(fqns("Pair.right") === "Field")
    assert(fqns("Pair.swap") === "Method")
    assert(!fqns.contains("left") && !fqns.contains("swap"))
  }

  test("rust: single-line where clause (`where T: Clone {`) also continues") {
    val e = RustExtractor.extract(src("rust", "rs",
      """fn largest<T>(list: &[T]) -> T
        |where T: PartialOrd + Copy {
        |    list[0]
        |}
        |pub fn after() { }
        |""".stripMargin))
    val fqns = e.definitions.map(_.fqn)
    assert(fqns.contains("largest") && fqns.contains("after"))
  }

  test("java: implements/throws continuation lines keep the pending header") {
    val e = JavaExtractor.extract(src("java", "java",
      """package com.example;
        |public class Widget extends Base
        |    implements Runnable, Cloneable {
        |    public void run() { }
        |    public void risky()
        |        throws Exception {
        |        run();
        |    }
        |}
        |""".stripMargin))
    val fqns = e.definitions.map(d => d.fqn -> d.definitionType).toMap
    assert(fqns("com.example.Widget") === "Class")
    assert(fqns("com.example.Widget.run") === "Method")
    assert(fqns("com.example.Widget.risky") === "Method")
    // the implements clause still lands in the assembled header: supertype
    // facts carry both the extends and implements names
    val sups = e.typeFacts.filter(_.factKind == "extends").map(_.detail).toSet
    assert(sups === Set("Base", "Runnable", "Cloneable"))
  }

  test("kotlin: generic constraint `where` before the brace keeps the scope") {
    val e = KotlinExtractor.extract(src("kotlin", "kt",
      """package app
        |class Repo<T>(private val items: List<T>)
        |    where T : Comparable<T> {
        |    fun best(): T = items.max()
        |}
        |""".stripMargin))
    val fqns = e.definitions.map(d => d.fqn -> d.definitionType).toMap
    assert(fqns("app.Repo") === "Class")
    assert(fqns("app.Repo.best") === "Method")
  }

  test("csharp: generic constraint `where` before the brace keeps the scope") {
    val e = CSharpExtractor.extract(src("csharp", "cs",
      """namespace App {
        |    public class Cache<T>
        |        where T : IComparable<T>
        |    {
        |        public int Get(int k) { return k; }
        |    }
        |}
        |""".stripMargin))
    val fqns = e.definitions.map(d => d.fqn -> d.definitionType).toMap
    assert(fqns("App.Cache") === "Class")
    assert(fqns("App.Cache.Get") === "Method")
  }

  test("typescript: commented-out imports/requires fabricate no rows") {
    val e = TypeScriptExtractor.extract(src("typescript", "ts",
      """// import {x} from 'dead-module'
        |/* const a = require('also-dead') */
        |// import 'side-effect-dead'
        |import {real as r, other} from './live';
        |import * as ns from 'liblive';
        |const fs = require('fs');
        |export function go(): void { r(); }
        |""".stripMargin))
    val paths = e.imports.map(_.importPath)
    assert(!paths.exists(_.contains("dead")), s"fabricated import in $paths")
    // the live ones survive with their module paths intact (recovered from
    // the raw line's span after matching on the blanked line)
    assert(paths.count(_ == "./live") === 2) // two named bindings
    assert(paths.contains("liblive") && paths.contains("fs"))
    assert(e.imports.find(_.importPath == "liblive")
      .exists(_.importType == "namespace_import"))
  }

  test("ruby: commented-out require fabricates no rows; live path survives") {
    val e = RubyExtractor.extract(src("ruby", "rb",
      """# require 'dead'
        |require 'json'
        |require_relative 'lib/helper'
        |""".stripMargin))
    val paths = e.imports.map(_.importPath)
    assert(paths === Seq("json", "lib/helper"))
    assert(e.imports.map(_.name) === Seq("json", "helper"))
  }
}
