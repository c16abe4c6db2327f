package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class PythonExtractorSpec extends AnyFunSuite {

  private def file(content: String, path: String = "m.py") =
    SourceFile(path, "/" + path, "r", path.split("/").last, "py", "python", content)

  test("classes, methods, functions, nesting fqns") {
    val e = PythonExtractor.extract(file(
      """class Base:
        |    def save(self):
        |        pass
        |
        |class User(Base):
        |    def __init__(self):
        |        self.name = build_name()
        |    def greet(self):
        |        return helper(self.name)
        |
        |def helper(x):
        |    return x
        |""".stripMargin))
    val byFqn = e.definitions.map(d => d.fqn -> d).toMap
    assert(byFqn.keySet == Set("Base", "Base.save", "User", "User.__init__",
      "User.greet", "helper"))
    assert(byFqn("Base").definitionType == "Class")
    assert(byFqn("Base.save").definitionType == "Method")
    assert(byFqn("helper").definitionType == "Function")
    assert(byFqn("Base").startLine == 0)
    assert(byFqn("Base").endLine >= 2)
    // references: build_name and helper calls
    assert(e.references.map(_.name).toSet == Set("build_name", "helper"))
  }

  test("imports: plain, aliased, from, relative, wildcard") {
    val e = PythonExtractor.extract(file(
      """import os
        |import a.b as ab, c
        |from x.y import f as g, h
        |from . import sibling
        |from ..pkg import thing
        |from z import *
        |""".stripMargin))
    val imps = e.imports.map(i => (i.importType, i.importPath, i.name, Option(i.alias)))
    assert(imps.contains(("import", "os", "os", None)))
    assert(imps.contains(("import", "a.b", "b", Some("ab"))))
    assert(imps.contains(("import", "c", "c", None)))
    assert(imps.contains(("from_import", "x.y", "f", Some("g"))))
    assert(imps.contains(("from_import", "x.y", "h", None)))
    assert(imps.contains(("from_import", ".", "sibling", None)))
    assert(imps.contains(("from_import", "..pkg", "thing", None)))
    assert(imps.contains(("wildcard_import", "z", "*", None)))
    assert(e.imports.size == 8)
  }

  test("lambda definitions and dedent scoping") {
    val e = PythonExtractor.extract(file(
      """square = lambda x: x * x
        |class A:
        |    def f(self):
        |        pass
        |def top():
        |    pass
        |""".stripMargin))
    val fqns = e.definitions.map(_.fqn).toSet
    assert(fqns == Set("square", "A", "A.f", "top"))
    assert(e.definitions.find(_.fqn == "square").get.definitionType == "Lambda")
    assert(e.definitions.find(_.fqn == "top").get.definitionType == "Function")
  }
}

class OtherExtractorsSpec extends AnyFunSuite {
  test("typescript: classes, functions, imports") {
    val f = SourceFile("a.ts", "/a.ts", "r", "a.ts", "ts", "typescript",
      """import { readFile as rf, join } from 'fs';
        |import * as path from 'path';
        |import './side';
        |export class Svc {
        |  run(x: number): number {
        |    return helper(x);
        |  }
        |}
        |export function helper(x: number) { return x + 1; }
        |const fmt = (s: string) => s.trim();
        |""".stripMargin)
    val e = TypeScriptExtractor.extract(f)
    val fqns = e.definitions.map(d => d.fqn -> d.definitionType).toMap
    assert(fqns.contains("Svc"))
    assert(fqns("Svc") == "Class")
    assert(fqns.contains("Svc.run"))
    assert(fqns.contains("helper"))
    assert(fqns.contains("fmt"))
    assert(e.imports.map(_.importType).toSet ==
      Set("named_import", "namespace_import", "side_effect_import"))
    assert(e.references.exists(_.name == "helper"))
  }

  test("ruby: modules, classes, methods, requires") {
    val f = SourceFile("b.rb", "/b.rb", "r", "b.rb", "rb", "ruby",
      """require 'json'
        |require_relative 'util/helper'
        |module App
        |  class User
        |    def greet(name)
        |      format_name(name)
        |    end
        |  end
        |end
        |""".stripMargin)
    val e = RubyExtractor.extract(f)
    val fqns = e.definitions.map(_.fqn).toSet
    assert(fqns == Set("App", "App.User", "App.User.greet"))
    assert(e.imports.size == 2)
    assert(e.references.exists(_.name == "format_name"))
  }
}
