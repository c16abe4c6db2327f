package graft.extract

import java.nio.file.{Files, Path}
import scala.sys.process._

/** Real-parser ground truth for the JavaScript side of the TypeScript/JS
  * extractor-fidelity measurement: acorn 8 — the ECMAScript parser Node
  * itself ships for its REPL (`internal/deps/acorn`, exposed with
  * `--expose-internals`) — lowered to the heuristic's conventions, exactly
  * like [[ScalacGroundTruth]] / [[JavacGroundTruth]] / [[PyAstGroundTruth]]
  * / [[RustcGroundTruth]]:
  *
  *  - FQNs are chains of enclosing CLASS names only (the heuristic's
  *    classStack) — functions do not nest FQNs;
  *  - `class X` (declaration or named expression) → Class; class-body
  *    `MethodDefinition` (incl. get/set/static/constructor — the reference
  *    TS census counts constructors) → Method; class-field
  *    `name = (…) => …` → Method (tree-sitter sees these; a miss is an
  *    honest heuristic gap); `function f` / named function expression /
  *    `const f = (…) =>` → Function (Method when inside a class chain);
  *  - call refs are CallExpression/NewExpression callee names for the
  *    `name(…)` / `recv.prop(…)` shapes (non-computed member property),
  *    the same two families the heuristic's callRe emits.
  *
  * Test scope only; shells out to node once for the whole corpus. Each file
  * is parsed as ESM first, then as CJS script (`allowReturnOutsideFunction`
  * — npm's CommonJS sources use top-level return).
  */
object AcornGroundTruth {

  final case class TruthDef(file: String, fqn: String, kind: String)
  final case class TruthCall(file: String, name: String)

  private val script = """
'use strict';
const fs = require('fs');
const path = require('path');
const acorn = require('internal/deps/acorn/acorn/dist/acorn');

const root = process.argv[2];
const rels = fs.readFileSync(0, 'utf8').split('\n').filter(Boolean);
const out = [];

function lower(rel, ast) {
  function emitDef(chain, name, kind) {
    out.push('D\t' + rel + '\t' + chain.concat([name]).join('.') + '\t' + kind);
  }
  function calleeName(callee) {
    if (!callee) return null;
    if (callee.type === 'Identifier') return callee.name;
    if (callee.type === 'MemberExpression' && !callee.computed &&
        callee.property && callee.property.type === 'Identifier')
      return callee.property.name;
    return null;
  }
  function walk(node, chain, inClassBody) {
    if (!node || typeof node.type !== 'string') return;
    switch (node.type) {
      case 'ClassDeclaration':
      case 'ClassExpression': {
        let nextChain = chain;
        if (node.id && node.id.name) {
          emitDef(chain, node.id.name, 'Class');
          nextChain = chain.concat([node.id.name]);
        }
        if (node.superClass) walk(node.superClass, chain, false);
        if (node.body) walkChildren(node.body, nextChain, true);
        return;
      }
      case 'MethodDefinition':
      case 'PropertyDefinition': {
        if (inClassBody && node.key && !node.computed) {
          const name = node.key.type === 'Identifier' ? node.key.name
            : (node.key.type === 'Literal' && typeof node.key.value === 'string'
               ? node.key.value : null);
          if (node.type === 'MethodDefinition') {
            if (name) emitDef(chain, name, 'Method');
          } else if (name && node.value &&
                     node.value.type === 'ArrowFunctionExpression')
            emitDef(chain, name, 'Method');
        }
        walkChildren(node, chain, false);
        return;
      }
      case 'FunctionDeclaration':
      case 'FunctionExpression':
        if (node.id && node.id.name)
          emitDef(chain, node.id.name, chain.length ? 'Method' : 'Function');
        walkChildren(node, chain, false);
        return;
      case 'VariableDeclarator':
        if (node.id && node.id.type === 'Identifier' && node.init &&
            node.init.type === 'ArrowFunctionExpression')
          emitDef(chain, node.id.name, chain.length ? 'Method' : 'Function');
        walkChildren(node, chain, false);
        return;
      case 'CallExpression':
      case 'NewExpression': {
        const n = calleeName(node.callee);
        if (n) out.push('C\t' + rel + '\t' + n);
        walkChildren(node, chain, false);
        return;
      }
      default:
        walkChildren(node, chain,
          node.type === 'ClassBody' ? inClassBody : false);
    }
  }
  function walkChildren(node, chain, inClassBody) {
    for (const k of Object.keys(node)) {
      if (k === 'type' || k === 'loc' || k === 'range' ||
          k === 'start' || k === 'end') continue;
      const v = node[k];
      if (Array.isArray(v))
        v.forEach(ch => {
          if (ch && typeof ch.type === 'string') walk(ch, chain, inClassBody);
        });
      else if (v && typeof v.type === 'string') walk(v, chain, inClassBody);
    }
  }
  walk(ast, [], false);
}

for (const rel of rels) {
  let src;
  try { src = fs.readFileSync(path.join(root, rel), 'utf8'); }
  catch (e) { out.push('E\t' + rel); continue; }
  let ast = null;
  for (const opts of [
    { ecmaVersion: 'latest', sourceType: 'module' },
    { ecmaVersion: 'latest', sourceType: 'script',
      allowReturnOutsideFunction: true },
  ]) {
    try { ast = acorn.parse(src, opts); break; } catch (e) { /* next */ }
  }
  if (!ast) { out.push('E\t' + rel); continue; }
  lower(rel, ast);
}
process.stdout.write(out.join('\n'));
"""

  /** Parse `files` (relative to `root`) → (defs, distinct calls, bad files). */
  def parse(root: Path, files: Seq[Path])
      : (Seq[TruthDef], Set[TruthCall], Seq[String]) = {
    val scriptFile = Files.createTempFile("acorn", ".js")
    Files.writeString(scriptFile, script)
    val rels = files.map(p => root.relativize(p).toString.replace('\\', '/'))
    val in = new java.io.ByteArrayInputStream(
      rels.mkString("\n").getBytes("UTF-8"))
    val outBuf = new StringBuilder
    val code = (Seq("node", "--expose-internals", scriptFile.toString,
      root.toString) #< in)
      .!(ProcessLogger(l => { outBuf.append(l).append('\n'); () }, _ => ()))
    require(code == 0, s"node ground-truth run failed rc=$code")
    val lines = outBuf.toString.split("\n").filter(_.nonEmpty).toSeq
    val defs = lines.collect { case l if l.startsWith("D\t") =>
      val Array(_, f, fqn, k) = l.split("\t", 4); TruthDef(f, fqn, k) }
    val calls = lines.collect { case l if l.startsWith("C\t") =>
      val Array(_, f, n) = l.split("\t", 3); TruthCall(f, n) }.toSet
    val bad = lines.collect { case l if l.startsWith("E\t") => l.drop(2) }
    (defs, calls, bad)
  }

  /** True when Node with internal acorn is runnable on this box. */
  def available: Boolean =
    try {
      Seq("node", "--expose-internals", "-e",
        "require('internal/deps/acorn/acorn/dist/acorn')").! == 0
    } catch { case _: Throwable => false }
}
