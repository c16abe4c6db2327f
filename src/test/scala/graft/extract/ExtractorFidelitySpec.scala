package graft.extract

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.analyze.Indexer
import graft.model.RelType

/** Round-3 verdict item 8 — measure the heuristic-extractor delta on REAL
  * code, not fixtures: index the engine's own Scala sources (the largest
  * real codebase on this box, ~13 kLoC across 65+ files) twice —
  *
  *   (a) heuristically, via the shipping ScalaExtractor;
  *   (b) via `Indexer.fromParsed` fed by the Scala compiler's own parser
  *       ([[ScalacGroundTruth]]) — a REAL parse, the path a tree-sitter
  *       fleet would take;
  *
  * and report definition / call-edge recall+precision of (a) against (b).
  * The assertions are conservative floors so the suite stays stable as the
  * codebase grows; the measured values are printed (FIDELITY line) and
  * recorded in COVERAGE.md §E2.
  */
class ExtractorFidelitySpec extends SparkSpec {

  test("heuristic-vs-scalac fidelity on the engine's own sources") {
    val corpus = Paths.get("src")
    assume(Files.isDirectory(corpus), "run from the repo root")
    import spark.implicits._

    // (a) heuristic path — exactly what `index` ships
    val heuristic = Indexer.indexDirectory(spark, corpus.toString, "scalac-truth")

    // (b) real-parser path — scalac trees lowered to the fromParsed contract
    val (metas, defs, imps, refs) = ScalacGroundTruth.parseDir(corpus)
    val truth = Indexer.fromParsed(spark,
      metas.toDF(), defs.toDF(), imps.toDF(), refs.toDF())

    val nFiles = truth.files.count()
    assert(nFiles > 50, s"corpus unexpectedly small: $nFiles files")

    // ---- definition recall/precision on container-chain FQNs ------------
    val hDefs = heuristic.definitions
      .where(col("primary_file_path").endsWith(".scala"))
      .select("fqn").as[String].collect().toSet
    val tDefs = truth.definitions.select("fqn").as[String].collect().toSet
    val defRecall = (hDefs & tDefs).size.toDouble / tDefs.size
    val defPrecision = (hDefs & tDefs).size.toDouble / hDefs.size

    // ---- call-edge recall/precision on (caller fqn, callee fqn) pairs ----
    // DEF_TO_DEF only: id spaces overlap per node type (SURVEY §1.2), so
    // joining DEF_TO_IMP edges against definitions by raw id would pair
    // callers with arbitrary same-id definitions — the round-4 measurement
    // did exactly that, and the resulting symmetric garbage (a bogus miss
    // plus a bogus extra per divergent tie) understated fidelity as
    // 88.8/92.5 when the true call-pair parity was near-perfect
    def callPairs(store: graft.store.GraphStore): Set[(String, String)] = {
      val d = store.definitions.select(col("id"), col("fqn"))
      store.edges.where(col("type").isin(RelType.callTypes: _*) &&
          col("kind") === graft.model.EdgeKind.DefToDef)
        .join(d.select(col("id").as("sid"), col("fqn").as("src")),
          col("source_id") === col("sid"))
        .join(d.select(col("id").as("tid"), col("fqn").as("dst")),
          col("target_id") === col("tid"))
        .select("src", "dst").distinct()
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    }
    val hCalls = callPairs(heuristic)
    val tCalls = callPairs(truth)
    val callRecall =
      if (tCalls.isEmpty) 1.0 else (hCalls & tCalls).size.toDouble / tCalls.size
    val callPrecision =
      if (hCalls.isEmpty) 1.0 else (hCalls & tCalls).size.toDouble / hCalls.size

    info(f"corpus: $nFiles files, truth defs=${tDefs.size}, heuristic defs=${hDefs.size}")
    info(f"definition recall=${defRecall * 100}%.1f%% precision=${defPrecision * 100}%.1f%%")
    info(f"truth call edges=${tCalls.size}, heuristic=${hCalls.size}")
    info(f"call-edge recall=${callRecall * 100}%.1f%% precision=${callPrecision * 100}%.1f%%")
    println(f"FIDELITY files=$nFiles defRecall=${defRecall * 100}%.1f defPrecision=${defPrecision * 100}%.1f " +
      f"callRecall=${callRecall * 100}%.1f callPrecision=${callPrecision * 100}%.1f " +
      f"truthDefs=${tDefs.size} heurDefs=${hDefs.size} truthCalls=${tCalls.size} heurCalls=${hCalls.size}")

    // missing-definition census by kind: WHAT the heuristic misses matters
    // as much as how much
    val missing = truth.definitions
      .join(heuristic.definitions.select(col("fqn").as("hfqn")),
        col("fqn") === col("hfqn"), "left_anti")
      .groupBy("definition_type").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
    info(s"missing by kind: $missing")
    println(s"FIDELITY_MISSING $missing")

    // conservative floors: the measurement must not silently degrade
    // (round-5 measured: defs 99.8/100.0, calls 100.0/100.0 after fixing
    // the DEF_TO_IMP id-space join above and closing the real extractor
    // gaps it had been masking: interpolation-hole calls, bare `new X`,
    // and calls on pending-header continuation lines — floors sit a band
    // below so ordinary codebase growth doesn't flake the suite)
    assert(defRecall > 0.95, f"definition recall collapsed: $defRecall%.3f")
    assert(defPrecision > 0.95, f"definition precision collapsed: $defPrecision%.3f")
    assert(callRecall > 0.93, f"call-edge recall collapsed: $callRecall%.3f")
    assert(callPrecision > 0.93, f"call-edge precision collapsed: $callPrecision%.3f")
  }
}
