package graft.analyze

import org.apache.spark.sql.functions._
import graft.store.GraphStore

/** S6 — per-run stats sink, mirroring the reference's `--stats` JSON
  * (indexer/src/stats.rs:11-100; CLI flag gkg/src/cli.rs:46-48): totals per
  * table, per-language file + definition counts, per-stage durations.
  * All counts are one aggregation pass each; JSON assembled driver-side
  * from the (tiny) aggregate rows.
  */
object IndexStats {

  def json(store: GraphStore, stageDurationsSec: Map[String, Double]): String = {
    val totals = Map(
      "total_files" -> store.files.count(),
      "total_directories" -> store.directories.count(),
      "total_definitions" -> store.definitions.count(),
      "total_imported_symbols" -> store.importedSymbols.count(),
      "total_relationships" -> store.edges.count())
    val filesPerLang = store.files.groupBy("language")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // one pass serves both per-language totals and the per-language
    // definition_types breakdown (stats.rs LanguageStats.definition_types)
    val defsByLangType = store.definitions.alias("d")
      .join(store.files.alias("f"),
        col("d.primary_file_path") === col("f.path"))
      .groupBy(col("f.language"), col("d.definition_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val defsPerLang = defsByLangType.groupBy(_._1)
      .map { case (l, rows) => l -> rows.map(_._3).sum }
    val defTypesPerLang = defsByLangType.groupBy(_._1)
      .map { case (l, rows) =>
        l -> rows.map { case (_, t, n) => (t, n) }.toMap }

    def obj(m: Map[String, String]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ", ", "}")
    def longs(m: Map[String, Long]) = obj(m.map { case (k, v) => k -> v.toString })
    obj(Map(
      "totals" -> longs(totals),
      "files_per_language" -> longs(filesPerLang),
      "definitions_per_language" -> longs(defsPerLang),
      "definition_types_per_language" -> obj(defTypesPerLang.map {
        case (l, m) => l -> longs(m) }),
      "stage_durations_sec" -> obj(stageDurationsSec.map {
        case (k, v) => k -> f"$v%.3f" })))
  }

  def write(path: String, store: GraphStore,
            stageDurationsSec: Map[String, Double]): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      json(store, stageDurationsSec))
}
