package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{EdgeKind, RelType}

/** A7 — reference (call) resolution (reference: analysis/mod.rs:422-484 +
  * per-language resolvers, ~5.5 kLoC of scope logic; Python analyzer.rs:
  * 148-642).
  *
  * DataFrame shape of the reference's semantics:
  *  1. caller = innermost enclosing definition of the reference site
  *     (line-range containment + window rank — the "scope" lookup);
  *  2. candidates = same-file definitions with the referenced name ∪
  *     same-file imports named/aliased by it (the reference's lookup order);
  *  3. multiplicity > 1 ⇒ AMBIGUOUSLY_CALLS (count window);
  *     attribute receiver ⇒ PROPERTY_REFERENCE.
  * All equi-joins keyed by (file, name); the containment join is
  * file-partitioned so the range predicate only runs within a file's rows.
  */
object ReferenceResolver {

  /** `importedFiles`: optional (from_file, to_file) pairs from resolved
    * IMP_TO_FILE edges — when present, definitions in files imported by the
    * reference site's file become candidates too (the reference's
    * import-scoped cross-file lookup; python/analyzer.rs:148-642 resolves
    * through the imported module's symbols the same way).
    */
  def resolve(rawRefs: DataFrame, definitions: DataFrame,
              importedSymbols: DataFrame,
              importedFiles: Option[DataFrame] = None): DataFrame = {
    val refs = rawRefs.select(
      col("filePath").as("r_file"), col("name").as("r_name"),
      col("receiver").as("r_recv"), col("startByte").as("r_sb"),
      col("endByte").as("r_eb"), col("startLine").as("r_line"),
      col("startCol").as("r_sc"), col("endCol").as("r_ec"))

    // 1. innermost enclosing definition (caller)
    val defsForScope = definitions.select(col("id").as("caller_id"),
      col("primary_file_path").as("d_file"), col("start_line").as("d_sl"),
      col("end_line").as("d_el"), col("primary_start_byte").as("d_sb"))
    val inScope = refs.join(defsForScope,
      col("r_file") === col("d_file") &&
        col("r_line") >= col("d_sl") && col("r_line") <= col("d_el"))
    val innermost = Window
      .partitionBy(col("r_file"), col("r_sb"), col("r_eb"))
      .orderBy(col("d_sb").desc)
    val withCaller = inScope
      .withColumn("rk", row_number().over(innermost))
      .where(col("rk") === 1)
      .drop("rk", "d_file", "d_sl", "d_el", "d_sb")

    // 2. candidate targets: same-file defs by name (excluding the caller
    //    itself at the exact same site), then same-file imports by alias/name
    val sameFileCands = withCaller.join(
      definitions.select(col("id").as("t_def"), col("name").as("t_name"),
        col("primary_file_path").as("t_file")),
      col("r_file") === col("t_file") && col("r_name") === col("t_name"))
    // cross-file: defs by name in files this file imports (broadcast the
    // small (from_file, to_file) resolution table)
    val defCands = importedFiles match {
      case None => sameFileCands
      case Some(imf) =>
        val cross = withCaller
          .join(broadcast(imf.select(col("from_file"), col("to_file"))),
            col("r_file") === col("from_file"))
          .join(definitions.select(col("id").as("t_def"),
            col("name").as("t_name"),
            col("primary_file_path").as("t_file")),
            col("to_file") === col("t_file") && col("r_name") === col("t_name"))
          .drop("from_file", "to_file")
        sameFileCands.unionByName(cross)
          .dropDuplicates("r_file", "r_sb", "r_eb", "t_def")
    }
    val impCands = withCaller.join(
      importedSymbols.select(col("id").as("t_imp"),
        coalesce(col("alias"), col("name")).as("t_name"),
        col("file_path").as("t_file")),
      col("r_file") === col("t_file") && col("r_name") === col("t_name"))

    // 3. ambiguity = total candidate count over the reference site
    val site = Seq(col("r_file"), col("r_sb"), col("r_eb"))
    val defCounted = defCands.withColumn("n_cand",
      count(lit(1)).over(Window.partitionBy(site: _*)))
    val impOnly = impCands.join(
      defCands.select(col("r_file").as("df"), col("r_sb").as("ds"), col("r_eb").as("de")).distinct(),
      col("r_file") === col("df") && col("r_sb") === col("ds") && col("r_eb") === col("de"),
      "left_anti")
    val impCounted = impOnly.withColumn("n_cand",
      count(lit(1)).over(Window.partitionBy(site: _*)))

    def relType = when(col("r_recv") =!= "", RelType.PropertyReference)
      .when(col("n_cand") > 1, RelType.AmbiguouslyCalls)
      .otherwise(RelType.Calls)

    val defEdges = defCounted.select(
      lit(EdgeKind.DefToDef).as("kind"), relType.as("type"),
      col("caller_id").as("source_id"), col("t_def").as("target_id"),
      col("r_sb").as("source_start_byte"), col("r_eb").as("source_end_byte"),
      col("r_line").as("source_start_line"), col("r_line").as("source_end_line"),
      col("r_sc").as("source_start_col"), col("r_ec").as("source_end_col"))
    val impEdges = impCounted.select(
      lit(EdgeKind.DefToImp).as("kind"), relType.as("type"),
      col("caller_id").as("source_id"), col("t_imp").as("target_id"),
      col("r_sb").as("source_start_byte"), col("r_eb").as("source_end_byte"),
      col("r_line").as("source_start_line"), col("r_line").as("source_end_line"),
      col("r_sc").as("source_start_col"), col("r_ec").as("source_end_col"))

    defEdges.unionByName(impEdges).distinct()
  }
}
