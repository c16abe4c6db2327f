package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{EdgeKind, RelType}

/** Relationship-derivation operators of the indexing dataflow (SURVEY §2.3
  * A2, A3, A5, A9). All pure DataFrame transforms: they shuffle only on
  * their group/join keys and never collect to the driver.
  */
object Analyzer {

  /** A2 — directory hierarchy derivation (reference: analysis/mod.rs:201-236).
    * From file paths like `a/b/c.py`, emit every ancestor directory with its
    * parent and depth, deduped. The reference builds HashSets per file; here
    * it is posexplode over path prefixes + distinct — one shuffle.
    *
    * Input: DataFrame with a `path` column. Output:
    * (path, parent_path nullable, name, depth) one row per distinct dir.
    */
  def deriveDirectories(files: DataFrame, pathCol: String = "path"): DataFrame = {
    val parts = files.select(split(col(pathCol), "/").as("parts"))
      .where(size(col("parts")) > 1)
    parts
      .select(posexplode(expr("slice(parts, 1, size(parts) - 1)"))
        .as(Seq("pos", "name")), col("parts"))
      .select(
        array_join(slice(col("parts"), lit(1), col("pos") + 1), "/").as("path"),
        when(col("pos") > 0,
          array_join(slice(col("parts"), lit(1), col("pos")), "/")).as("parent_path"),
        col("name"),
        (col("pos") + 1).as("depth"))
      .distinct()
  }

  /** A2 (edge half) — DIR_CONTAINS_DIR + DIR_CONTAINS_FILE edges from the
    * derived hierarchy, by joining on id-resolved paths.
    * `dirIds`: (path, id); `fileIds`: (path, id).
    */
  def directoryEdges(dirs: DataFrame, dirIds: DataFrame, fileIds: DataFrame): DataFrame = {
    val d = dirIds.select(col("path").as("dpath"), col("id").as("dir_id"))
    val dirDir = dirs.where(col("parent_path").isNotNull)
      .join(d, col("parent_path") === col("dpath"))
      .join(dirIds.select(col("path").as("cpath"), col("id").as("child_id")),
        col("path") === col("cpath"))
      .select(lit(EdgeKind.DirToDir).as("kind"),
        lit(RelType.DirContainsDir).as("type"),
        col("dir_id").as("source_id"), col("child_id").as("target_id"))
    val leafDirOfFile = fileIds
      .withColumn("dir_path", regexp_replace(col("path"), "/[^/]*$", ""))
      .where(col("dir_path") =!= col("path"))
    val dirFile = leafDirOfFile
      .join(d, col("dir_path") === col("dpath"))
      .select(lit(EdgeKind.DirToFile).as("kind"),
        lit(RelType.DirContainsFile).as("type"),
        col("dir_id").as("source_id"), col("id").as("target_id"))
    dirDir.unionByName(dirFile)
  }

  /** A3 — definition dedup by (fqn, file_path)
    * (reference: analysis/mod.rs:96, map keyed by (fqn, file_path)).
    * Deterministic: keeps the minimum (start_byte-ordered) location as
    * primary and counts merged duplicates — dropDuplicates would keep an
    * arbitrary row and violate the oracle-replayability contract.
    * Expects raw-extraction column names (filePath, startByte, ...).
    */
  def dedupDefinitions(rawDefs: DataFrame): DataFrame =
    rawDefs
      .groupBy(col("fqn"), col("filePath"))
      .agg(min(struct(col("startByte"), col("endByte"), col("startLine"),
        col("endLine"), col("startCol"), col("endCol"), col("name"),
        col("definitionType"))).as("p"),
        count(lit(1)).cast("int").as("total_locations"))
      .select(col("fqn"), col("filePath").as("primary_file_path"),
        col("p.name").as("name"), col("p.definitionType").as("definition_type"),
        col("p.startByte").as("primary_start_byte"),
        col("p.endByte").as("primary_end_byte"),
        col("p.startLine").as("start_line"), col("p.endLine").as("end_line"),
        col("p.startCol").as("start_col"), col("p.endCol").as("end_col"),
        col("total_locations"))

  /** A5 — parent-child definition linking via FQN equi-join (reference:
    * analysis/mod.rs:510-556): child's parent FQN (everything before the last
    * '.') joined against definitions, emitting the typed nesting edge for the
    * (parentType, childType) pair (relationship.rs:19-98).
    *
    * Input defs need (id, fqn, definition_type, primary_file_path).
    * Output: (parent_id, child_id, parent_fqn, child_fqn, rel_type).
    */
  def linkNestedDefinitions(defs: DataFrame): DataFrame = {
    val children = defs
      .where(col("fqn").contains("."))
      .select(col("id").as("child_id"), col("fqn").as("child_fqn"),
        col("definition_type").as("child_type"),
        regexp_replace(col("fqn"), "\\.[^.]*$", "").as("parent_fqn"))
    val parents = defs.select(col("id").as("parent_id"),
      col("fqn").as("p_fqn"), col("definition_type").as("parent_type"))
    children.join(parents, col("parent_fqn") === col("p_fqn"))
      .select(col("parent_id"), col("child_id"), col("parent_fqn"),
        col("child_fqn"),
        concat(upper(col("parent_type")), lit("_TO_"),
          upper(col("child_type"))).as("rel_type"))
  }

  /** A9 — dense deterministic id assignment (reference: mutation/utils.rs:
    * 23-163 assigns dense u32 counters at write time). zipWithIndex over a
    * canonical sort is stable across runs — unlike
    * monotonically_increasing_id, which is partition-dependent (SURVEY §4.2).
    *
    * Returns the input with an `id` column (0-based dense Long), ordered by
    * `sortCols`. Scale note: zipWithIndex is a two-pass job (count per
    * partition, then assign); acceptable because it only runs at store-build
    * time, never in the query path.
    */
  def assignIds(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(idx +: row.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}
