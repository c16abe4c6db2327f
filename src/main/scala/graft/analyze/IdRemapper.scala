package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.QueryLibrary
import graft.store.GraphStore

/** A9's relationship half — the reference's GraphMapper
  * (mutation/utils.rs:165-260: assign_node_ids / assign_relationship_ids):
  * rebuild a store from parts whose integer id spaces are unrelated, by
  * going through natural keys.
  *
  * Natural keys (reference: mutation/utils.rs:67-129):
  *   directory/file → path; definition → (file, start_byte, fqn);
  *   imported symbol → (file, start_byte, name).
  *
  * Used by incremental reindexing: the surviving store and the
  * freshly-analyzed store each carry internally-consistent dense ids, but
  * the two spaces collide — merging by id would conflate nodes. `rebuild`
  * unions the node tables on natural keys, assigns one new dense id space,
  * and remaps every edge endpoint through its natural key. All equi-joins;
  * nothing driver-side.
  */
object IdRemapper {

  private def nk(kind: String, cols: org.apache.spark.sql.Column*) =
    concat_ws("", (lit(kind) +: cols): _*)

  /** (nkind, id, nk) rows for every node of a store. */
  private def keyTable(s: GraphStore): DataFrame =
    s.directories.select(lit("directory").as("nkind"), col("id"),
        nk("D", col("path")).as("nk"))
      .unionByName(s.files.select(lit("file").as("nkind"), col("id"),
        nk("F", col("path")).as("nk")))
      .unionByName(s.definitions.select(lit("definition").as("nkind"), col("id"),
        nk("T", col("primary_file_path"), col("primary_start_byte"), col("fqn")).as("nk")))
      .unionByName(s.importedSymbols.select(lit("imported_symbol").as("nkind"), col("id"),
        nk("I", col("file_path"), col("start_byte"), col("name")).as("nk")))

  /** Edges with endpoint ids replaced by natural keys. */
  def edgesWithNaturalKeys(s: GraphStore): DataFrame = {
    val keys = keyTable(s)
    val srcK = keys.select(col("nkind").as("sk"), col("id").as("sid"),
      col("nk").as("src_nk"))
    val dstK = keys.select(col("nkind").as("dk"), col("id").as("did"),
      col("nk").as("dst_nk"))
    s.edges
      .withColumn("src_kind", QueryLibrary.kindFromSide(col("kind"), from = true))
      .withColumn("dst_kind", QueryLibrary.kindFromSide(col("kind"), from = false))
      .join(srcK, col("source_id") === col("sid") && col("src_kind") === col("sk"))
      .join(dstK, col("target_id") === col("did") && col("dst_kind") === col("dk"))
      .drop("source_id", "target_id", "sid", "did", "sk", "dk",
        "src_kind", "dst_kind")
  }

  /** Merge stores with unrelated id spaces into one store with a fresh
    * dense id space per table. Node rows with the same natural key are
    * deduped (first by table-specific key); edges dedupe on full identity.
    */
  def rebuild(stores: Seq[GraphStore]): GraphStore = {
    def unionAll(f: GraphStore => DataFrame) =
      stores.map(f).reduce(_.unionByName(_))

    val dirs = Analyzer.assignIds(
      unionAll(_.directories.drop("id")).dropDuplicates("path"), Seq("path"))
    val files = Analyzer.assignIds(
      unionAll(_.files.drop("id")).dropDuplicates("path"), Seq("path"))
    val defs = Analyzer.assignIds(
      unionAll(_.definitions.drop("id"))
        .dropDuplicates("primary_file_path", "primary_start_byte", "fqn"),
      Seq("primary_file_path", "primary_start_byte", "fqn"))
    val imps = Analyzer.assignIds(
      unionAll(_.importedSymbols.drop("id"))
        .dropDuplicates("file_path", "start_byte", "name"),
      Seq("file_path", "start_byte", "name"))

    val merged = GraphStore(
      dirs.select(graft.model.Schemas.directoryNodes.fieldNames.map(col).toIndexedSeq: _*),
      files.select(graft.model.Schemas.fileNodes.fieldNames.map(col).toIndexedSeq: _*),
      defs.select(graft.model.Schemas.definitionNodes.fieldNames.map(col).toIndexedSeq: _*),
      imps.select(graft.model.Schemas.importedSymbolNodes.fieldNames.map(col).toIndexedSeq: _*),
      edges = null) // filled below; keyTable only reads the node tables

    val newKeys = keyTable(merged)
    val srcK = newKeys.select(col("nk").as("s_nk"), col("id").as("new_src"))
    val dstK = newKeys.select(col("nk").as("d_nk"), col("id").as("new_dst"))
    val keyedEdges = stores.map(edgesWithNaturalKeys).reduce(_.unionByName(_))
      .dropDuplicates()
    val edges = keyedEdges
      .join(srcK, col("src_nk") === col("s_nk"))
      .join(dstK, col("dst_nk") === col("d_nk"))
      .withColumn("source_id", col("new_src"))
      .withColumn("target_id", col("new_dst"))
      .select(graft.model.Schemas.edges.fieldNames.map(col).toIndexedSeq: _*)

    merged.copy(edges = edges)
  }
}
