package graft.model

/** Case-class row types for the four node tables + unified edge table —
  * the `Dataset[T]` face of the engine (field names match the column names
  * in [[Schemas]] so `df.as[T]` is a pure metadata operation; nullable
  * columns are Options). Use the typed view where compile-time field safety
  * helps (library consumers, tests); the query layer stays DataFrame-based
  * where schemas are dynamic.
  */
final case class DirectoryNode(
    id: Long, path: String, absolute_path: String,
    repository_name: String, name: String)

final case class FileNode(
    id: Long, path: String, absolute_path: String, language: String,
    repository_name: String, extension: String, name: String)

final case class DefinitionNode(
    id: Long, fqn: String, name: String, definition_type: String,
    primary_file_path: String, primary_start_byte: Option[Long],
    primary_end_byte: Option[Long], start_line: Option[Int],
    end_line: Option[Int], start_col: Option[Int], end_col: Option[Int],
    total_locations: Option[Int])

final case class ImportedSymbolNode(
    id: Long, import_type: String, import_path: String, name: String,
    alias: Option[String], file_path: String, start_byte: Option[Long],
    end_byte: Option[Long], start_line: Option[Int], end_line: Option[Int],
    start_col: Option[Int], end_col: Option[Int])

final case class EdgeRow(
    kind: String, `type`: String, source_id: Long, target_id: Long,
    source_start_byte: Option[Long], source_end_byte: Option[Long],
    source_start_line: Option[Int], source_end_line: Option[Int],
    source_start_col: Option[Int], source_end_col: Option[Int])
