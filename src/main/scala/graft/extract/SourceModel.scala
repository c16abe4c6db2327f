package graft.extract

/** Per-file extraction IR (SURVEY §2.2 E1-E3).
  *
  * The reference's parser stage produces per-language
  * `DefinitionInfo` / `ImportedSymbolInfo` / `ReferenceInfo` payloads
  * (indexer/src/parsing/processor.rs:1-41, 424-706). Here one normalized
  * schema with a `language` discriminator replaces the per-language ADTs —
  * columnar-friendly, one extraction Dataset for all languages.
  */
final case class SourceFile(
    path: String,
    absolutePath: String,
    repositoryName: String,
    name: String,
    extension: String,
    language: String,
    content: String)

final case class RawDefinition(
    filePath: String,
    fqn: String,
    name: String,
    definitionType: String,
    startByte: Long,
    endByte: Long,
    startLine: Int,
    endLine: Int,
    startCol: Int,
    endCol: Int)

final case class RawImport(
    filePath: String,
    importType: String,
    importPath: String,
    name: String,
    alias: String,
    startByte: Long,
    endByte: Long,
    startLine: Int,
    endLine: Int,
    startCol: Int,
    endCol: Int)

/** A reference site (call / attribute access) awaiting resolution. */
final case class RawReference(
    filePath: String,
    name: String,
    receiver: String, // "" for call-form refs (parens); receiver expr ONLY
                      // for property access (x.attr) → PROPERTY_REFERENCE
                      // (reference: relationship.rs:99-105 reserves it for
                      // non-call attribute access)
    startByte: Long,
    endByte: Long,
    startLine: Int,
    startCol: Int,
    endCol: Int,
    callReceiver: String = "") // receiver EXPRESSION of a call-form ref
                               // ("x.y", "super", "CALL:f", "BINOP:x") —
                               // consumed by the type-directed resolver;
                               // does NOT affect CALLS classification

/** A scope-local typing fact for the type-directed resolver (the DataFrame
  * face of what the reference's per-language expression resolvers — e.g.
  * kotlin/expression_resolver.rs:103-1757 — recover from the syntax tree):
  *
  *  - "package": detail = the file's package declaration
  *  - "var":     subject = variable/field/param name, detail = type
  *                expression ("Foo", "Outer.Inner", or "A|B" when inferred
  *                from a multi-branch when/if/try), scope = enclosing def FQN
  *  - "extends": subject = class FQN, detail = one raw supertype name
  *  - "returns": scope = method FQN, detail = return type expression
  *  - "prop":    scope = raw receiver type name (Kotlin extension property),
  *                subject = property name, detail = result type expression
  */
final case class RawTypeFact(
    filePath: String,
    factKind: String,
    scope: String,
    subject: String,
    detail: String,
    startLine: Int)

final case class Extracted(
    file: SourceFile,
    definitions: Seq[RawDefinition],
    imports: Seq[RawImport],
    references: Seq[RawReference],
    typeFacts: Seq[RawTypeFact] = Nil)

/** E1 — extension → language (reference: parsing/processor.rs:183-196). */
object LanguageDetect {
  val byExtension: Map[String, String] = Map(
    "py" -> "python", "rb" -> "ruby", "kt" -> "kotlin", "kts" -> "kotlin",
    "java" -> "java", "cs" -> "csharp", "ts" -> "typescript",
    "tsx" -> "typescript", "js" -> "javascript", "jsx" -> "javascript",
    "rs" -> "rust", "scala" -> "scala", "sc" -> "scala")
  def apply(extension: String): String =
    byExtension.getOrElse(extension.toLowerCase, "unknown")
}
