package graft.analyze

import java.io.File
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.{EdgeKind, RelType}

/** EXACT hand-annotated CALL-edge census over the COMPLETE reference
  * Kotlin fixture corpus — the call/reference counterpart of
  * [[graft.extract.KotlinFixtureCensusSpec]]'s definition census, and the
  * breadth extension of ReferenceFixturesSpec's 24 reference-asserted
  * Kotlin edges (kotlin/tests.rs:116-553): EVERY call edge the engine
  * derives from the 17 fixture files is asserted in BOTH directions — a
  * missed call site (recall) or a fabricated edge (precision) fails.
  *
  * Ground truth below was derived by hand-reading each fixture source
  * (no Kotlin parser exists on this box — COVERAGE.md), following the
  * reference's resolver semantics (expression_resolver.rs:103-1757):
  * receiver-type-directed member resolution, inheritance walks
  * (resolve_member_type_in_class_hierarchy), super dispatch
  * (resolve_super_member_function_call), companion/operator/extension
  * resolution, and when/if/try LUB inference (resolve_common_ancestor_type).
  *
  * Taxonomy notes, deliberate and documented:
  *  - Constructor invocations are Calls edges to the class definition —
  *    including SUPERTYPE-LIST constructor calls (`class Foo : Bar()`
  *    invokes Bar's constructor; an interface supertype without parens,
  *    `ServerFilter : Filter`, correctly yields none).
  *  - Call sites whose callee resolves through a file's import rather
  *    than a repo definition are DefToImp Calls edges, asserted in the
  *    second table: `logger.info(...)` lands on imported org.slf4j.Logger,
  *    `ExternalType("Hello")` on external.ExternalType, and Utils.kt's
  *    `ExtendMe(...)` on com.example.extensions.ExtendMe — the import
  *    path Utils.kt DECLARES (the fixture's import is stale relative to
  *    entities/Entities.kt; resolving what the file says, not what it
  *    meant, matches the reference's import-first binding,
  *    expression_resolver.rs:1409 resolve_type_from_imports).
  *  - Kotlin properties are type facts, not definitions, so calls inside
  *    property ACCESSORS (`val ExtendMe.extend get() = ExtendMeFromProperty(...)`,
  *    Utils.kt's `reversed` getter, Main.kt's top-level `logger`
  *    initializer) have no caller definition row and contribute no edge;
  *    calls THROUGH properties attribute to the enclosing function
  *    (`extendMe.extend.printValue()` → callToExtensions).
  */
class KotlinCallCensusSpec extends SparkSpec {

  private val fixtures = new File("/root/reference/fixtures/kotlin")

  // (caller fqn, callee fqn) — every DefToDef Calls edge in the corpus
  private val truthCalls: Set[(String, String)] = Set(
    // Main.kt body of com.example.main (tests.rs main-function-calls +
    // nested/enum suites)
    ("com.example.main", "com.example.foo.Foo"), // val foo = Foo()
    ("com.example.main", "com.example.foo.Foo.foo"),
    ("com.example.main", "com.example.foo.Foo.Companion.companionFoo"),
    ("com.example.main", "com.example.foo.Baz.baz"), // via Foo : Bar : Baz
    ("com.example.main", "com.example.nestedclasses.Parent.Child.GrandChild"),
    ("com.example.main", "com.example.nestedclasses.Parent.Child.GrandChild.greet"),
    ("com.example.main", "com.example.nestedclasses.Parent.GrandChild"),
    ("com.example.main", "com.example.nestedclasses.Parent.GrandChild.greet"),
    ("com.example.main", "com.example.enums.Enum.enumMethod"), // ENUM_VALUE_1 receiver
    ("com.example.main", "com.example.enums.Enum.enumMethod2"), // via enum-typed val
    // foo/Foo.kt
    ("com.example.foo.Foo", "com.example.foo.Bar"), // class Foo : Bar() supertype ctor
    ("com.example.foo.Foo.foo", "com.example.foo.Bar.bar"), // super.bar()
    ("com.example.foo.Foo.foo", "com.example.foo.Foo.fooInFooBody"),
    ("com.example.foo.Foo.InnerFoo.innerFoo", "com.example.foo.Foo.fooInFooBody"),
    // edgecases/filter: same-simple-name shadowing, super dispatch both ways
    ("com.example.edgecases.filter.ServerFilter.Filter",
      "com.example.edgecases.filter.ServerFilter"), // nested : ServerFilter()
    ("com.example.edgecases.filter.ServerFilter.Filter.filter",
      "com.example.edgecases.filter.ServerFilter.filter"), // super of nested
    ("com.example.edgecases.filter.ServerFilter.filter",
      "com.example.edgecases.filter.Filter.filter"), // super = interface default
    // nestedclasses/Nested.kt
    ("com.example.nestedclasses.Parent.GrandChild",
      "com.example.nestedclasses.Parent.Child.GrandChild"), // supertype ctor
    ("com.example.nestedclasses.Parent.GrandChild.greet",
      "com.example.nestedclasses.Parent.Child.GrandChild.greet"), // super.greet()
    // operator/AnimalList.kt
    ("com.example.operator.AnimalList.Companion.of",
      "com.example.operator.AnimalList.plus"), // list1 + list2 operator call
    ("com.example.operator.AnimalList.Companion.of",
      "com.example.operator.AnimalList.display"),
    ("com.example.operator.AnimalList.plus",
      "com.example.operator.AnimalList"), // AnimalList() in plus body
    // extensions/Extensions.kt
    ("com.example.extensions.callToExtensions",
      "com.example.extensions.entities.ExtendMe"), // ExtendMe("Hello")
    ("com.example.extensions.callToExtensions",
      "com.example.extensions.printValue"),
    ("com.example.extensions.callToExtensions",
      "com.example.extensions.entities.ExtendMeFromProperty.printValue"), // via .extend
    ("com.example.extensions.callToImportedExtensions",
      "com.example.extensions.entities.ExtendMe"),
    ("com.example.extensions.callToImportedExtensions",
      "com.example.extensions.utils.reverse"), // star-imported extension
    ("com.example.extensions.callToImportedExtensions",
      "com.example.extensions.printValue"), // via .reversed extension property
    // extensions/imported/Imported.kt
    ("com.example.extensions.imported.callToImported",
      "com.example.extensions.imported.print"),
    // if/If.kt: LUB inference + local function call
    ("com.example.if.ifTypeInference", "com.example.entites.Admin"),
    ("com.example.if.ifTypeInference", "com.example.entites.User"),
    ("com.example.if.usageOfIfTypeInference", "com.example.if.ifTypeInference"),
    ("com.example.if.usageOfIfTypeInference", "com.example.entites.Person.getName"),
    // try/Try.kt
    ("com.example.try.tryTypeInference", "com.example.entites.Admin"),
    ("com.example.try.tryTypeInference", "com.example.entites.User"),
    ("com.example.try.tryTypeInference", "com.example.entites.Person.getName"),
    // when/When.kt
    ("com.example.when.whenTypeInference", "com.example.entites.Admin"),
    ("com.example.when.whenTypeInference", "com.example.entites.User"),
    ("com.example.when.whenTypeInference", "com.example.entites.Person.getName"))

  // (caller fqn, import path, imported name) — calls resolved to imports
  private val truthImportCalls: Set[(String, String, String)] = Set(
    ("com.example.main", "org.slf4j.Logger", "Logger"), // logger.info(...)
    ("com.example.extensions.imported.callToImported",
      "external.ExternalType", "ExternalType"), // ExternalType("Hello")
    ("com.example.extensions.utils.reverse",
      "com.example.extensions.ExtendMe", "ExtendMe")) // the declared import

  test("kotlin fixtures: EXACT whole-corpus call census, both directions " +
    s"(${truthCalls.size} def edges + ${truthImportCalls.size} import edges)") {
    assume(fixtures.isDirectory, "reference fixtures not present")
    val store = Indexer.indexDirectory(spark, fixtures.getPath, "kotlin")
    val defs = store.definitions.select("id", "fqn")

    val gotCalls = store.edges
      .where(col("kind") === EdgeKind.DefToDef &&
        col("type").isin(RelType.Calls, RelType.AmbiguouslyCalls))
      .join(defs.withColumnRenamed("id", "sid")
        .withColumnRenamed("fqn", "caller"), col("source_id") === col("sid"))
      .join(defs.withColumnRenamed("id", "tid")
        .withColumnRenamed("fqn", "callee"), col("target_id") === col("tid"))
      .select("caller", "callee").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val missed = truthCalls -- gotCalls
    val fabricated = gotCalls -- truthCalls
    assert(missed.isEmpty, s"missed call edges:\n${missed.mkString("\n")}")
    assert(fabricated.isEmpty,
      s"fabricated call edges:\n${fabricated.mkString("\n")}")

    val gotImp = store.edges
      .where(col("kind") === EdgeKind.DefToImp &&
        col("type").isin(RelType.Calls, RelType.AmbiguouslyCalls))
      .join(defs.withColumnRenamed("id", "sid")
        .withColumnRenamed("fqn", "caller"), col("source_id") === col("sid"))
      .join(store.importedSymbols.select(col("id").as("iid"),
        col("import_path"), col("name").as("iname")),
        col("target_id") === col("iid"))
      .select("caller", "import_path", "iname").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(gotImp == truthImportCalls,
      s"import-call census diverged:\nmissed ${truthImportCalls -- gotImp}\n" +
        s"fabricated ${gotImp -- truthImportCalls}")
  }
}
