package graft.tpch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{EdgeKind, RelType}
import graft.store.GraphStore

/** Deterministic mapping of the driver's TPC-H-ish TESTDATA onto the engine's
  * property-graph schema, so every query-library operator can be exercised —
  * and DuckDB-oracle-checked — on the synthetic tables (FIXTURES.md §3:
  * "graph ops on an edge list derived from orders→customer→nation→region as a
  * containment hierarchy analogous to dir→file→definition").
  *
  * Mapping:
  *   region            → directory (level 0)          id = r_regionkey
  *   nation            → directory (level 1)          id = 10 + n_nationkey
  *   customer          → file                         id = c_custkey
  *   customer (again)  → "module" definition          id = 50_000_000 + c_custkey
  *   orders            → function/method definitions  id = o_orderkey
  *   supplier          → imported symbols             id = s_suppkey
  *   lineitem          → DEF→IMP reference edges (CALLS / AMBIGUOUSLY_CALLS /
  *                       PROPERTY_REFERENCE by l_returnflag)
  *   orders            → DEF→DEF CALLS (order def → its module def)
  *   customer chain    → DEF→DEF module→module CALLS (next custkey in nation)
  *   supplier chain    → IMP→IMP re-export chain (next suppkey in nation)
  *
  * Everything here is a pure function of the input tables (no zipWithIndex,
  * no nondeterminism) so the identical construction is expressible as the
  * DuckDB oracle's WITH-prelude (see [[graft.SparkEntry.oraclePrelude]]).
  */
object TpchGraphAdapter {

  final val ModuleIdOffset = 50000000L

  /** Lines per synthetic file: must exceed the max definition start_line
    * (998 = o_orderkey % 997 + 2) plus the Q16 context window, so every
    * context slice is fully populated on both engines (an out-of-range
    * slice would be "" in Spark but NULL via SQL string_agg).
    */
  final val ContentLines = 1024

  /** Q16's file-contents table, synthesized deterministically from customer
    * rows: path = the adapter's file path, content = [[ContentLines]]
    * formulaic lines. Pure function of the inputs, so the DuckDB oracle
    * reconstructs any line range with generate_series (reference behavior:
    * mcp/src/tools/search_codebase_definitions.rs:167-304 reads real files;
    * here the contents table IS the file system).
    */
  def syntheticContents(spark: SparkSession, sfDir: String): DataFrame = {
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val nat = broadcast(nation.join(broadcast(region),
        nation("n_regionkey") === region("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name")))
    customer.join(nat, customer("c_nationkey") === nat("n_nationkey"))
      .select(
        concat(col("r_name"), lit("/"), col("n_name"), lit("/"),
          col("c_name"), lit(".py")).as("path"),
        array_join(transform(sequence(lit(1), lit(ContentLines)), j =>
          concat(lit("## "), col("c_name"), lit(" line "), j.cast("string"),
            lit(" seg="), lower(col("c_mktsegment")))), "\n").as("content"))
  }

  def apply(spark: SparkSession, sfDir: String): GraphStore = {
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    build(region, nation, customer, orders, supplier, lineitem)
  }

  def build(region: DataFrame, nation: DataFrame, customer: DataFrame,
            orders: DataFrame, supplier: DataFrame, lineitem: DataFrame): GraphStore = {

    // nation + its region name; small dims → broadcast everywhere they join.
    val nat = broadcast(nation.join(broadcast(region),
        nation("n_regionkey") === region("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("r_name")))

    val dirsRegion = region.select(
      col("r_regionkey").cast("long").as("id"),
      col("r_name").as("path"),
      concat(lit("/"), col("r_name")).as("absolute_path"),
      lit("tpch").as("repository_name"),
      col("r_name").as("name"))
    val dirsNation = nat.select(
      (col("n_nationkey").cast("long") + 10L).as("id"),
      concat(col("r_name"), lit("/"), col("n_name")).as("path"),
      concat(lit("/"), col("r_name"), lit("/"), col("n_name")).as("absolute_path"),
      lit("tpch").as("repository_name"),
      col("n_name").as("name"))
    val directories = dirsRegion.unionByName(dirsNation)

    // customer → file node (path = REGION/NATION/Customer#x.py)
    val custFile = customer.join(nat, customer("c_nationkey") === nat("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"), col("n_nationkey"), col("n_name"), col("r_name"),
        concat(col("r_name"), lit("/"), col("n_name"), lit("/"),
          col("c_name"), lit(".py")).as("fpath"))

    val files = custFile.select(
      col("c_custkey").cast("long").as("id"),
      col("fpath").as("path"),
      concat(lit("/"), col("fpath")).as("absolute_path"),
      lower(col("c_mktsegment")).as("language"),
      lit("tpch").as("repository_name"),
      lit("py").as("extension"),
      concat(col("c_name"), lit(".py")).as("name"))

    // customer → module definition
    val moduleDefs = custFile.select(
      (col("c_custkey").cast("long") + ModuleIdOffset).as("id"),
      col("c_name").as("fqn"),
      col("c_name").as("name"),
      lit("Module").as("definition_type"),
      col("fpath").as("primary_file_path"),
      lit(0L).as("primary_start_byte"),
      lit(1000000L).as("primary_end_byte"),
      lit(1).as("start_line"),
      lit(100000).as("end_line"),
      lit(0).as("start_col"),
      lit(0).as("end_col"),
      lit(1).as("total_locations"))

    // orders → function/method/lambda definitions inside the customer module
    val orderWithFile = orders.join(
      custFile.select(col("c_custkey"), col("c_name"), col("fpath")),
      orders("o_custkey") === col("c_custkey"))
    val orderDefs = orderWithFile.select(
      col("o_orderkey").cast("long").as("id"),
      concat(col("c_name"), lit(".order_"), col("o_orderkey")).as("fqn"),
      concat(lit("order_"), col("o_orderkey")).as("name"),
      when(col("o_orderstatus") === "O", "Function")
        .when(col("o_orderstatus") === "F", "Method")
        .otherwise("Lambda").as("definition_type"),
      col("fpath").as("primary_file_path"),
      (col("o_orderkey") * 100L).as("primary_start_byte"),
      (col("o_orderkey") * 100L + 99L).as("primary_end_byte"),
      (col("o_orderkey") % 997L + 2L).cast("int").as("start_line"),
      (col("o_orderkey") % 997L + 7L).cast("int").as("end_line"),
      lit(0).as("start_col"),
      lit(120).as("end_col"),
      lit(1).as("total_locations"))
    val definitions = moduleDefs.unionByName(orderDefs)

    // supplier → imported symbol; its "home file" = min customer of its nation
    val minCustPerNation = customer.groupBy(col("c_nationkey").as("mn_nationkey"))
      .agg(min(col("c_custkey")).as("min_custkey"))
    val suppHome = supplier
      .join(broadcast(minCustPerNation), col("s_nationkey") === col("mn_nationkey"))
      .join(custFile.select(col("c_custkey").as("hc_custkey"),
        col("fpath").as("home_path")), col("min_custkey") === col("hc_custkey"))
    val importedSymbols = suppHome.select(
      col("s_suppkey").cast("long").as("id"),
      lit("module").as("import_type"),
      concat(lit("suppliers/"), lower(col("s_name"))).as("import_path"),
      col("s_name").as("name"),
      when(col("s_suppkey") % 3 === 0,
        concat(lit("sup"), col("s_suppkey") % 10)).otherwise(lit(null).cast("string")).as("alias"),
      col("home_path").as("file_path"),
      (col("s_suppkey") * 10L).as("start_byte"),
      (col("s_suppkey") * 10L + 9L).as("end_byte"),
      (col("s_suppkey") % 50L + 1L).cast("int").as("start_line"),
      (col("s_suppkey") % 50L + 1L).cast("int").as("end_line"),
      lit(0).as("start_col"),
      lit(40).as("end_col"))

    // ---------------- edges ----------------
    val nulls = Seq(
      lit(null).cast("long").as("source_start_byte"),
      lit(null).cast("long").as("source_end_byte"),
      lit(null).cast("int").as("source_start_line"),
      lit(null).cast("int").as("source_end_line"),
      lit(null).cast("int").as("source_start_col"),
      lit(null).cast("int").as("source_end_col"))

    val dirToDir = nat.select(
      lit(EdgeKind.DirToDir).as("kind"), lit(RelType.DirContainsDir).as("type"),
      col("n_regionkey").cast("long").as("source_id"),
      (col("n_nationkey").cast("long") + 10L).as("target_id")
    ).select(col("*") +: nulls: _*)

    val dirToFile = custFile.select(
      lit(EdgeKind.DirToFile).as("kind"), lit(RelType.DirContainsFile).as("type"),
      (col("n_nationkey").cast("long") + 10L).as("source_id"),
      col("c_custkey").cast("long").as("target_id")
    ).select(col("*") +: nulls: _*)

    val fileDefinesModule = custFile.select(
      lit(EdgeKind.FileToDef).as("kind"), lit(RelType.FileDefines).as("type"),
      col("c_custkey").cast("long").as("source_id"),
      (col("c_custkey").cast("long") + ModuleIdOffset).as("target_id")
    ).select(col("*") +: nulls: _*)

    val fileDefinesOrder = orders.select(
      lit(EdgeKind.FileToDef).as("kind"), lit(RelType.FileDefines).as("type"),
      col("o_custkey").cast("long").as("source_id"),
      col("o_orderkey").cast("long").as("target_id")
    ).select(col("*") +: nulls: _*)

    // file imports supplier if any of the file's orders has a lineitem from it
    val fileImports = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      .select(col("o_custkey").cast("long").as("source_id"),
        col("l_suppkey").cast("long").as("target_id"))
      .distinct()
      .select(lit(EdgeKind.FileToImp).as("kind"), lit(RelType.FileImports).as("type"),
        col("source_id"), col("target_id"))
      .select(col("*") +: nulls: _*)

    // module def → order def nesting, typed by the child's definition_type
    // (reference: nesting table relationship.rs:19-98 via RelType.nesting)
    val nestingEdges = orders.select(
      lit(EdgeKind.DefToDef).as("kind"),
      concat(lit("MODULE_TO_"),
        when(col("o_orderstatus") === "O", "FUNCTION")
          .when(col("o_orderstatus") === "F", "METHOD")
          .otherwise("LAMBDA")).as("type"),
      (col("o_custkey").cast("long") + ModuleIdOffset).as("source_id"),
      col("o_orderkey").cast("long").as("target_id")
    ).select(col("*") +: nulls: _*)

    // order def calls its own module def
    val orderCallsModule = orders.select(
      lit(EdgeKind.DefToDef).as("kind"), lit(RelType.Calls).as("type"),
      col("o_orderkey").cast("long").as("source_id"),
      (col("o_custkey").cast("long") + ModuleIdOffset).as("target_id"),
      lit(null).cast("long").as("source_start_byte"),
      lit(null).cast("long").as("source_end_byte"),
      (col("o_orderkey") % 997L + 3L).cast("int").as("source_start_line"),
      (col("o_orderkey") % 997L + 3L).cast("int").as("source_end_line"),
      lit(10).as("source_start_col"),
      lit(30).as("source_end_col"))

    // module call chain: customer → next customer within the nation
    val wNation = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
    val moduleChain = customer
      .withColumn("next_custkey", lead(col("c_custkey"), 1).over(wNation))
      .where(col("next_custkey").isNotNull)
      .select(
        lit(EdgeKind.DefToDef).as("kind"),
        when(col("c_custkey") % 7 === 0, RelType.AmbiguouslyCalls)
          .otherwise(RelType.Calls).as("type"),
        (col("c_custkey").cast("long") + ModuleIdOffset).as("source_id"),
        (col("next_custkey").cast("long") + ModuleIdOffset).as("target_id"),
        lit(null).cast("long").as("source_start_byte"),
        lit(null).cast("long").as("source_end_byte"),
        (col("c_custkey") % 100L + 1L).cast("int").as("source_start_line"),
        (col("c_custkey") % 100L + 1L).cast("int").as("source_end_line"),
        lit(5).as("source_start_col"),
        lit(25).as("source_end_col"))

    // lineitem → order def references supplier import
    val defToImp = lineitem.select(
      lit(EdgeKind.DefToImp).as("kind"),
      when(col("l_returnflag") === "N", RelType.Calls)
        .when(col("l_returnflag") === "R", RelType.AmbiguouslyCalls)
        .otherwise(RelType.PropertyReference).as("type"),
      col("l_orderkey").cast("long").as("source_id"),
      col("l_suppkey").cast("long").as("target_id"),
      col("l_partkey").cast("long").as("source_start_byte"),
      (col("l_partkey").cast("long") + 10L).as("source_end_byte"),
      col("l_linenumber").cast("int").as("source_start_line"),
      col("l_linenumber").cast("int").as("source_end_line"),
      col("l_quantity").cast("int").as("source_start_col"),
      (col("l_quantity").cast("int") + 20).as("source_end_col"))

    // supplier re-export chain: supplier → next supplier within the nation
    val wSupp = Window.partitionBy(col("s_nationkey")).orderBy(col("s_suppkey"))
    val impChain = supplier
      .withColumn("next_suppkey", lead(col("s_suppkey"), 1).over(wSupp))
      .where(col("next_suppkey").isNotNull)
      .select(lit(EdgeKind.ImpToImp).as("kind"), lit(RelType.ImpToImp).as("type"),
        col("s_suppkey").cast("long").as("source_id"),
        col("next_suppkey").cast("long").as("target_id"))
      .select(col("*") +: nulls: _*)

    val impToDef = suppHome.select(
      lit(EdgeKind.ImpToDef).as("kind"), lit(RelType.ImpToDef).as("type"),
      col("s_suppkey").cast("long").as("source_id"),
      (col("min_custkey").cast("long") + ModuleIdOffset).as("target_id")
    ).select(col("*") +: nulls: _*)

    val impToFile = suppHome.select(
      lit(EdgeKind.ImpToFile).as("kind"), lit(RelType.ImpToFile).as("type"),
      col("s_suppkey").cast("long").as("source_id"),
      col("min_custkey").cast("long").as("target_id")
    ).select(col("*") +: nulls: _*)

    val edges = Seq(dirToDir, dirToFile, fileDefinesModule, fileDefinesOrder,
      fileImports, nestingEdges, orderCallsModule, moduleChain, defToImp,
      impChain, impToDef, impToFile).reduce(_.unionByName(_))

    GraphStore(directories, files, definitions, importedSymbols, edges)
  }
}
