package graft

import org.apache.spark.sql.SparkSession
import graft.analyze.Indexer
import graft.query.QueryLibrary
import graft.store.GraphStore

/** CLI entry points — the analog of the reference's `gkg` binary
  * (gkg/src/cli.rs:30-60: index / query / stats, minus the HTTP server).
  *
  * Usage:
  *   graft.Cli index <repoDir> <storeDir> [repoName]
  *   graft.Cli stats <storeDir>
  *   graft.Cli query <storeDir> <name> [args...]   (see `queries` below)
  *   graft.Cli sql   <storeDir> <statement>
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-cli")
    try run(spark, args.toList)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "index" :: repoDir :: storeDir :: rest =>
      val repo = rest.headOption.getOrElse(
        new java.io.File(repoDir).getName)
      val t0 = System.nanoTime()
      val store = Indexer.indexDirectory(spark, repoDir, repo)
      store.write(storeDir)
      val wrote = System.nanoTime()
      val readBack = GraphStore.read(spark, storeDir).cacheAll()
      // optional 2nd rest arg: stats JSON path (the reference's --stats)
      rest.drop(1).headOption.foreach { statsPath =>
        graft.analyze.IndexStats.write(statsPath, readBack,
          Map("index_and_write" -> (wrote - t0) / 1e9))
        println(s"stats -> $statsPath")
      }
      val lib = new QueryLibrary(readBack)
      lib.graphStats().show(truncate = false)

    case "stats" :: storeDir :: Nil =>
      new QueryLibrary(GraphStore.read(spark, storeDir)).graphStats()
        .show(truncate = false)

    case "query" :: storeDir :: name :: rest =>
      val lib = new QueryLibrary(GraphStore.read(spark, storeDir).cacheAll())
      val df = (name, rest) match {
        case ("file-definitions", path :: _) => lib.fileDefinitions(path)
        case ("file-imports", path :: _) => lib.fileImports(path)
        case ("search", term :: _) => lib.searchNodes(term)
        case ("search-definitions", terms) => lib.searchDefinitions(terms)
        case ("matches", s :: _) => lib.listMatches(s)
        case ("references", n :: p :: _) => lib.getReferences(n, p)
        case ("definition-relations", fqn :: _) => lib.definitionRelations(fqn)
        case ("calls-from", fqn :: _) => lib.callsFrom(fqn)
        case ("calls-to", fqn :: _) => lib.callsTo(fqn)
        case ("call-closure", fqn :: _) => lib.callClosure(fqn)
        case ("neighbors", kind :: id :: _) => lib.nodeNeighbors(kind, id.toLong)
        case ("initial-graph", _) => lib.initialProjectGraph()
        case ("repo-map", paths) => lib.repoMap(paths)
        case other =>
          throw new IllegalArgumentException(s"unknown query: $other")
      }
      df.show(100, truncate = false)

    case "sql" :: storeDir :: statement :: Nil =>
      new QueryLibrary(GraphStore.read(spark, storeDir))
        .sql(spark, statement).show(100, truncate = false)

    // Workspace = one store per project, exactly the reference's model
    // (workspace-manager keeps one DB per project and routes queries;
    // crates/workspace-manager). Merging graphs across repos would conflate
    // path-keyed natural keys — per-project stores keep ids and paths local.
    case "index-workspace" :: wsDir :: storeDir :: Nil =>
      val repos = Option(new java.io.File(wsDir).listFiles())
        .getOrElse(Array.empty).filter(_.isDirectory).sortBy(_.getName)
      require(repos.nonEmpty, s"no project directories under $wsDir")
      repos.foreach { r =>
        Indexer.indexDirectory(spark, r.getPath, r.getName)
          .write(s"$storeDir/${r.getName}")
        println(s"indexed ${r.getName} -> $storeDir/${r.getName}")
      }

    // list_projects MCP analog: the indexed project stores in a workspace
    case "list-projects" :: storeDir :: Nil =>
      listProjects(storeDir).foreach(println)

    case other =>
      System.err.println(
        s"""unknown args: ${other.mkString(" ")}
           |usage: index <repoDir> <storeDir> [repoName]
           |       index-workspace <workspaceDir> <storeDir>
           |       list-projects <storeDir>
           |       stats <storeDir>
           |       query <storeDir> <name> [args...]
           |       sql <storeDir> <statement>""".stripMargin)
      sys.exit(2)
  }

  /** Project names with a complete store under `storeDir`. */
  private[graft] def listProjects(storeDir: String): Seq[String] =
    Option(new java.io.File(storeDir).listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory && new java.io.File(d, "file_nodes").isDirectory)
      .map(_.getName).sorted.toSeq
}
