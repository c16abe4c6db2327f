package graft

import java.nio.file.Files
import org.json4s._
import org.json4s.jackson.JsonMethods

/** End-to-end round-trip over the graph-explorer HTTP facade: a real socket
  * on an ephemeral port, the same GET requests the reference's axum tests
  * issue (graph_initial.rs / graph_neighbors.rs / graph_search.rs /
  * graph_stats.rs `#[tokio::test]` blocks), asserted on status codes and
  * the reference's response field names.
  */
class HttpSpec extends SparkSpec {
  implicit private val formats: Formats = DefaultFormats

  private lazy val (server, port) = {
    val repo = Files.createTempDirectory("graft-http-repo")
    Files.writeString(repo.resolve("lib.py"),
      "def helper(x):\n    return x\n\nclass Tool:\n    def run(self):\n        return helper(1)\n")
    Files.writeString(repo.resolve("app.py"),
      "from lib import helper\n\ndef main():\n    return helper(2)\n")
    val storeDir = Files.createTempDirectory("graft-http-store").toString
    graft.analyze.Indexer.indexDirectory(spark, repo.toString, "http-repo")
      .write(storeDir)
    val s = new GraphHttpServer(spark, storeDir, "ws", "proj")
    val p = s.start(0) // ephemeral port
    (s, p)
  }

  private def get(path: String): (Int, JValue) = {
    val url = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val status = conn.getResponseCode
    val stream = if (status < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(stream.readAllBytes(), "UTF-8")
    conn.disconnect()
    (status, JsonMethods.parse(body))
  }

  test("initial graph over the wire: nodes + relationships + project_info") {
    val (status, body) = get("/graph/initial/ws/proj?definition_limit=500")
    assert(status == 200)
    val nodes = (body \ "nodes").asInstanceOf[JArray].arr
    val rels = (body \ "relationships").asInstanceOf[JArray].arr
    assert(nodes.nonEmpty && rels.nonEmpty)
    // every relationship endpoint resolves to a node in the same payload
    val ids = nodes.map(n => (n \ "id").extract[String]).toSet
    rels.foreach { r =>
      assert(ids.contains((r \ "source").extract[String]))
      assert(ids.contains((r \ "target").extract[String]))
    }
    assert((body \ "project_info" \ "project_path").extract[String] == "proj")
  }

  test("neighbors: reference node-type labels, directed endpoints") {
    // find helper's definition id via search, then walk its neighborhood
    val (_, search) = get("/graph/search/ws/proj?search_term=helper")
    val defNode = (search \ "nodes").asInstanceOf[JArray].arr
      .find(n => (n \ "node_type").extract[String] == "DefinitionNode" &&
        (n \ "name").extract[String] == "helper")
      .getOrElse(fail("helper definition not found via search"))
    val id = (defNode \ "node_id").extract[Long]
    val (status, body) = get(s"/graph/neighbors/ws/proj/DefinitionNode/$id")
    assert(status == 200)
    val nodes = (body \ "nodes").asInstanceOf[JArray].arr
    assert(nodes.nonEmpty) // at least the containing file links to helper
    val selfRef = s"definition:$id"
    (body \ "relationships").asInstanceOf[JArray].arr.foreach { r =>
      assert((r \ "source").extract[String] == selfRef ||
        (r \ "target").extract[String] == selfRef)
    }
  }

  test("stats: totals are consistent with the per-kind counts") {
    val (status, body) = get("/graph/stats/ws/proj")
    assert(status == 200)
    val nc = body \ "node_counts"
    val total = (body \ "total_nodes").extract[Long]
    assert(total == Seq("directory_count", "file_count", "definition_count",
      "imported_symbol_count").map(k => (nc \ k).extract[Long]).sum)
    val rc = body \ "relationship_counts"
    assert((body \ "total_relationships").extract[Long] ==
      Seq("directory_relationships", "file_relationships",
        "definition_relationships").map(k => (rc \ k).extract[Long]).sum)
    assert(total > 0)
  }

  test("reference error contract: 400s and 404s with status bodies") {
    // %20 decodes to a blank project path — graph_search.rs:274-279
    val (s1, b1) = get("/graph/search/ws/%20?search_term=x")
    assert(s1 == 400 && (b1 \ "status").extract[String] == "empty_project_path")
    val (s2, b2) = get("/graph/search/ws/proj?search_term=")
    assert(s2 == 400 && (b2 \ "status").extract[String] == "empty_search_term")
    val (s3, b3) = get("/graph/neighbors/ws/proj/NopeNode/1")
    assert(s3 == 400 && (b3 \ "status").extract[String] == "invalid_node_type")
    val (s4, b4) = get("/graph/stats/ws/other_project")
    assert(s4 == 404 && (b4 \ "status").extract[String] == "project_not_found")
    val (s5, _) = get("/graph/stats/missing_parts")
    assert(s5 == 404)
  }

  override def afterAll(): Unit = {
    server.stop()
    super.afterAll()
  }
}
