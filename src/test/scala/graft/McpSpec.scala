package graft

import java.nio.file.Files
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON-RPC round-trip over the MCP facade: the same handshake + tool calls
  * an MCP client (the agents that drive the reference's rmcp server) would
  * issue, asserted on the wire format.
  */
class McpSpec extends SparkSpec {
  implicit private val formats: Formats = DefaultFormats

  private lazy val server: McpServer = {
    val repo = Files.createTempDirectory("graft-mcp-repo")
    Files.writeString(repo.resolve("lib.py"),
      "def helper(x):\n    return x\n\nclass Tool:\n    def run(self):\n        return helper(1)\n")
    Files.writeString(repo.resolve("app.py"),
      "from lib import helper\n\ndef main():\n    return helper(2)\n")
    val storeDir = Files.createTempDirectory("graft-mcp-store").toString
    graft.analyze.Indexer.indexDirectory(spark, repo.toString, "mcp-repo")
      .write(storeDir)
    new McpServer(spark, storeDir)
  }

  private def call(json: String): JValue =
    JsonMethods.parse(server.handle(json).getOrElse(fail(s"no response: $json")))

  test("initialize handshake + tools/list") {
    val init = call("""{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""")
    assert((init \ "result" \ "protocolVersion").extract[String] ==
      McpServer.ProtocolVersion)
    assert(server.handle(
      """{"jsonrpc":"2.0","method":"notifications/initialized"}""").isEmpty)
    val tools = call("""{"jsonrpc":"2.0","id":2,"method":"tools/list"}""")
    val names = (tools \ "result" \ "tools" \\ classOf[JString])
    McpServer.toolSpecs.map(_._1).foreach(t => assert(names.contains(t), t))
  }

  test("tools/call search + references round-trip") {
    val search = call("""{"jsonrpc":"2.0","id":3,"method":"tools/call",
      "params":{"name":"search_codebase_definitions","arguments":{"terms":["helper"]}}}""")
    val text = (search \ "result" \ "content")(0).asInstanceOf[JObject] \ "text"
    val rows = JsonMethods.parse(text.extract[String]).asInstanceOf[JArray].arr
    assert(rows.exists(r => (r \ "name").extract[String] == "helper"))

    val refs = call("""{"jsonrpc":"2.0","id":4,"method":"tools/call",
      "params":{"name":"get_references","arguments":{"name":"helper","path":"lib.py"}}}""")
    val refRows = JsonMethods.parse(
      ((refs \ "result" \ "content")(0) \ "text").extract[String])
      .asInstanceOf[JArray].arr
    assert(refRows.nonEmpty) // Tool.run and app.main call helper
  }

  test("unknown tool and malformed input become protocol errors") {
    val bad = call("""{"jsonrpc":"2.0","id":5,"method":"tools/call",
      "params":{"name":"nope","arguments":{}}}""")
    assert((bad \ "result" \ "isError").extract[Boolean])
    val malformed = call("""{"this is not json""")
    assert((malformed \ "error" \ "code").extract[Int] == -32700)
    val unknown = call("""{"jsonrpc":"2.0","id":6,"method":"no/such"}""")
    assert((unknown \ "error" \ "code").extract[Int] == -32601)
  }
}
