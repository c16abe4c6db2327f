package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** Label-cardinality bound of the request-metrics registry: unseen paths
  * beyond the cap fold into one catch-all series instead of growing the
  * map — the /metrics-public abuse case (crawler 404 probes).
  */
class MetricsSpec extends AnyFunSuite {

  test("series map is capped; overflow observes into the catch-all and " +
    "no observation is lost") {
    val m = new Metrics
    val probes = m.MaxSeries + 50
    for (i <- 0 until probes)
      m.observeDuration("GET", s"/probe-$i", 0.01)
    val doc = m.render
    val seriesCount = doc.linesIterator
      .count(_.startsWith("graft_http_request_duration_seconds_count{"))
    assert(seriesCount <= m.MaxSeries + 1,
      s"series must be capped, got $seriesCount:\n$doc")
    assert(doc.contains("""path="other""""),
      "overflow must land in the catch-all series")
    // every observation is accounted for across all series
    val total = doc.linesIterator
      .filter(_.startsWith("graft_http_request_duration_seconds_count{"))
      .map(_.split(' ').last.toLong).sum
    assert(total == probes.toLong)
    // a path admitted BEFORE the cap keeps observing into its own series
    m.observeDuration("GET", "/probe-0", 0.01)
    assert(m.render.linesIterator.exists(l =>
      l.startsWith("graft_http_request_duration_seconds_count{") &&
        l.contains("""path="/probe-0"""") && l.endsWith(" 2")))
  }
}
