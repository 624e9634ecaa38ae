package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's one-line stdout contract — the driver tails stdout
  * and JSON-parses the line, and this contract broke silently for eight
  * rounds (first from line length, then from sbt's `[info] ` forked-run
  * prefix — see build.sbt's outputStrategy). Pure string checks; no
  * SparkSession needed. */
class BenchContractSpec extends AnyFunSuite {

  // every headline query at a worst-case timing width (four digits + 3dp)
  private val worstCase = Bench.headline.toSeq.sorted.map(_ -> 9999.999)

  test("headline line stays under the driver's tail window at worst-case widths") {
    val line = Bench.headlineLine(99999.999999999, 99999.999999999, 999, 999,
      Bench.jmap(worstCase), "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1500,
      s"headline line is ${line.length}B — trim Bench.headline before it truncates")
  }

  test("headline line is valid JSON shape with the fields the driver reads") {
    val line = Bench.headlineLine(1.5, 1.2345, 0, 2,
      Bench.jmap(Seq("a" -> 0.1234, "b" -> -1.0)), "/x")
    assert(line.startsWith("{") && line.endsWith("}"))
    for (field <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"steady_total\":", "\"n_unadjudicated\":",
        "\"n_queries\":", "\"queries\":{", "\"sf\":"))
      assert(line.contains(field), s"missing $field in $line")
    // 3dp rounding and the -1 crashed-query sentinel survive the format
    assert(line.contains("\"a\":0.123"))
    assert(line.contains("\"b\":-1"))
    assert(line.contains("\"steady_total\":1.235"))
  }

  test("unadjudicated-outliers array formats as valid JSON") {
    assert(Bench.jarr(Seq.empty) == "[]")
    assert(Bench.jarr(Seq("x", "y")) == """["x","y"]""")
  }

  test("every headline key names a registered query") {
    val unknown = Bench.headline.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"headline names unregistered queries: $unknown")
  }
}
