package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[AbBench]]'s child-artifact parsers: the A/B orchestrator's merge
  * is only as trustworthy as these — a silent mis-parse would fabricate
  * or drop paired ratios. The input shape is machine-printed by
  * [[Bench]] itself (flat {"name":double} / ["name"] lists), so the
  * tests pin exactly that contract, including the edge shapes Bench
  * actually emits (empty objects, empty error lists). */
class AbBenchSpec extends AnyFunSuite {

  test("parseQueries reads a flat machine-printed queries object") {
    val json = """{"metric":"total","value":1.5,"queries":{"q01_a":0.25,""" +
      """"q08_b":1.337738173,"q99_z":12.0},"detail":{"q01_a":{"min":0.25}}}"""
    assert(AbBench.parseQueries(json) ===
      Map("q01_a" -> 0.25, "q08_b" -> 1.337738173, "q99_z" -> 12.0))
  }

  test("parseQueries: empty object and absent key yield empty maps") {
    assert(AbBench.parseQueries("""{"queries":{},"errors":[]}""") === Map.empty)
    assert(AbBench.parseQueries("""{"value":1.0}""") === Map.empty)
  }

  test("parseQueries drops malformed entries instead of throwing") {
    val json = """{"queries":{"ok":1.25,"bad":abc,"ok2":2.5}}"""
    assert(AbBench.parseQueries(json) === Map("ok" -> 1.25, "ok2" -> 2.5))
  }

  test("parseErrors reads the errors list") {
    assert(AbBench.parseErrors("""{"errors":["q03_x","q04_y"],"sf":"d"}""") ===
      Seq("q03_x", "q04_y"))
    assert(AbBench.parseErrors("""{"errors":[]}""") === Seq.empty)
    assert(AbBench.parseErrors("""{"value":1.0}""") === Seq.empty)
  }
}
