package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the README's oracle-independence rule: the
  * q33/q148/q149 DuckDB replays deliberately mirror the engine's
  * ε-slack PPJoin prefix rule so candidate generation is
  * engine-identical — which means the oracle CANNOT catch a recall
  * bug in that rule (both sides would drop the same pairs and
  * hash-match). This spec greps the two sources into parity and
  * asserts the independent brute-force gates exist, so:
  *
  *  - an engine-side ε or formula change that forgets the oracle (or
  *    vice versa) fails here, loudly, instead of silently passing the
  *    very gate it just blinded;
  *  - deleting the independent brute-force property tests — the only
  *    real recall gate for this code path — also fails here.
  *
  * Source-grepping a spec is unusual; it is exactly what the rule
  * needs: the property being enforced ("these two files encode the
  * same formula, and a third file holds the independent gate") is a
  * property OF THE SOURCES, not of any runtime value.
  */
class OracleIndependenceSpec extends AnyFunSuite {

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)

  private val dedupSrc = read("src/main/scala/graft/operators/Dedup.scala")
  private val oracleSrc = read("src/main/scala/graft/queries/LlmQueries.scala")
  private val opSpecSrc = read("src/test/scala/graft/OperatorSpec.scala")

  // the engine's prefix rule: ceil((lit(threshold) - lit(ε)) * col("sz"))
  private val enginePat =
    """ceil\(\(lit\(threshold\) - lit\(([0-9.eE+-]+)\)\) \* col\("sz"\)\)""".r
  // the oracle replays: ceil((t - ε) * sz)
  private val oraclePat = """ceil\(\(([0-9.]+) - ([0-9.]+)\) \* sz\)""".r

  test("engine prefix rule: both pair miners carry the same ε slack") {
    val eps = enginePat.findAllMatchIn(dedupSrc).map(_.group(1)).toSeq
    assert(eps.size == 2,
      s"expected the ε-slack prefix rule at exactly 2 engine sites " +
        s"(ngramJaccardPairsPlan + containmentPairsPlan), found ${eps.size} — " +
        "if a site was added/removed, update this spec AND the oracle replays")
    assert(eps.distinct.size == 1, s"engine sites disagree on ε: $eps")
    assert(eps.head.toDouble == 1e-4, s"engine ε changed to ${eps.head} — " +
      "the q33/q148/q149 oracle replays and the scaladoc notes must move in lockstep")
  }

  test("oracle replays: q33/q148/q149 prefix rules match the engine formula") {
    val sites = oraclePat.findAllMatchIn(oracleSrc)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    // q33 (t=0.5), q148 (t=0.8), q149 truth side (t=0.5)
    assert(sites.sorted == Seq((0.5, 1e-4), (0.5, 1e-4), (0.8, 1e-4)).sorted,
      s"oracle prefix-rule sites diverged from the engine's (t, ε=1e-4) " +
        s"pairs — found $sites. A lockstep edit must change BOTH files " +
        "and keep the brute-force property tests as the recall gate")
  }

  test("the independent brute-force recall gates exist") {
    // the oracle cannot gate the shared prefix rule; these can — their
    // ground truth is an unfiltered all-pairs join
    val gates = Seq(
      "ngramJaccardPairs property: random corpora x thresholds x shingle sizes match brute force",
      "containmentPairs property: random corpora x thresholds x shingle sizes match brute force",
      "containmentPairs prefix filter loses NOTHING vs brute force")
    gates.foreach { g =>
      assert(opSpecSrc.contains(g),
        s"independent recall gate missing from OperatorSpec: \"$g\" — " +
          "without it the lockstep prefix rule has NO oracle at all")
    }
  }
}
