package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-count drift gate (VERDICT r11 ask #5): `sbt test` fails when the
  * registry-size claims in COVERAGE.md / README.md disagree with the
  * actual `SparkEntry.queries` registry, or when any registered query
  * lacks its oracle. The unit-test-count claim is synced by
  * `runMain graft.tools.DocSync` after a test run (a spec cannot count
  * the run it is part of) — this spec only requires the claim to be
  * present so the sync has a stable anchor. */
class DocCountsSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  test("every registered query is oracle-backed (full-coverage invariant)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("COVERAGE.md and README.md registry counts match the registry") {
    val n = SparkEntry.queries.size
    val claim = """(\d+) of (\d+) oracle-backed""".r
    for (doc <- Seq("COVERAGE.md", "README.md")) {
      val ms = claim.findAllMatchIn(read(doc)).toSeq
      assert(ms.nonEmpty, s"$doc: no 'N of N oracle-backed' claim found")
      ms.foreach { m =>
        assert(m.group(1).toInt === n && m.group(2).toInt === n,
          s"$doc claims '${m.matched}' but the registry holds $n queries — " +
            "run `sbt \"runMain graft.tools.DocSync\"`")
      }
    }
  }

  test("COVERAGE.md carries a unit-test-count anchor for DocSync") {
    assert("""\d+ unit tests""".r.findFirstIn(read("COVERAGE.md")).nonEmpty,
      "COVERAGE.md must state 'N unit tests' (DocSync's rewrite anchor)")
  }
}
