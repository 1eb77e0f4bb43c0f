package graft.tools

/** Doc-count synchronizer (VERDICT r11 ask #5: three rounds of
  * COVERAGE.md/README/test-report count drift, automated away).
  *
  * `runMain graft.tools.DocSync [roundLabel]` rewrites, in place:
  *  - COVERAGE.md / README.md: every `N of N oracle-backed` claim to
  *    the actual registry size (`SparkEntry.queries.size` — no session
  *    needed, the registry is a static map);
  *  - COVERAGE.md: the `N unit tests` claim to the sum of the fresh
  *    ScalaTest XML report totals under `target/test-reports` (run
  *    AFTER `sbt test` so the reports reflect the run being claimed).
  *
  * [[graft.DocCountsSpec]] is the enforcement half: `sbt test` fails
  * when the registry-size claims drift (the test-count claim is synced
  * by this tool rather than asserted in-run — a spec executing in the
  * middle of the very test run it would count can only see stale
  * totals). */
object DocSync {

  private[tools] def reportedTests(dir: java.io.File): Option[Int] = {
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".xml"))
    // STALE-MIX guard: sbt clears target/test-reports at the start of
    // every test task, so after a `testOnly` the directory holds only
    // that subset's suites — summing it would under-claim. Only trust
    // a report set that covers (at least) every *Spec.scala source.
    // −1: exactly ONE *Spec.scala source is a trait/base (SparkSpec)
    // and emits no report file — subtracting more lets a report set
    // missing a whole suite (an init-aborted suite writes no XML) pass
    // as full and under-claim the test count; a genuine testOnly
    // leftover set is far below this either way
    val suites = Option(new java.io.File("src/test/scala/graft").listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith("Spec.scala")) - 1
    if (files.isEmpty || files.length < suites) {
      if (files.nonEmpty) println(
        s"[docsync] test reports cover ${files.length} of $suites suites " +
          "(testOnly leftovers?) — test-count claim left untouched; run after a FULL `sbt test`")
      None
    } else {
      // MIXED-RUN guard (r19): a `testOnly X -- -z pattern` run
      // OVERWRITES suite X's XML with only the filtered tests while
      // leaving every other suite's full-run file in place — the file
      // COUNT looks complete but the sum under-claims (observed: 433
      // vs the true 477 after a -z run rewrote one suite to tests=1).
      // One `sbt test` writes all files within its own run window, so
      // a modification-time spread wider than a full sequential run
      // (generously, one hour) means the set mixes runs — refuse it.
      val mtimes = files.map(_.lastModified)
      val spreadMs = mtimes.max - mtimes.min
      if (spreadMs > 60L * 60 * 1000) {
        println(f"[docsync] test reports span ${spreadMs / 60000.0}%.0f min " +
          "of mtimes (mixed testOnly/full runs?) — test-count claim left " +
          "untouched; run after a FULL `sbt test`")
        None
      } else Some(files.map { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try """tests="(\d+)"""".r.findFirstMatchIn(src.mkString)
          .map(_.group(1).toInt).getOrElse(0)
        finally src.close()
      }.sum)
    }
  }

  private def rewrite(path: String)(f: String => String): Unit = {
    val p = java.nio.file.Paths.get(path)
    val before = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val after = f(before)
    if (after != before) {
      java.nio.file.Files.write(p, after.getBytes("UTF-8"))
      println(s"[docsync] updated $path")
    } else println(s"[docsync] $path already in sync")
  }

  def main(args: Array[String]): Unit = {
    val round = args.headOption
    val n = graft.SparkEntry.queries.size
    val tests = reportedTests(new java.io.File("target/test-reports"))
    rewrite("COVERAGE.md") { c =>
      val c1 = c.replaceAll("""\d+ of \d+ oracle-backed""", s"$n of $n oracle-backed")
      val c2 = round.fold(c1)(r => c1.replaceFirst(
        """oracle-backed as of round \d+""", s"oracle-backed as of round $r"))
      tests.fold(c2)(t => c2.replaceFirst("""\d+ unit tests""", s"$t unit tests"))
    }
    rewrite("README.md")(
      _.replaceAll("""\d+ of \d+ oracle-backed""", s"$n of $n oracle-backed"))
    println(s"[docsync] registry=$n reportedTests=${tests.getOrElse(-1)}")
  }
}
