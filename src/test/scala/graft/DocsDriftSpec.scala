package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Docs can silently drift from the code; these guards fail the build when
  * they do. (A previous round shipped a README claiming a stale query
  * count — cheap to assert, annoying to re-audit by hand.)
  */
class DocsDriftSpec extends AnyFunSuite {

  test("README's claimed oracle-query count matches SparkEntry.queries") {
    val readme = Files.readString(Paths.get("README.md"))
    val m = raw"All (\d+)\s+queries carry oracles".r.findFirstMatchIn(readme)
    assert(m.isDefined,
      "README.md no longer contains the 'All N queries carry oracles' sentence " +
        "this guard pins — update the guard alongside the wording")
    assert(m.get.group(1).toInt === SparkEntry.queries.size,
      s"README claims ${m.get.group(1)} oracle queries but SparkEntry declares " +
        s"${SparkEntry.queries.size} — update README.md")
  }

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("README documents the fielded phrase/proximity two-index recipe " +
      "(fielded indexes store no positions - the documented pairing IS the " +
      "supported path, so its doc must not drift away)") {
    val readme = Files.readString(Paths.get("README.md"))
    assert(readme.contains("two-index recipe"),
      "README.md lost the 'two-index recipe' section for phrase/proximity " +
        "on fielded corpora")
    for (term <- Seq("bm25fProbe", "phraseTopK", "proximityTopK"))
      assert(readme.contains(term),
        s"the two-index recipe must name $term so a fielded-index user " +
          "finds the right probe face")
  }

  test("README's claimed bench-subset size matches SparkEntry.benchQueries") {
    val readme = Files.readString(Paths.get("README.md"))
    val m = raw"a (\d+)-query headline subset".r.findFirstMatchIn(readme)
    assert(m.isDefined,
      "README.md no longer contains the 'N-query headline subset' sentence " +
        "this guard pins — update the guard alongside the wording")
    assert(m.get.group(1).toInt === SparkEntry.benchQueries.size,
      s"README claims a ${m.get.group(1)}-query bench subset but SparkEntry declares " +
        s"${SparkEntry.benchQueries.size} — update README.md")
  }
}
