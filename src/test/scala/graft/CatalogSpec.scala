package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps docs/OPERATORS.md and the query registry in lockstep — the
  * CI-diff half of the generated operator catalog. */
class CatalogSpec extends AnyFunSuite {

  private def registryNames: Set[String] =
    Catalog.modules.flatMap(_._2.keys).toSet

  test("catalog modules cover exactly the driver registry") {
    assert(registryNames == SparkEntry.queries.keySet,
      s"module maps out of sync with SparkEntry: only-modules=" +
        s"${(registryNames -- SparkEntry.queries.keySet).toSeq.sorted}, " +
        s"only-registry=${(SparkEntry.queries.keySet -- registryNames).toSeq.sorted}")
  }

  test("every registered query has a catalog entry, and no orphans") {
    val missing = (registryNames -- Catalog.entries.keySet).toSeq.sorted
    val orphans = (Catalog.entries.keySet -- registryNames).toSeq.sorted
    assert(missing.isEmpty && orphans.isEmpty,
      s"catalog entries drifted: missing=$missing orphans=$orphans")
  }

  test("docs/OPERATORS.md matches the generated catalog") {
    val path = java.nio.file.Paths.get("docs/OPERATORS.md")
    assert(java.nio.file.Files.exists(path),
      "docs/OPERATORS.md missing — run `sbt 'runMain graft.Catalog'`")
    val onDisk = java.nio.file.Files.readString(path)
    assert(onDisk == Catalog.render(),
      "docs/OPERATORS.md is stale — regenerate with `sbt 'runMain graft.Catalog'`")
  }
}
