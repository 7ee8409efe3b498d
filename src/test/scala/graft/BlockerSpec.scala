package graft

import graft.blockers._
import graft.core.{Blocks, EntityFrame}

/** Golden-block tests on the reference's conftest fixtures
  * (reference tests/test_blockers.py:67-144). TokenBlocker goldens are
  * recomputed for our pinned regex tokenizer (SURVEY.md F1: NLTK-Punkt
  * parity is out of contract — dates split into number tokens, min
  * length 3 then applies to the parts). */
class BlockerSpec extends SparkSpec {

  test("StandardBlocker golden (test_blockers.py:67-73)") {
    val got = StandardBlocker("BirthCountry").assign(tableA, tableB)
    assertBlocksEqual(got, Map(
      "Bulgaria" -> (Set("a3"), Set("b3")),
      "USA" -> (Set("a1", "a2"), Set("b2"))))
  }

  test("StandardBlocker on triple frames matches wide result") {
    val got = StandardBlocker("BirthCountry")
      .assign(EntityFrame.unpivot(tableA), EntityFrame.unpivot(tableB))
    assertBlocksEqual(got, Map(
      "Bulgaria" -> (Set("a3"), Set("b3")),
      "USA" -> (Set("a1", "a2"), Set("b2"))))
  }

  test("QgramsBlocker golden (test_blockers.py:76-91)") {
    val got = QgramsBlocker("BirthCountry", 3).assign(tableA, tableB)
    assertBlocksEqual(got, Map(
      "USA" -> (Set("a1", "a2"), Set("b2")),
      "Bul" -> (Set("a3"), Set("b3")),
      "ulg" -> (Set("a3"), Set("b3")),
      "lga" -> (Set("a3"), Set("b3")),
      "gar" -> (Set("a3"), Set("b3")),
      "ari" -> (Set("a3"), Set("b3")),
      "ria" -> (Set("a3"), Set("b3")),
      "Ind" -> (Set("a4"), Set("b4"))))
  }

  test("TokenBlocker golden (regex-tokenizer semantics)") {
    val got = TokenBlocker().assign(tableA, tableB)
    assertBlocksEqual(got, Map(
      "john" -> (Set("a1"), Set("b1")),
      "mcexample" -> (Set("a1"), Set("b1")),
      "1973" -> (Set("a1"), Set("b1")),
      "maggie" -> (Set("a2"), Set("b2")),
      "smith" -> (Set("a2", "a3"), Set("b2", "b3")),
      "1983" -> (Set("a2"), Set("b2")),
      "usa" -> (Set("a1", "a2"), Set("b2")),
      "rebecca" -> (Set("a3"), Set("b3")),
      "1990" -> (Set("a3", "a4"), Set("b3", "b4")),
      "bulgaria" -> (Set("a3"), Set("b3")),
      "nushi" -> (Set("a4"), Set("b5"))))
  }

  test("TokenBlocker triple input matches wide input") {
    val wide = blockMap(TokenBlocker().assign(tableA, tableB))
    val trip = blockMap(TokenBlocker()
      .assign(EntityFrame.unpivot(tableA), EntityFrame.unpivot(tableB)))
    assert(trip == wide)
  }

  test("TokenBlocker maxBlockComparisons drops only oversized blocks") {
    val full = blockMap(TokenBlocker().assign(tableA, tableB))
    val capped = blockMap(TokenBlocker(maxBlockComparisons = 2)
      .assign(tableA, tableB))
    val oversize = full.filter { case (_, (l, r)) => l.size.toLong * r.size > 2 }
    assert(capped == full -- oversize.keys)
    assert(oversize.keySet == Set("smith", "1990"))
  }

  test("UniqueNameBlocker golden (token_blocking.py:168-204 semantics)") {
    val got = UniqueNameBlocker().assign(tableA, tableB)
    assertBlocksEqual(got, Map(
      "11-12-1973" -> (Set("a1"), Set("b1")),
      "02-02-1983" -> (Set("a2"), Set("b2")),
      "Bulgaria" -> (Set("a3"), Set("b3"))))
  }

  test("blocker output round-trips parquet (test_blockers.py:132-135)") {
    val got = TokenBlocker().assign(tableA, tableB)
    val dir = java.nio.file.Files.createTempDirectory("blocks").toString + "/b"
    got.write(dir, "A", "B")
    val back = Blocks.read(spark, dir)
    assert(blockMap(back) == blockMap(got))
  }
}
