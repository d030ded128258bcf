package graft.phonetic

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Golden vectors from /root/reference/src/double_metaphone.rs:1040-3512,
  * incl. the 1221-row (word, primary, alternate) table at :2234-3457.
  */
class DoubleMetaphoneSpec extends AnyFunSuite {
  private val dm = DoubleMetaphone.default

  test("golden table (1221 rows)") {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/double_metaphone_golden.tsv"), "UTF-8")
    val rows =
      try src.getLines().map(_.split("\t", -1)).toVector
      finally src.close()
    assert(rows.size == 1221)
    var failures = List.empty[String]
    rows.foreach { case Array(word, primary, alternate) =>
      val r = dm.doubleMetaphone(word)
      if (r.primary != primary || r.alternate != alternate)
        failures ::=
          s"$word: got (${r.primary}, ${r.alternate}) want ($primary, $alternate)"
    }
    assert(failures.isEmpty, failures.take(20).mkString("\n"))
  }

  test("basic") {
    def check(expected: String, word: String): Unit = {
      assert(dm.encode(word) == expected, word)
      assert(dm.isDoubleMetaphoneEqual(word, word, alternate = false))
      assert(dm.isDoubleMetaphoneEqual(word, word, alternate = true))
    }
    check("TSTN", "testing")
    check("0", "The")
    check("KK", "quick")
    check("PRN", "brown")
    check("FKS", "fox")
    check("JMPT", "jumped")
    check("AFR", "over")
    check("0", "the")
    check("LS", "lazy")
    assert(!dm.isDoubleMetaphoneEqual("Brain", "Band", alternate = false))
    assert(!dm.isDoubleMetaphoneEqual("Brain", "Band", alternate = true))
  }

  test("c cedilla / n tilde") {
    assert(dm.encode("ç") == dm.encode("S"))
    assert(dm.encode("ñ") == dm.encode("N"))
  }

  test("empty (codec184)") {
    assert(dm.isDoubleMetaphoneEqual("", "", alternate = false))
    assert(dm.isDoubleMetaphoneEqual("", "", alternate = true))
    assert(!dm.isDoubleMetaphoneEqual("aa", "", alternate = false))
    assert(!dm.isDoubleMetaphoneEqual("aa", "", alternate = true))
  }

  test("max code length") {
    assert(dm.encode("jumped") == "JMPT")
    assert(dm.encodeAlternate("jumped") == "AMPT")
    val dm3 = DoubleMetaphone(Some(3))
    assert(dm3.encode("jumped") == "JMP")
    assert(dm3.encodeAlternate("jumped") == "AMP")
  }

  test("overflow contains") {
    assert(dm.encodeAlternate("LLANA") == "LN")
    assert(dm.encodeAlternate("CCILE") == "XL")
  }

  test("unbounded") {
    val u = DoubleMetaphone.unbounded
    assert(u.encode("ALLERTON") == "ALRTN")
    assert(u.encodeAlternate("ALLERTON") == "ALRTN")
    assert(u.encode("synchronization") == "SNXRNSXN")
    assert(u.encodeAlternate("synchronization") == "SNKRNSXN")
  }
}
