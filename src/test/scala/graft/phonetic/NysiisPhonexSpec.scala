package graft.phonetic

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from /root/reference/src/nysiis.rs:245-423. */
class NysiisSpec extends AnyFunSuite {
  private val strictN = Nysiis.default
  private val laxN = Nysiis.nonStrict

  private def strictAll(expected: String, vs: String*): Unit =
    vs.foreach(v => assert(strictN.encode(v) == expected, s"encode($v)"))

  private def lax(pairs: (String, String)*): Unit =
    pairs.foreach { case (v, e) => assert(laxN.encode(v) == e, s"encode($v)") }

  test("equivalence classes") {
    strictAll("BRAN", "Brian", "Brown", "Brun")
    strictAll("CAP", "Capp", "Cope", "Copp", "Kipp")
    strictAll("DAD", "Dent")
    strictAll("DAN", "Dane", "Dean", "Dionne")
    strictAll("FAL", "Phil")
    strictAll("SNAD", "Schmidt")
    strictAll("SNAT", "Smith", "Schmit")
    strictAll("TRANAN", "Trueman", "Truman")
  }

  test("drop by") {
    lax(
      "MACINTOSH" -> "MCANT", "KNUTH" -> "NAT", "KOEHN" -> "CAN",
      "PHILLIPSON" -> "FALAPSAN", "PFEISTER" -> "FASTAR",
      "SCHOENHOEFT" -> "SANAFT", "MCKEE" -> "MCY", "MACKIE" -> "MCY",
      "HEITSCHMIDT" -> "HATSNAD", "BART" -> "BAD", "HURD" -> "HAD",
      "HUNT" -> "HAD", "WESTERLUND" -> "WASTARLAD", "CASSTEVENS" -> "CASTAFAN",
      "VASQUEZ" -> "VASG", "FRAZIER" -> "FRASAR", "BOWMAN" -> "BANAN",
      "MCKNIGHT" -> "MCNAGT", "RICKERT" -> "RACAD", "DEUTSCH" -> "DAT",
      "WESTPHAL" -> "WASTFAL", "SHRIVER" -> "SRAVAR", "KUHL" -> "CAL",
      "RAWSON" -> "RASAN", "JILES" -> "JAL", "CARRAWAY" -> "CARY",
      "YAMADA" -> "YANAD")
  }

  test("others") {
    lax("O'Daniel" -> "ODANAL", "O'Donnel" -> "ODANAL", "Cory" -> "CARY",
      "Corey" -> "CARY", "Kory" -> "CARY", "FUZZY" -> "FASY")
  }

  test("per-rule") {
    lax("MACX" -> "MCX", "KNX" -> "NX", "KX" -> "CX", "PHX" -> "FX",
      "PFX" -> "FX", "SCHX" -> "SX")
    lax("XEE" -> "XY", "XIE" -> "XY", "XDT" -> "XD", "XRT" -> "XD",
      "XRD" -> "XD", "XNT" -> "XD", "XND" -> "XD")
    lax("XEV" -> "XAF", "XAX" -> "XAX", "XEX" -> "XAX", "XIX" -> "XAX",
      "XOX" -> "XAX", "XUX" -> "XAX")
    lax("XQ" -> "XG", "XZ" -> "X", "XM" -> "XN")
    lax("XS" -> "X", "XSS" -> "X")
    lax("XAY" -> "XY", "XAYS" -> "XY")
    lax("XA" -> "X", "XAS" -> "X")
  }

  test("special branches") {
    strictAll("CABWAC", "Kobwick")
    strictAll("CACAR", "Kocher")
    strictAll("FASC", "Fesca")
    strictAll("SAN", "Shom")
    strictAll("OL", "Ohlo")
    strictAll("UH", "Uhu")
    strictAll("UN", "Um")
  }

  test("strict truncation") {
    assert(strictN.encode("WESTERLUND") == "WASTAR")
  }
}

/** Golden vectors from /root/reference/src/phonex.rs:275-396. */
class PhonexSpec extends AnyFunSuite {
  private val px = Phonex.default

  test("preprocess") {
    assert(px.preprocess("TESTSSS") == "TEST")
    assert(px.preprocess("SSS") == "")
    assert(px.preprocess("KNUTH") == "NNUTH")
    assert(px.preprocess("PHONETIC") == "FHONETIC")
    assert(px.preprocess("WRIGHT") == "RRIGHT")
    assert(px.preprocess("HARRINGTON") == "ARRINGTON")
    assert(px.preprocess("EIGER") == "AIGER")
    assert(px.preprocess("PERCIVAL") == "BERCIVAL")
    assert(px.preprocess("VERTIGAN") == "FERTIGAN")
    assert(px.preprocess("KELVIN") == "CELVIN")
    assert(px.preprocess("JONES") == "GONE")
    assert(px.preprocess("ZEPHYR") == "SEPHYR")
  }

  test("transcode") {
    assert(px.transcode('B', None, isLastChar = false) == (Some('1'), false))
    assert(px.transcode('D', Some('C'), isLastChar = false) == (None, false))
    assert(px.transcode('L', Some('A'), isLastChar = false) == (Some('4'), false))
    assert(px.transcode('L', Some('B'), isLastChar = true) == (Some('4'), false))
    assert(px.transcode('L', Some('B'), isLastChar = false) == (None, false))
    assert(px.transcode('M', Some('D'), isLastChar = false) == (Some('5'), true))
    assert(px.transcode('M', Some('G'), isLastChar = false) == (Some('5'), true))
    assert(px.transcode('R', Some('A'), isLastChar = false) == (Some('6'), false))
    assert(px.transcode('R', None, isLastChar = true) == (Some('6'), false))
  }

  test("encode") {
    val vectors = Seq(
      "123 testsss" -> "T230", "24/7 test" -> "T230", "A" -> "A000",
      "Ashcraft" -> "A261", "Lee" -> "L000", "Kuhne" -> "C500",
      "Meyer-Lansky" -> "M452", "Oepping" -> "A150", "Daley" -> "D400",
      "Dalitz" -> "D432", "Duhlitz" -> "D432", "Dull" -> "D400",
      "De Ledes" -> "D430", "Sandemann" -> "S500", "Schmidt" -> "S530",
      "Sinatra" -> "S536", "Heinrich" -> "A562", "Hammerschlag" -> "A524",
      "Williams" -> "W450", "Wilms" -> "W500", "Wilson" -> "W250",
      "Worms" -> "W500", "Zedlitz" -> "S343", "Zotteldecke" -> "S320",
      "ZYX test" -> "S232", "Scherman" -> "S500", "Schurman" -> "S500",
      "Sherman" -> "S500", "Shermansss" -> "S500", "Shireman" -> "S650",
      "Shurman" -> "S500", "Euler" -> "A460", "Ellery" -> "A460",
      "Hilbert" -> "A130", "Heilbronn" -> "A165", "Gauss" -> "G000",
      "Ghosh" -> "G200", "Knuth" -> "N300", "Kant" -> "C530",
      "Lloyd" -> "L430", "Ladd" -> "L300", "Lukasiewicz" -> "L200",
      "Lissajous" -> "L200", "Philip" -> "F410", "Fripp" -> "F610",
      "Czarkowska" -> "C200", "Hornblower" -> "A514", "Looser" -> "L260",
      "Wright" -> "R623", "Phonic" -> "F520", "Quickening" -> "C250",
      "Kuickening" -> "C250", "Joben" -> "G150", "Zelda" -> "S300")
    vectors.foreach { case (v, e) =>
      assert(px.encode(v) == e, s"encode($v)")
    }
    assert(px.encode("123456789") == "0000")
    assert(px.encode("") == "0000")
  }
}
