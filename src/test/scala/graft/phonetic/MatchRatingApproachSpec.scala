package graft.phonetic

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from /root/reference/src/match_rating_approach.rs:230-757. */
class MatchRatingApproachSpec extends AnyFunSuite {
  private val mra = MatchRatingApproach

  test("accent removal") {
    assert(mra.cleanName("áéíóú") == "AEIOU")
    assert(mra.cleanName("This-ís   a t.,es &t") == "THISISATEST")
  }

  test("double consonants") {
    assert(mra.removeDoubleConsonants("BUBBLE") == "BUBLE")
    assert(mra.removeDoubleConsonants("MISSISSIPPI") == "MISISIPI")
    assert(mra.removeDoubleConsonants("BEETLE") == "BEETLE")
    assert(mra.removeDoubleConsonants("BBB") == "BB")
  }

  test("remove vowels") {
    assert(mra.removeVowels("ALESSANDRA") == "ALSSNDR")
    assert(mra.removeVowels("AIDAN") == "ADN")
    assert(mra.removeVowels("DECLAN") == "DCLN")
  }

  test("first3 last3") {
    assert(mra.firstThreeLastThree("Alexzander") == "Aleder")
    assert(mra.firstThreeLastThree("PETE") == "PETE")
  }

  test("left-to-right rating") {
    assert(mra.leftRightRating("ALEXANDER", "ALEXANDRA") == 4)
    assert(mra.leftRightRating("EINSTEIN", "MICHAELA") == 0)
  }

  test("minimum rating") {
    assert(mra.minimumRating(1) == 5)
    assert(mra.minimumRating(2) == 5)
    assert(mra.minimumRating(5) == 4)
    assert(mra.minimumRating(6) == 4)
    assert(mra.minimumRating(7) == 4)
    assert(mra.minimumRating(8) == 3)
    assert(mra.minimumRating(10) == 3)
    assert(mra.minimumRating(13) == 1)
  }

  test("encode") {
    assert(mra.encode("HARPER") == "HRPR")
    assert(mra.encode("Smith") == "SMTH")
    assert(mra.encode("Smyth") == "SMYTH")
    assert(mra.encode(" ") == "")
    assert(mra.encode("") == "")
    assert(mra.encode("E") == "")
  }

  test("corner cases no match") {
    assert(!mra.isEncodedEquals("test", ""))
    assert(!mra.isEncodedEquals("", "test"))
    assert(!mra.isEncodedEquals("test", " "))
    assert(!mra.isEncodedEquals(" ", "test"))
    assert(!mra.isEncodedEquals("t", "test"))
    assert(!mra.isEncodedEquals("test", "t"))
    assert(!mra.isEncodedEquals("Al", "Ed"))
    assert(!mra.isEncodedEquals("Karl", "C"))
    assert(!mra.isEncodedEquals("Karl", "Alessandro"))
    assert(!mra.isEncodedEquals("Úna", "Oonagh"))
    assert(!mra.isEncodedEquals("Moriarty", "OMuircheartaigh"))
    assert(!mra.isEncodedEquals("Murphy", " "))
    assert(!mra.isEncodedEquals("Murphy", ""))
    assert(!mra.isEncodedEquals("Murphy", "Lynch"))
    assert(!mra.isEncodedEquals("Sean", "Pete"))
  }

  test("matches") {
    assert(mra.isEncodedEquals("John", "John"))
    assert(mra.isEncodedEquals("smith", "smyth"))
    assert(mra.isEncodedEquals("Burns", "Bourne"))
    assert(mra.isEncodedEquals("Catherine", "Kathryn"))
    assert(mra.isEncodedEquals("Brian", "Bryan"))
    assert(mra.isEncodedEquals("Séan", "Shaun"))
    assert(mra.isEncodedEquals("Cólm", "C-olín"))
    assert(mra.isEncodedEquals("Stephen", "Steven"))
    assert(mra.isEncodedEquals("Steven", "Stefan"))
    assert(mra.isEncodedEquals("Stephen", "Stefan"))
    assert(mra.isEncodedEquals("Sam", "Samuel"))
    assert(mra.isEncodedEquals("Micky", "Michael"))
    assert(mra.isEncodedEquals("Oona", "Oonagh"))
    assert(mra.isEncodedEquals("Sophie", "Sofia"))
    assert(mra.isEncodedEquals("Franciszek", "Frances"))
    assert(mra.isEncodedEquals("Tomasz", "tom"))
    assert(mra.isEncodedEquals("Kl", "Karl"))
    assert(mra.isEncodedEquals("Zach", "Zacharia"))
    assert(mra.isEncodedEquals("O'Sullivan", "Ó ' Súilleabháin"))
    assert(mra.isEncodedEquals("o'muireadhaigh", "Ó 'Muircheartaigh "))
    assert(mra.isEncodedEquals("Cooper-Flynn", "Super-Lyn"))
    assert(mra.isEncodedEquals("Hailey", "Halley"))
    assert(mra.isEncodedEquals("Auerbach", "Uhrbach"))
    assert(mra.isEncodedEquals("Moskowitz", "Moskovitz"))
    assert(mra.isEncodedEquals("LIPSHITZ", "LIPPSZYC"))
    assert(mra.isEncodedEquals("LEWINSKY", "LEVINSKI"))
    assert(mra.isEncodedEquals("SZLAMAWICZ", "SHLAMOVITZ"))
    assert(
      mra.isEncodedEquals("R o s o ch o w a c ie c", " R o s o k ho v a ts e ts"))
    assert(mra.isEncodedEquals(" P rz e m y s l", " P sh e m e sh i l"))
    assert(mra.isEncodedEquals("Peterson", "Peters"))
    assert(mra.isEncodedEquals("McGowan", "Mc Geoghegan"))
    assert(mra.isEncodedEquals("Sean", "John"))
  }
}
