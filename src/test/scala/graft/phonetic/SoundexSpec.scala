package graft.phonetic

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from /root/reference/src/soundex.rs:279-517 (ported from
  * Apache commons-codec 1.15).
  */
class SoundexSpec extends AnyFunSuite {
  private val sx = Soundex.default

  private def checkAll(expected: String, data: String*): Unit =
    data.foreach(v => assert(sx.encode(v) == expected, s"encode($v)"))

  test("b650 equivalence class") {
    checkAll(
      "B650",
      "BARHAM", "BARONE", "BARRON", "BERNA", "BIRNEY", "BIRNIE", "BOOROM",
      "BOREN", "BORN", "BOURN", "BOURNE", "BOWRON", "BRAIN", "BRAME", "BRANN",
      "BRAUN", "BREEN", "BRIEN", "BRIM", "BRIMM", "BRINN", "BRION", "BROOM",
      "BROOME", "BROWN", "BROWNE", "BRUEN", "BRUHN", "BRUIN", "BRUMM", "BRUN",
      "BRUNO", "BRYAN", "BURIAN", "BURN", "BURNEY", "BYRAM", "BYRNE", "BYRON",
      "BYRUM")
  }

  test("bad characters") { assert(sx.encode("HOL>MES") == "H452") }

  test("difference") {
    assert(sx.difference(" ", " ") == 0)
    assert(sx.difference("Smith", "Smythe") == 4)
    assert(sx.difference("Ann", "Andrew") == 2)
    assert(sx.difference("Margaret", "Andrew") == 1)
    assert(sx.difference("Janet", "Margaret") == 0)
    assert(sx.difference("Green", "Greene") == 4)
    assert(sx.difference("Blotchet-Halls", "Greene") == 0)
    assert(sx.difference("Smithers", "Smythers") == 4)
    assert(sx.difference("Anothers", "Brothers") == 2)
  }

  test("encode basic") {
    assert(sx.encode("testing") == "T235")
    assert(sx.encode("The") == "T000")
    assert(sx.encode("quick") == "Q200")
    assert(sx.encode("brown") == "B650")
    assert(sx.encode("fox") == "F200")
    assert(sx.encode("jumped") == "J513")
    assert(sx.encode("over") == "O160")
    assert(sx.encode("lazy") == "L200")
    assert(sx.encode("dogs") == "D200")
  }

  test("encode batch2") {
    assert(sx.encode("Allricht") == "A462")
    assert(sx.encode("Eberhard") == "E166")
    assert(sx.encode("Engebrethson") == "E521")
    assert(sx.encode("Heimbach") == "H512")
    assert(sx.encode("Hanselmann") == "H524")
    assert(sx.encode("Hildebrand") == "H431")
    assert(sx.encode("Kavanagh") == "K152")
    assert(sx.encode("Lind") == "L530")
    assert(sx.encode("Lukaschowsky") == "L222")
    assert(sx.encode("McDonnell") == "M235")
    assert(sx.encode("McGee") == "M200")
    assert(sx.encode("Opnian") == "O155")
    assert(sx.encode("Oppenheimer") == "O155")
    assert(sx.encode("Riedemanas") == "R355")
    assert(sx.encode("Zita") == "Z300")
    assert(sx.encode("Zitzmeinn") == "Z325")
  }

  test("encode batch3/batch4") {
    assert(sx.encode("Washington") == "W252")
    assert(sx.encode("Lee") == "L000")
    assert(sx.encode("Gutierrez") == "G362")
    assert(sx.encode("Pfister") == "P236")
    assert(sx.encode("Jackson") == "J250")
    assert(sx.encode("Tymczak") == "T522")
    assert(sx.encode("VanDeusen") == "V532")
    assert(sx.encode("HOLMES") == "H452")
    assert(sx.encode("ADOMOMI") == "A355")
    assert(sx.encode("VONDERLEHR") == "V536")
    assert(sx.encode("BALL") == "B400")
    assert(sx.encode("SHAW") == "S000")
    assert(sx.encode("SCANLON") == "S545")
    assert(sx.encode("SAINTJOHN") == "S532")
  }

  test("ignore apostrophes and hyphens") {
    checkAll("O165", "OBrien", "'OBrien", "O'Brien", "OB'rien", "OBr'ien",
      "OBri'en", "OBrie'n", "OBrien'")
    checkAll("K525", "KINGSMITH", "-KINGSMITH", "K-INGSMITH", "KI-NGSMITH",
      "KIN-GSMITH", "KING-SMITH", "KINGS-MITH", "KINGSM-ITH", "KINGSMI-TH",
      "KINGSMIT-H", "KINGSMITH-")
  }

  test("ignore trimmable") {
    assert(sx.encode(" \t\n\r Washington \t\n\r ") == "W252")
  }

  test("HW rules") {
    assert(sx.encode("Ashcraft") == "A261")
    assert(sx.encode("Ashcroft") == "A261")
    assert(sx.encode("yehudit") == "Y330")
    assert(sx.encode("yhwdyt") == "Y330")
    assert(sx.encode("BOOTHDAVIS") == "B312")
    assert(sx.encode("BOOTH-DAVIS") == "B312")
    assert(sx.encode("Sgler") == "S460")
    assert(sx.encode("Swhgler") == "S460")
    checkAll("S460", "SAILOR", "SALYER", "SAYLOR", "SCHALLER", "SCHELLER",
      "SCHILLER", "SCHOOLER", "SCHULER", "SCHUYLER", "SEILER", "SEYLER",
      "SHOLAR", "SHULER", "SILAR", "SILER", "SILLER")
  }

  test("ms sql server") {
    assert(sx.encode("Smith") == "S530")
    assert(sx.encode("Smythe") == "S530")
    checkAll("E625", "Erickson", "Erikson", "Ericson", "Ericksen", "Ericsen")
    assert(sx.encode("Ann") == "A500")
    assert(sx.encode("Andrew") == "A536")
    assert(sx.encode("Janet") == "J530")
    assert(sx.encode("Margaret") == "M626")
    assert(sx.encode("Steven") == "S315")
    assert(sx.encode("Michael") == "M240")
    assert(sx.encode("Robert") == "R163")
    assert(sx.encode("Laura") == "L600")
    assert(sx.encode("Anne") == "A500")
  }

  test("wikipedia examples") {
    assert(sx.encode("Robert") == "R163")
    assert(sx.encode("Rupert") == "R163")
    assert(sx.encode("Tymczak") == "T522")
  }

  test("genealogy mapping") {
    val g = Soundex.genealogy
    assert(g.encode("Heggenburger") == "H251")
    assert(g.encode("Blackman") == "B425")
    assert(g.encode("Schmidt") == "S530")
    assert(g.encode("Lippmann") == "L150")
    assert(g.encode("Dodds") == "D200")
    assert(g.encode("Dhdds") == "D200")
    assert(g.encode("Dwdds") == "D200")
  }

  test("simplified soundex") {
    val s = Soundex.simplified
    assert(s.encode("WILLIAMS") == "W452")
    assert(s.encode("BARAGWANATH") == "B625")
    assert(s.encode("DONNELL") == "D540")
    assert(s.encode("LLOYD") == "L300")
    assert(s.encode("WOOLCOCK") == "W422")
    assert(s.encode("Dodds") == "D320")
    assert(s.encode("Dhdds") == "D320")
    assert(s.encode("Dwdds") == "D320")
  }

  test("custom mapping") {
    val s = Soundex.fromMapping("01360240043788015936020505")
    assert(s.encode("jumped") == "J816")
  }

  test("empty input") {
    assert(sx.encode("") == "")
    assert(sx.encode("   ") == "")
    assert(sx.encode("1234") == "")
  }
}

/** Golden vectors from /root/reference/src/refined_soundex.rs:194-226. */
class RefinedSoundexSpec extends AnyFunSuite {
  private val rs = RefinedSoundex.default

  test("difference") {
    assert(rs.difference("", "") == 0)
    assert(rs.difference(" ", " ") == 0)
    assert(rs.difference("Smith", "Smythe") == 6)
    assert(rs.difference("Ann", "Andrew") == 3)
    assert(rs.difference("Margaret", "Andrew") == 1)
    assert(rs.difference("Janet", "Margaret") == 1)
    assert(rs.difference("Green", "Greene") == 5)
    assert(rs.difference("Blotchet-Halls", "Greene") == 1)
    assert(rs.difference("Smithers", "Smythers") == 8)
    assert(rs.difference("Anothers", "Brothers") == 5)
  }

  test("encode") {
    assert(rs.encode("testing") == "T6036084")
    assert(rs.encode("TESTING") == "T6036084")
    assert(rs.encode("The") == "T60")
    assert(rs.encode("quick") == "Q503")
    assert(rs.encode("brown") == "B1908")
    assert(rs.encode("fox") == "F205")
    assert(rs.encode("jumped") == "J408106")
    assert(rs.encode("over") == "O0209")
    assert(rs.encode("the") == "T60")
    assert(rs.encode("lazy") == "L7050")
    assert(rs.encode("dogs") == "D6043")
  }
}
