package graft.phonetic

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from /root/reference/src/daitch_mokotoff.rs:1560-1783. */
class DaitchMokotoffSpec extends AnyFunSuite {
  private val dm = DaitchMokotoff.default

  test("malformed rules rejected") {
    intercept[IllegalArgumentException] {
      DaitchMokotoff.parseRules("This is wrong.")
    }
  }

  test("accented character folding") {
    assert(dm.soundex("Straßburg") == "294795")
    assert(dm.soundex("Strasburg") == "294795")
    assert(dm.soundex("Éregon") == "095600")
    assert(dm.soundex("Eregon") == "095600")
  }

  test("adjacent codes") {
    assert(dm.soundex("AKSSOL") == "054800")
    assert(dm.soundex("GERSCHFELD") == "547830|545783|594783|594578")
  }

  test("encode basic") {
    assert(dm.encode("AUERBACH") == "097400")
    assert(dm.encode("OHRBACH") == "097400")
    assert(dm.encode("LIPSHITZ") == "874400")
    assert(dm.encode("LIPPSZYC") == "874400")
    assert(dm.encode("LEWINSKY") == "876450")
    assert(dm.encode("LEVINSKI") == "876450")
    assert(dm.encode("SZLAMAWICZ") == "486740")
    assert(dm.encode("SHLAMOVITZ") == "486740")
  }

  test("ignore apostrophes/hyphens/trim") {
    Seq("OBrien", "'OBrien", "O'Brien", "OB'rien", "OBr'ien", "OBri'en",
      "OBrie'n", "OBrien'").foreach(v => assert(dm.encode(v) == "079600", v))
    Seq("KINGSMITH", "-KINGSMITH", "K-INGSMITH", "KI-NGSMITH", "KIN-GSMITH",
      "KING-SMITH", "KINGS-MITH", "KINGSM-ITH", "KINGSMI-TH", "KINGSMIT-H",
      "KINGSMITH-").foreach(v => assert(dm.encode(v) == "565463", v))
    assert(dm.encode(" \t\n\r Washington \t\n\r ") == "746536")
  }

  test("soundex basic") {
    assert(dm.soundex("GOLDEN") == "583600")
    assert(dm.soundex("Alpert") == "087930")
    assert(dm.soundex("Breuer") == "791900")
    assert(dm.soundex("Haber") == "579000")
    assert(dm.soundex("Mannheim") == "665600")
    assert(dm.soundex("Mintz") == "664000")
    assert(dm.soundex("Topf") == "370000")
    assert(dm.soundex("Kleinmann") == "586660")
    assert(dm.soundex("Ben Aron") == "769600")
    assert(dm.soundex("AUERBACH") == "097400|097500")
    assert(dm.soundex("OHRBACH") == "097400|097500")
    assert(dm.soundex("LIPSHITZ") == "874400")
    assert(dm.soundex("LIPPSZYC") == "874400|874500")
    assert(dm.soundex("LEWINSKY") == "876450")
    assert(dm.soundex("LEVINSKI") == "876450")
    assert(dm.soundex("SZLAMAWICZ") == "486740")
    assert(dm.soundex("SHLAMOVITZ") == "486740")
  }

  test("soundex basic2") {
    assert(dm.soundex("Ceniow") == "467000|567000")
    assert(dm.soundex("Tsenyuv") == "467000")
    assert(dm.soundex("Holubica") == "587400|587500")
    assert(dm.soundex("Golubitsa") == "587400")
    assert(dm.soundex("Przemysl") == "746480|794648")
    assert(dm.soundex("Pshemeshil") == "746480")
    assert(dm.soundex("Rosochowaciec") ==
      "944744|944745|944754|944755|945744|945745|945754|945755")
    assert(dm.soundex("Rosokhovatsets") == "945744")
  }

  test("soundex basic3") {
    assert(dm.soundex("Peters") == "734000|739400")
    assert(dm.soundex("Peterson") == "734600|739460")
    assert(dm.soundex("Moskowitz") == "645740")
    assert(dm.soundex("Moskovitz") == "645740")
    assert(dm.soundex("Jackson") == "154600|145460|454600|445460")
    assert(dm.soundex("Jackson-Jackson") ==
      "154654|154645|154644|145465|145464|454654|454645|454644|445465|445464")
  }

  test("special romanian characters") {
    assert(dm.soundex("ţamas") == "364000|464000")
    assert(dm.soundex("țamas") == "364000|464000")
  }
}
