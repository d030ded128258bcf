package graft.phonetic

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from /root/reference/src/metaphone.rs:298-692. */
class MetaphoneSpec extends AnyFunSuite {
  private val m = Metaphone.default

  private def eq(v1: String, data: String*): Unit =
    data.foreach(v2 =>
      assert(m.isEncodedEquals(v1, v2), s"$v1 should equal $v2"))

  test("equal basic") {
    eq("Case", "case"); eq("CASE", "Case"); eq("caSe", "cAsE")
    eq("quick", "cookie")
    eq("Lawrence", "Lorenza"); eq("Gary", "Cahra")
    eq("Aero", "Eure")
  }

  test("equal White") {
    eq("White", "Wade", "Wait", "Waite", "Wat", "Whit", "Wiatt", "Wit",
      "Wittie", "Witty", "Wood", "Woodie", "Woody")
  }

  test("equal Albert") {
    eq("Albert", "Ailbert", "Alberik", "Albert", "Alberto", "Albrecht")
  }

  test("equal Gary") {
    eq("Gary", "Cahra", "Cara", "Carey", "Cari", "Caria", "Carie", "Caro",
      "Carree", "Carri", "Carrie", "Carry", "Cary", "Cora", "Corey", "Cori",
      "Corie", "Correy", "Corri", "Corrie", "Corry", "Cory", "Gray", "Kara",
      "Kare", "Karee", "Kari", "Karia", "Karie", "Karrah", "Karrie", "Karry",
      "Kary", "Keri", "Kerri", "Kerrie", "Kerry", "Kira", "Kiri", "Kora",
      "Kore", "Kori", "Korie", "Korrie", "Korry")
  }

  test("equal John") {
    eq("John", "Gena", "Gene", "Genia", "Genna", "Genni", "Gennie", "Genny",
      "Giana", "Gianna", "Gina", "Ginni", "Ginnie", "Ginny", "Jaine", "Jan",
      "Jana", "Jane", "Janey", "Jania", "Janie", "Janna", "Jany", "Jayne",
      "Jean", "Jeana", "Jeane", "Jeanie", "Jeanna", "Jeanne", "Jeannie",
      "Jen", "Jena", "Jeni", "Jenn", "Jenna", "Jennee", "Jenni", "Jennie",
      "Jenny", "Jinny", "Jo Ann", "Jo-Ann", "Jo-Anne", "Joan", "Joana",
      "Joane", "Joanie", "Joann", "Joanna", "Joanne", "Joeann", "Johna",
      "Johnna", "Joni", "Jonie", "Juana", "June", "Junia", "Junie")
  }

  test("equal Knight") {
    eq("Knight", "Hynda", "Nada", "Nadia", "Nady", "Nat", "Nata", "Natty",
      "Neda", "Nedda", "Nedi", "Netta", "Netti", "Nettie", "Netty", "Nita",
      "Nydia")
  }

  test("equal Mary") {
    eq("Mary", "Mair", "Maire", "Mara", "Mareah", "Mari", "Maria", "Marie",
      "Mary", "Maura", "Maure", "Meara", "Merrie", "Merry", "Mira", "Moira",
      "Mora", "Moria", "Moyra", "Muire", "Myra", "Myrah")
  }

  test("equal Paris/Peter/Ray/Susan/Wright/Xalan") {
    eq("Paris", "Pearcy", "Perris", "Piercy", "Pierz", "Pryse")
    eq("Peter", "Peadar", "Peder", "Pedro", "Peter", "Petr", "Peyter",
      "Pieter", "Pietro", "Piotr")
    eq("Ray", "Ray", "Rey", "Roi", "Roy", "Ruy")
    eq("Susan", "Siusan", "Sosanna", "Susan", "Susana", "Susann", "Susanna",
      "Susannah", "Susanne", "Suzann", "Suzanna", "Suzanne", "Zuzana")
    eq("Wright", "Rota", "Rudd", "Ryde")
    eq("Xalan", "Celene", "Celina", "Celine", "Selena", "Selene", "Selina",
      "Seline", "Suellen", "Xylina")
  }

  test("encode table") {
    assert(m.encode("howl") == "HL")
    assert(m.encode("testing") == "TSTN")
    assert(m.encode("The") == "0")
    assert(m.encode("quick") == "KK")
    assert(m.encode("brown") == "BRN")
    assert(m.encode("fox") == "FKS")
    assert(m.encode("jumped") == "JMPT")
    assert(m.encode("over") == "OFR")
    assert(m.encode("the") == "0")
    assert(m.encode("lazy") == "LS")
    assert(m.encode("dogs") == "TKS")
  }

  test("rule cases") {
    assert(m.encode("COMB") == "KM")
    assert(m.encode("TOMB") == "TM")
    assert(m.encode("WOMB") == "WM")
    assert(m.encode("SCIENCE") == "SNS")
    assert(m.encode("SCENE") == "SN")
    assert(m.encode("SCY") == "S")
    assert(m.encode("WHY") == "")
    assert(m.encode("CIAPO") == "XP")
    assert(m.encode("SCHEDULE") == "SKTL")
    assert(m.encode("SCHEMATIC") == "SKMT")
    assert(m.encode("CHARACTER") == "KRKT")
    assert(m.encode("TEACH") == "TX")
    assert(m.encode("DODGY") == "TJ")
    assert(m.encode("DODGE") == "TJ")
    assert(m.encode("ADGIEMTI") == "AJMT")
    assert(m.encode("GHENT") == "KNT")
    assert(m.encode("BAUGH") == "B")
    assert(m.encode("GNU") == "N")
    assert(m.encode("SIGNED") == "SNT")
    assert(m.encode("PHISH") == "FX")
    assert(m.encode("SHOT") == "XT")
    assert(m.encode("ODSIAN") == "OTXN")
    assert(m.encode("PULSION") == "PLXN")
    assert(m.encode("OTIA") == "OX")
    assert(m.encode("PORTION") == "PRXN")
    assert(m.encode("RETCH") == "RX")
    assert(m.encode("WATCH") == "WX")
    assert(m.encode("AXEAXE") == "AKSK")
  }

  test("max length") {
    assert(Metaphone(Some(6)).encode("AXEAXEAXE") == "AKSKSK")
    assert(Metaphone.unbounded.encode("ALLERTON") == "ALRTN")
    assert(Metaphone.unbounded.encode("synchronization") == "SNXRNSXN")
  }
}
