package graft.phonetic.bm

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors ported from the reference's Beider-Morse suites
  * (ref: /root/reference/src/beider_morse/{mod,engine,lang,languages}.rs
  * tests, themselves the commons-codec 1.15 vectors).
  */
class BeiderMorseSpec extends AnyFunSuite {

  private def engine(nameType: NameType, ruleType: RuleType, concat: Boolean,
      maxPhonemes: Int = BeiderMorse.DefaultMaxPhonemes): BeiderMorse =
    new BeiderMorse(nameType, ruleType, concat, maxPhonemes)

  // ref: src/beider_morse/engine.rs:318-383 (DATA) + :386-411
  test("engine golden vectors") {
    val data = Seq(
      ("Renault", "rinD|rinDlt|rina|rinalt|rino|rinolt|rinu|rinult",
        NameType.Generic, RuleType.Approx, true, 10),
      ("Renault", "rYnDlt|rYnalt|rYnult|rinDlt|rinalt|rinolt|rinult",
        NameType.Ashkenazi, RuleType.Approx, true, 10),
      ("Renault", "rinDlt", NameType.Ashkenazi, RuleType.Approx, true, 1),
      ("Renault", "rinDlt", NameType.Sephardic, RuleType.Approx, true, 10),
      ("SntJohn-Smith", "sntjonsmit", NameType.Generic, RuleType.Exact, true, 10),
      ("d'ortley", "(ortlaj|ortlej)-(dortlaj|dortlej)",
        NameType.Generic, RuleType.Exact, true, 10),
      ("van helsing",
        "(elSink|elsink|helSink|helsink|helzink|xelsink)-(banhelsink|fanhelsink|fanhelzink|vanhelsink|vanhelzink|vanjelsink)",
        NameType.Generic, RuleType.Exact, false, 10),
      ("Judenburg",
        "iudnbYrk|iudnbirk|iudnburk|xudnbirk|xudnburk|zudnbirk|zudnburk",
        NameType.Generic, RuleType.Approx, true, 10))
    data.foreach { case (input, expected, nt, rt, concat, mp) =>
      assert(engine(nt, rt, concat, mp).encode(input) === expected,
        s"for $input ($nt/$rt/concat=$concat/max=$mp)")
    }
  }

  // ref: src/beider_morse/mod.rs:234 (doc example)
  test("Van Helsing full default encode") {
    assert(BeiderMorse.default.encode("Van Helsing") ===
      "(Ylznk|ilzn|ilznk|xilzn|xilznk)-(banilznk|bonilznk|fYnYlznk|fYnilznk|fanYlznk|fanilznk|fonYlznk|fonilznk|vYnYlznk|vYnilznk|vanYlznk|vaniilznk|vanilzn|vanilznk|vonYlznk|voniilznk|vonilzn|vonilznk)")
  }

  // ref: src/beider_morse/mod.rs:261-271 (encode_with_languages example)
  test("encode with explicit language sets") {
    val e = engine(NameType.Generic, RuleType.Exact, concat = true)
    assert(e.encode("Angelo") === "anZelo|andZelo|angelo|anhelo|anjelo|anxelo")
    assert(e.encodeWithLanguages("Angelo",
      LanguageSet.of(Seq("italian", "greek", "spanish"))) ===
      "andZelo|angelo|anxelo")
    assert(e.encodeWithLanguages("Angelo", LanguageSet.of(Seq("italian"))) ===
      "andZelo")
  }

  // ref: src/beider_morse/engine.rs:451-569 (test_solr_generic)
  test("solr generic matrix") {
    val approxAngelo =
      "YngYlo|Yngilo|agilo|angYlo|angilo|aniilo|anilo|anxilo|anzilo|ogilo|ongYlo|ongilo|oniilo|onilo|onxilo|onzilo"
    Seq(true, false).foreach { concat =>
      assert(engine(NameType.Generic, RuleType.Approx, concat)
        .encode("Angelo") === approxAngelo)
      val exact = engine(NameType.Generic, RuleType.Exact, concat)
      assert(exact.encode("Angelo") ===
        "anZelo|andZelo|angelo|anhelo|anjelo|anxelo")
      assert(exact.encode("D'Angelo") ===
        "(anZelo|andZelo|angelo|anhelo|anjelo|anxelo)-(danZelo|dandZelo|dangelo|danhelo|danjelo|danxelo)")
      assert(exact.encodeWithLanguages("Angelo",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) ===
        "andZelo|angelo|anxelo")
      assert(exact.encodeWithLanguages("1234",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) === "")
      val approx = engine(NameType.Generic, RuleType.Approx, concat)
      assert(approx.encode("D'Angelo") ===
        "(YngYlo|Yngilo|agilo|angYlo|angilo|aniilo|anilo|anxilo|anzilo|ogilo|ongYlo|ongilo|oniilo|onilo|onxilo|onzilo)-(dYngYlo|dYngilo|dagilo|dangYlo|dangilo|daniilo|danilo|danxilo|danzilo|dogilo|dongYlo|dongilo|doniilo|donilo|donxilo|donzilo)")
      assert(approx.encodeWithLanguages("Angelo",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) ===
        "angilo|anxilo|anzilo|ongilo|onxilo|onzilo")
      assert(approx.encodeWithLanguages("1234",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) === "")
    }
  }

  // ref: src/beider_morse/engine.rs:572-692 (test_solr_ashkenazi)
  test("solr ashkenazi matrix") {
    val approxAngelo =
      "YngYlo|Yngilo|angYlo|angilo|anilo|anxilo|anzilo|ongYlo|ongilo|onilo|onxilo|onzilo"
    Seq(true, false).foreach { concat =>
      assert(engine(NameType.Ashkenazi, RuleType.Approx, concat)
        .encode("Angelo") === approxAngelo)
      val exact = engine(NameType.Ashkenazi, RuleType.Exact, concat)
      assert(exact.encode("Angelo") === "andZelo|angelo|anhelo|anxelo")
      assert(exact.encode("D'Angelo") === "dandZelo|dangelo|danhelo|danxelo")
      assert(exact.encodeWithLanguages("Angelo",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) ===
        "angelo|anxelo")
      assert(exact.encodeWithLanguages("1234",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) === "")
      val approx = engine(NameType.Ashkenazi, RuleType.Approx, concat)
      assert(approx.encode("D'Angelo") ===
        "dYngYlo|dYngilo|dangYlo|dangilo|danilo|danxilo|danzilo|dongYlo|dongilo|donilo|donxilo|donzilo")
      assert(approx.encodeWithLanguages("Angelo",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) ===
        "angilo|anxilo|ongilo|onxilo")
    }
  }

  // ref: src/beider_morse/engine.rs:695-815 (test_solr_sephardic)
  test("solr sephardic matrix") {
    val approxAngelo = "anhila|anhilu|anzila|anzilu|nhila|nhilu|nzila|nzilu"
    Seq(true, false).foreach { concat =>
      assert(engine(NameType.Sephardic, RuleType.Approx, concat)
        .encode("Angelo") === approxAngelo)
      val exact = engine(NameType.Sephardic, RuleType.Exact, concat)
      assert(exact.encode("Angelo") === "anZelo|andZelo|anxelo")
      assert(exact.encodeWithLanguages("Angelo",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) ===
        "andZelo|anxelo")
      assert(exact.encodeWithLanguages("1234",
        LanguageSet.of(Seq("italian", "greek", "spanish"))) === "")
    }
    // concat distinguishes the D'Angelo cases
    assert(engine(NameType.Sephardic, RuleType.Exact, concat = true)
      .encode("D'Angelo") === "anZelo|andZelo|anxelo")
    assert(engine(NameType.Sephardic, RuleType.Exact, concat = false)
      .encode("D'Angelo") === "danZelo|dandZelo|danxelo")
    assert(engine(NameType.Sephardic, RuleType.Approx, concat = true)
      .encode("D'Angelo") === approxAngelo)
    assert(engine(NameType.Sephardic, RuleType.Approx, concat = false)
      .encode("D'Angelo") ===
      "danhila|danhilu|danzila|danzilu|nhila|nhilu|nzila|nzilu")
  }

  // ref: src/beider_morse/engine.rs:818-846
  test("compatibility with original BMPM version") {
    val gen = engine(NameType.Generic, RuleType.Approx, concat = false)
    assert(gen.encode("abram") ===
      "Ybram|Ybrom|abram|abran|abrom|abron|avram|avrom|obram|obran|obrom|obron|ovram|ovrom")
    assert(gen.encode("Bendzin") === "bndzn|bntsn|bnzn|vndzn|vntsn")
    val ash = engine(NameType.Ashkenazi, RuleType.Approx, concat = false)
    assert(ash.encode("abram") ===
      "Ybram|Ybrom|abram|abrom|avram|avrom|imbram|imbrom|obram|obrom|ombram|ombrom|ovram|ovrom")
    assert(ash.encode("Halpern") ===
      "YlpYrn|Ylpirn|alpYrn|alpirn|olpYrn|olpirn|xalpirn|xolpirn")
  }

  // ref: src/beider_morse/lang.rs:185-216
  test("language guessing") {
    val config = BmConfig.default
    val gen = new BeiderMorse(NameType.Generic, RuleType.Approx, true, 20, config)
    val data = Seq(
      ("Renault", LanguageSet.of(Seq("french"))),
      ("Mickiewicz", LanguageSet.of(Seq("polish"))),
      ("Thompson", LanguageSet.of(Seq("greeklatin", "english"))),
      ("Nuñez", LanguageSet.of(Seq("spanish"))),
      ("Carvalho", LanguageSet.of(Seq("portuguese"))),
      ("Čapek", LanguageSet.of(Seq("czech"))),
      ("Sjneijder", LanguageSet.of(Seq("dutch"))),
      ("Klausewitz", LanguageSet.of(Seq("german"))),
      ("Küçük", LanguageSet.of(Seq("turkish"))),
      ("Giacometti", LanguageSet.of(Seq("italian"))),
      ("Nagy", LanguageSet.of(Seq("hungarian"))),
      ("Ceauşescu", LanguageSet.of(Seq("romanian"))),
      ("Angelopoulos", LanguageSet.of(Seq("greeklatin"))),
      ("Αγγελόπουλος",
        LanguageSet.of(Seq("greek"))),
      ("Пушкин", LanguageSet.of(Seq("cyrillic"))),
      ("כהן", LanguageSet.of(Seq("hebrew"))),
      ("ácz", LanguageSet.AnyLanguage),
      ("átz", LanguageSet.AnyLanguage))
    // reach the guesser through a public surface: guessing drives encode's
    // rule choice, so compare via the internal config langs map
    data.foreach { case (input, expected) =>
      val got = config.langs(NameType.Generic).guessLanguages(input)
      assert(got === expected, s"for $input")
    }
    assert(gen.encode("Renault").nonEmpty)
  }

  // ref: src/beider_morse/languages.rs:231-291
  test("languages files parse to the expected sets") {
    assert(BmParser.parseLanguages(NameType.Generic).size === 19)
    assert(BmParser.parseLanguages(NameType.Ashkenazi).size === 11)
    assert(BmParser.parseLanguages(NameType.Sephardic).size === 6)
    assert(BmParser.parseLanguages(NameType.Generic).contains("any"))
  }

  // ref: src/beider_morse/mod.rs:400-427 robustness
  test("single ascii letters encode non-empty") {
    val e = BeiderMorse.default
    ('a' to 'z').foreach { ch =>
      assert(e.encode(ch.toString).nonEmpty, s"for $ch")
      assert(e.encode(ch.toString.toUpperCase).nonEmpty, s"for ${ch.toUpper}")
    }
  }

  // ref: src/beider_morse/mod.rs:380-398 (test_oom)
  test("max phonemes caps the variant count") {
    val input = "200697900'-->&#1913348150;</  bceaeef >aadaabcf\"aedfbff<!--\'-->?>cae" +
      "cfaaa><?&#<!--</script>&lang&fc;aadeaf?>>&bdquo<    cc =\"abff\"    /></   afe  ><script>" +
      "<!-- f(';<    cf aefbeef = \"bfabadcf\" ebbfeedd = fccabeb >"
    val e = engine(NameType.Generic, RuleType.Exact, concat = true, maxPhonemes = 10)
    val result = e.encode(input)
    assert(result.nonEmpty)
    assert(result.split('|').length <= 10)
  }

  // ref: src/beider_morse/mod.rs:429-466
  test("robustness: accents, gna, long surname") {
    val e = BeiderMorse.default
    Seq("ácz", "átz", "Ignácz", "Ignátz", "Ignác",
      "gna", "MacGhilleseatheanaich",
      "ItstheendoftheworldasweknowitandIfeelfine",
      "abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyz").foreach { s =>
      assert(e.encode(s).nonEmpty, s"for $s")
    }
  }

  test("splitCodes flattens groups and variants") {
    assert(BeiderMorse.splitCodes("(ortlaj|ortlej)-(dortlaj|dortlej)").toSeq ===
      Seq("ortlaj", "ortlej", "dortlaj", "dortlej"))
    assert(BeiderMorse.splitCodes("a|b").toSeq === Seq("a", "b"))
    assert(BeiderMorse.splitCodes("").toSeq === Seq.empty)
  }
}
