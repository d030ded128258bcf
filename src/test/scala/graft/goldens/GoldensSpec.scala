package graft.goldens

import org.scalatest.funsuite.AnyFunSuite

import graft.phonetic._
import graft.phonetic.bm

/** Validates every [[Goldens]] vector against the core encoders (which the
  * per-encoder suites pin to the reference bit-exactly). Any transcription
  * error in the driver-oracle data fails here, not in the driver run.
  */
class GoldensSpec extends AnyFunSuite {

  private def checkAll[A](rows: Seq[A])(f: A => (String, String, String)): Unit = {
    val failures = rows.flatMap { r =>
      val (label, got, want) = f(r)
      if (got != want) Some(s"$label: got '$got' want '$want'") else None
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }

  test("soundex vectors") {
    checkAll(Goldens.soundex) { case (t, c) =>
      (t, Soundex.default.encode(t), c)
    }
  }

  test("soundex variant vectors") {
    checkAll(Goldens.soundexVariants) { case (v, t, c) =>
      val enc = v match {
        case "genealogy" => Soundex.genealogy
        case "simplified" => Soundex.simplified
        case "custom" => Soundex.fromMapping(Goldens.soundexCustomMapping)
      }
      (s"$v/$t", enc.encode(t), c)
    }
  }

  test("refined soundex vectors") {
    checkAll(Goldens.refinedSoundex) { case (t, c) =>
      (t, RefinedSoundex.default.encode(t), c)
    }
  }

  test("cologne vectors") {
    checkAll(Goldens.cologne) { case (t, c) => (t, Cologne.encode(t), c) }
  }

  test("caverphone vectors") {
    checkAll(Goldens.caverphone1) { case (t, c) =>
      (t, Caverphone1.encode(t), c)
    }
    checkAll(Goldens.caverphone2) { case (t, c) =>
      (t, Caverphone2.encode(t), c)
    }
  }

  test("metaphone vectors") {
    checkAll(Goldens.metaphone) { case (v, t, c) =>
      val m = v match {
        case "len4" => Metaphone.default
        case "len6" => Metaphone(Some(6))
        case "unbounded" => Metaphone.unbounded
      }
      (s"$v/$t", m.encode(t), c)
    }
  }

  test("double metaphone golden table loads and matches") {
    assert(Goldens.doubleMetaphone.size == 1221)
    checkAll(Goldens.doubleMetaphone) { case (t, p, a) =>
      val r = DoubleMetaphone.default.doubleMetaphone(t)
      (t, s"${r.primary}|${r.alternate}", s"$p|$a")
    }
  }

  test("double metaphone equal vectors") {
    checkAll(Goldens.dmEqual) { case (a, b, alt, e) =>
      (s"$a/$b/$alt",
        DoubleMetaphone.default.isDoubleMetaphoneEqual(a, b, alt).toString,
        e.toString)
    }
  }

  test("nysiis vectors") {
    checkAll(Goldens.nysiis) { case (v, t, c) =>
      val n = if (v == "strict") Nysiis.default else Nysiis.nonStrict
      (s"$v/$t", n.encode(t), c)
    }
  }

  test("phonex vectors") {
    checkAll(Goldens.phonex) { case (t, c) =>
      (t, Phonex.default.encode(t), c)
    }
  }

  test("mra vectors") {
    checkAll(Goldens.mraEncode) { case (t, c) =>
      (t, MatchRatingApproach.encode(t), c)
    }
    checkAll(Goldens.mraPairs) { case (a, b, e) =>
      (s"$a/$b",
        MatchRatingApproach.isEncodedEquals(a, b).toString, e.toString)
    }
  }

  test("daitch-mokotoff vectors") {
    checkAll(Goldens.dmSoundex) { case (t, c) =>
      (t, DaitchMokotoff.default.soundex(t), c)
    }
    checkAll(Goldens.dmEncode) { case (t, c) =>
      (t, DaitchMokotoff.default.encode(t), c)
    }
  }

  test("soundex difference vectors") {
    checkAll(Goldens.soundexDifference) { case (a, b, d) =>
      (s"$a/$b", Soundex.default.difference(a, b).toString, d.toString)
    }
    checkAll(Goldens.refinedSoundexDifference) { case (a, b, d) =>
      (s"$a/$b", RefinedSoundex.default.difference(a, b).toString, d.toString)
    }
  }

  test("beider-morse vectors") {
    checkAll(Goldens.beiderMorse) { case (nt, rt, cc, mp, t, c) =>
      val e = new bm.BeiderMorse(
        bm.NameType.parse(nt), bm.RuleType.parse(rt), cc, mp)
      (s"$nt/$rt/$cc/$mp/$t", e.encode(t), c)
    }
  }

  test("beider-morse language-restricted vectors") {
    checkAll(Goldens.bmLangRestricted) { case (nt, rt, cc, mp, langs, t, c) =>
      val e = new bm.BeiderMorse(
        bm.NameType.parse(nt), bm.RuleType.parse(rt), cc, mp)
      val set = bm.LanguageSet.of(langs.split(",").toSeq)
      (s"$nt/$rt/$langs/$t", e.encodeWithLanguages(t, set), c)
    }
  }

  test("beider-morse language guessing vectors") {
    checkAll(Goldens.bmGuessLang) { case (t, c) =>
      (t, bm.BeiderMorse.guessLanguages(t, bm.NameType.Generic), c)
    }
  }

  test("values sql escapes quotes and renders all types") {
    val sql = Goldens.valuesSql(Seq("a", "b", "n", "f"),
      Seq(("O'Brien", true, 3, "x")))
    assert(sql.contains("'O''Brien'"))
    assert(sql.contains("TRUE"))
    assert(sql.contains("AS t(a, b, n, f)"))
  }
}
