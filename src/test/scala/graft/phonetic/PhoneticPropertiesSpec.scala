package graft.phonetic

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests promised in SURVEY.md §5: determinism, output charset
  * closure, code-length invariants, and the Daitch-Mokotoff
  * encode-is-first-branch containment.
  */
class PhoneticPropertiesSpec extends AnyFunSuite {

  /** Seeded sampling loop over a generator (the scalatest-scalacheck
    * bridge is not in the offline dependency cache).
    */
  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(params, seed))
      seed = seed.next
    }
  }

  private def forAll2[A](gen: Gen[A], n: Int = 300)(f: (A, A) => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    (0 until n).foreach { _ =>
      val a = gen.pureApply(params, seed); seed = seed.next
      val b = gen.pureApply(params, seed); seed = seed.next
      f(a, b)
    }
  }

  private val nameGen: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map(_.take(24)),
    Gen.asciiPrintableStr.map(_.take(24)),
    Gen.listOf(Gen.oneOf(
      Gen.alphaChar, Gen.oneOf('ä', 'ö', 'ü', 'ß', 'ç', 'ñ', 'é', '\'', '-', ' ')))
      .map(_.mkString.take(24)))

  private val encoders: Seq[(String, String => String)] = Seq(
    "soundex" -> Soundex.default.encode,
    "refined" -> RefinedSoundex.default.encode,
    "metaphone" -> Metaphone.default.encode,
    "dm_primary" -> DoubleMetaphone.default.encode,
    "nysiis" -> Nysiis.default.encode,
    "phonex" -> Phonex.default.encode,
    "cologne" -> Cologne.encode,
    "caverphone1" -> Caverphone1.encode,
    "caverphone2" -> Caverphone2.encode,
    "mra" -> MatchRatingApproach.encode,
    "daitch_mokotoff" -> DaitchMokotoff.default.encode)

  test("every encoder is deterministic and total") {
    forAll(nameGen) { s =>
      encoders.foreach { case (name, enc) =>
        assert(enc(s) == enc(s), s"$name not deterministic on '$s'")
      }
      val bmEnc = graft.phonetic.bm.BeiderMorse.default
      assert(bmEnc.encode(s) == bmEnc.encode(s))
    }
  }

  test("fixed-length codes pad to their exact lengths") {
    forAll(nameGen) { s =>
      val sx = Soundex.default.encode(s)
      assert(sx.isEmpty || sx.length == 4, s"soundex '$s' -> '$sx'")
      assert(Caverphone1.encode(s).length == 6)
      assert(Caverphone2.encode(s).length == 10)
      val px = Phonex.default.encode(s)
      assert(px.length == 4, s"phonex '$s' -> '$px'")
      val dm = DaitchMokotoff.default.encode(s)
      assert(dm.isEmpty || dm.length == 6, s"dm '$s' -> '$dm'")
      assert(MatchRatingApproach.encode(s).length <= 6)
      assert(Metaphone.default.encode(s).length <= 4)
    }
  }

  test("output charsets are closed") {
    forAll(nameGen) { s =>
      assert(Cologne.encode(s).forall(_.isDigit))
      assert(DaitchMokotoff.default.encode(s).forall(_.isDigit))
      val sx = Soundex.default.encode(s)
      assert(sx.isEmpty ||
        (sx.charAt(0).isLetter && sx.drop(1).forall(_.isDigit)), sx)
      assert(Caverphone2.encode(s).forall(c => c.isLetterOrDigit))
    }
  }

  test("DM non-branching code is one of the branching codes") {
    forAll(nameGen) { s =>
      val single = DaitchMokotoff.default.encode(s)
      val branches = DaitchMokotoff.default.innerSoundex(s, branching = true)
      if (single.nonEmpty) assert(branches.contains(single),
        s"'$s': $single not in ${branches.mkString("|")}")
    }
  }

  test("double metaphone primary equals first element of the pair") {
    forAll(nameGen) { s =>
      val r = DoubleMetaphone.default.doubleMetaphone(s)
      assert(DoubleMetaphone.default.encode(s) == r.primary)
      assert(DoubleMetaphone.default.encodeAlternate(s) == r.alternate)
    }
  }

  test("MRA match is symmetric; rating bounded by 6") {
    forAll2(nameGen) { (a, b) =>
      assert(MatchRatingApproach.isEncodedEquals(a, b) ==
        MatchRatingApproach.isEncodedEquals(b, a))
      val r = MatchRatingApproach.rating(a, b)
      assert(r >= -1 && r <= 6)
    }
  }

  test("Jaro-Winkler is symmetric, in [0,1], and 1 iff equal-ish") {
    forAll2(nameGen) { (a, b) =>
      val s1 = JaroWinkler.similarity(a, b)
      assert(s1 == JaroWinkler.similarity(b, a))
      assert(s1 >= 0.0 && s1 <= 1.0)
      if (a.nonEmpty) assert(JaroWinkler.similarity(a, a) == 1.0)
    }
  }
}
