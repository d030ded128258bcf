package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.unsafe.types.UTF8String

/** Properties of the portable hash specs backing the DuckDB-oracled
  * dedup/similarity ops: value bounds, determinism, and agreement with an
  * independent straight-line reimplementation of the documented spec.
  */
class HashSpecPropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(13L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(params, seed))
      seed = seed.next
    }
  }

  /** Mixed-script codepoints incl. supplementary plane: Han (BMP + ext-B),
    * Hiragana, Katakana, Cyrillic, Greek, Hangul, accented Latin, digits,
    * punctuation, emoji, combining marks.
    */
  private val unicodeCpGen: Gen[Int] = Gen.oneOf(
    Gen.chooseNum(0x4E00, 0x4E80), // Han
    Gen.chooseNum(0x20000, 0x20020), // Han ext-B (supplementary)
    Gen.chooseNum(0x3041, 0x3096), // Hiragana
    Gen.chooseNum(0x30A1, 0x30FA), // Katakana
    Gen.chooseNum(0x0410, 0x044F), // Cyrillic
    Gen.chooseNum(0x0391, 0x03C9), // Greek
    Gen.chooseNum(0xAC00, 0xAC80), // Hangul
    Gen.oneOf('é'.toInt, 'ü'.toInt, 'ß'.toInt, 'ñ'.toInt, 'ø'.toInt),
    Gen.chooseNum('a'.toInt, 'z'.toInt),
    Gen.chooseNum('0'.toInt, '9'.toInt),
    Gen.oneOf(' '.toInt, '\n'.toInt, '.'.toInt, '!'.toInt, 0x3001),
    Gen.chooseNum(0x1F600, 0x1F610), // emoji (supplementary, non-letter)
    Gen.oneOf(0x0301, 0x0308)) // combining marks

  private val unicodeTextGen: Gen[String] =
    Gen.listOf(unicodeCpGen).map(cps =>
      new String(cps.take(80).flatMap(Character.toChars(_)).toArray))

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map(_.take(120)),
    Gen.asciiPrintableStr.map(_.take(120)),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('\n')))
      .map(_.mkString.take(200)),
    unicodeTextGen)

  test("unicode token scanner agrees with the regex form of the spec") {
    val re = Tokens.TokenPatternJava.r
    forAll(unicodeTextGen, n = 400) { s =>
      val scanned = Tokens.tokens(s).toSeq
      val expected =
        re.findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toSeq
      assert(scanned == expected, s"tokens mismatch for '$s'")
    }
    // pinned cases: CJK chars are single tokens, other scripts word runs
    assert(Tokens.tokens("abc漢字def 123").toSeq ==
      Seq("abc", "漢", "字", "def", "123"))
    assert(Tokens.tokens("русский ТЕКСТ").toSeq == Seq("русский", "текст"))
    assert(Tokens.tokens("ひらがなカナ").toSeq ==
      Seq("ひ", "ら", "が", "な", "カ", "ナ"))
    assert(Tokens.tokens("한국어 텍스트").toSeq == Seq("한국어", "텍스트"))
    assert(Tokens.tokens("!!! ...").toSeq == Seq.empty)
    // supplementary Han ideograph (U+20000) is one single-char token
    assert(Tokens.tokens(new String(Character.toChars(0x20000)) + "x").toSeq ==
      Seq(new String(Character.toChars(0x20000)), "x"))
  }

  test("minhash signatures: deterministic, in [0, 2^61-1), spec-faithful") {
    val m61 = MinHashFunctions.M61
    forAll(textGen) { s =>
      val u = UTF8String.fromString(s)
      val sig1 = MinHashFunctions.minhashSignature(u, 16, 3).toLongArray()
      val sig2 = MinHashFunctions.minhashSignature(u, 16, 3).toLongArray()
      assert(sig1.sameElements(sig2))
      assert(sig1.forall(v => v >= 0 && v < m61 || v == Long.MaxValue))

      // independent straight-line reimplementation of the documented spec
      val words = Tokens.TokenPatternJava.r
        .findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toVector
      val shingles =
        if (words.length < 3) Vector(words.mkString(" "))
        else words.sliding(3).map(_.mkString(" ")).toVector
      val md = java.security.MessageDigest.getInstance("MD5")
      def base(sh: String): Long = {
        md.reset()
        val hex = md.digest(sh.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      }
      val expected = (0 until 16).map { i =>
        val a = BigInt(MinHashFunctions.coeffA(i))
        val b = BigInt(MinHashFunctions.coeffB(i))
        shingles
          .map(sh => ((a * base(sh) + b) mod BigInt(m61)).toLong)
          .min
      }
      assert(sig1.toSeq == expected, s"spec mismatch for '$s'")
    }
  }

  test("cosine expression: symmetric, bounded, 1.0 on self") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0)).map(_.toArray)
    forAll(vecGen, n = 100) { a =>
      val b = a.map(x => x * 0.5 + 0.1)
      def arr(xs: Array[Double]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(x => x: Any))
      val ab = CosineFunctions.cosine(arr(a), arr(b), aFloat = false,
        bFloat = false)
      val ba = CosineFunctions.cosine(arr(b), arr(a), aFloat = false,
        bFloat = false)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0000001 && ab <= 1.0000001)
      val aa = CosineFunctions.cosine(arr(a), arr(a), aFloat = false,
        bFloat = false)
      if (a.exists(_ != 0.0)) assert(math.abs(aa - 1.0) < 1e-12)
    }
  }

  test("lsh signatures: in [0, 2^nPlanes), deterministic across calls") {
    val vecGen = Gen.listOfN(32, Gen.chooseNum(-1.0, 1.0)).map(_.toArray)
    val planes = LshFunctions.planeMatrix(32, 6, 4, seedBase = 0)
    forAll(vecGen, n = 100) { v =>
      def arr(xs: Array[Double]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(x => x: Any))
      val s1 = LshFunctions.signatures(arr(v), planes, 32, 6, isFloat = false)
        .toLongArray()
      val s2 = LshFunctions.signatures(arr(v), planes, 32, 6, isFloat = false)
        .toLongArray()
      assert(s1.sameElements(s2))
      assert(s1.length == 4)
      assert(s1.forall(s => s >= 0 && s < 64))
    }
  }
}
