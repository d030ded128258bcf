package graft.phonetic

/** American Soundex with commons-codec semantics
  * (ref: /root/reference/src/soundex.rs:222-257).
  *
  * Differs from Spark's built-in `soundex()`: supports custom 26-char
  * mappings, a '-' (silent) mapping code, and the H/W special case (H and W
  * are skipped entirely, so consonants around them still dedupe —
  * "Ashcraft" -> A261).
  */
final case class Soundex(mapping: Array[Char], specialCaseHW: Boolean)
    extends SoundexCommons {
  require(mapping.length == 26, "mapping must have 26 entries")

  private def mappingCode(ch: Char): Char = mapping(ch - 'A')

  override def encode(value: String): String = {
    val cleaned = SoundexUtils.soundexClean(value)
    if (cleaned.isEmpty) return cleaned

    val code = Array('0', '0', '0', '0')
    code(0) = cleaned.charAt(0)
    var count = 1
    var previous =
      if (code(0) >= 'A' && code(0) <= 'Z') mappingCode(code(0)) else '0'
    var i = 1
    while (count < 4 && i < cleaned.length) {
      val ch = cleaned.charAt(i)
      i += 1
      // Non-ASCII uppercase letters index past the mapping; the reference
      // panics there — we skip to stay total on arbitrary UTF-8 content.
      if (ch >= 'A' && ch <= 'Z' && !(specialCaseHW && (ch == 'H' || ch == 'W'))) {
        val digit = mappingCode(ch)
        if (digit != Soundex.Silent) {
          if (digit != '0' && digit != previous) {
            code(count) = digit
            count += 1
          }
          previous = digit
        }
      }
    }
    new String(code)
  }
}

object Soundex {
  private val Silent = '-'

  /** ref: /root/reference/src/soundex.rs:35-38 */
  val UsEnglishMapping: Array[Char] =
    "01230120022455012623010202".toCharArray

  /** Genealogy mapping: vowels + H/W silent (ref: soundex.rs:51-54). */
  val UsEnglishGenealogyMapping: Array[Char] =
    "-123-12--22455-12623-1-2-2".toCharArray

  val default: Soundex = Soundex(UsEnglishMapping, specialCaseHW = true)

  val genealogy: Soundex =
    Soundex(UsEnglishGenealogyMapping, specialCaseHW = false)

  val simplified: Soundex = Soundex(UsEnglishMapping, specialCaseHW = false)

  /** Mirrors `From<[char;26]>`: H/W special-cased iff no silent in mapping
    * (ref: soundex.rs:117-125).
    */
  def fromMapping(mapping: String): Soundex = {
    val arr = mapping.toCharArray
    Soundex(arr, specialCaseHW = !arr.contains(Silent))
  }
}

/** Refined Soundex (ref: /root/reference/src/refined_soundex.rs:162-184):
  * first letter + one mapping digit per char (vowels map to '0' and are
  * kept), deduping consecutive identical codes. Unbounded length.
  */
final case class RefinedSoundex(mapping: Array[Char]) extends SoundexCommons {
  require(mapping.length == 26, "mapping must have 26 entries")

  private def mappingCode(ch: Char): Char = mapping(ch - 'A')

  override def encode(value: String): String = {
    val cleaned = SoundexUtils.soundexClean(value)
    if (cleaned.isEmpty) return cleaned

    val sb = new java.lang.StringBuilder(cleaned.length + 1)
    sb.append(cleaned.charAt(0))
    var previous: Char = 0
    var i = 0
    while (i < cleaned.length) {
      val ch = cleaned.charAt(i)
      if (ch >= 'A' && ch <= 'Z') {
        val codeValue = mappingCode(ch)
        if (codeValue != previous) sb.append(codeValue)
        previous = codeValue
      }
      i += 1
    }
    sb.toString
  }
}

object RefinedSoundex {
  /** ref: /root/reference/src/refined_soundex.rs:23-26 */
  val UsEnglishMapping: Array[Char] =
    "01360240043788015936020505".toCharArray

  val default: RefinedSoundex = RefinedSoundex(UsEnglishMapping)
}
