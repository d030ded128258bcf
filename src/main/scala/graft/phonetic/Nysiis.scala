package graft.phonetic

/** NYSIIS (New York State Identification and Intelligence System), commons-
  * codec semantics (ref: /root/reference/src/nysiis.rs:131-221; transcode
  * :80-120).
  *
  * `strict = true` (default) caps the code at 6 chars. The transcode step
  * writes its output back into the char buffer (EV→AF, vowels→A, Q→G, Z→S,
  * M→N, KN→NN, K→C, SCH→SSS, PH→FF, silent H, W→previous vowel) and dedupes
  * against the previous buffer char.
  */
final case class Nysiis(strict: Boolean) extends PhoneticEncoder {

  import Nysiis._

  override def encode(value: String): String = {
    var tmp = SoundexUtils.soundexClean(value)
    if (tmp.isEmpty) return tmp

    // Prefix rewrites (ref: nysiis.rs:139-153)
    if (tmp.startsWith("MAC")) tmp = "MCC" + tmp.substring(3)
    if (tmp.startsWith("KN")) tmp = "NN" + tmp.substring(2)
    if (tmp.startsWith("K")) tmp = "C" + tmp.substring(1)
    if (tmp.startsWith("PH") || tmp.startsWith("PF"))
      tmp = "FF" + tmp.substring(2)
    if (tmp.startsWith("SCH")) tmp = "SSS" + tmp.substring(3)

    // Suffix rewrites (ref: nysiis.rs:155-165)
    if (tmp.endsWith("EE") || tmp.endsWith("IE"))
      tmp = tmp.substring(0, tmp.length - 2) + "Y"
    if (tmp.endsWith("DT") || tmp.endsWith("RT") || tmp.endsWith("RD") ||
        tmp.endsWith("NT") || tmp.endsWith("ND"))
      tmp = tmp.substring(0, tmp.length - 2) + "D"

    val chars = tmp.toCharArray
    val len = chars.length
    val key = new java.lang.StringBuilder(len)
    key.append(chars(0))

    var index = 1
    while (index < len) {
      val next = if (index + 1 < len) Some(chars(index + 1)) else None
      val nextNext = if (index + 2 < len) Some(chars(index + 2)) else None
      val transcoded = transcode(chars(index - 1), chars(index), next, nextNext)
      var i = 0
      while (i < transcoded.length) {
        chars(index + i) = transcoded.charAt(i)
        i += 1
      }
      if (chars(index - 1) != chars(index)) key.append(chars(index))
      index += 1
    }

    var result = key.toString
    if (result.length > 1) {
      if (result.endsWith("S")) result = result.substring(0, result.length - 1)
      if (result.length > 2 && result.endsWith("AY"))
        result = result.substring(0, result.length - 2) +
          result.substring(result.length - 1)
      if (result.endsWith("A")) result = result.substring(0, result.length - 1)
    }

    if (strict) result.substring(0, math.min(result.length, TrueLength))
    else result
  }
}

object Nysiis {
  private val TrueLength = 6

  val default: Nysiis = Nysiis(strict = true)
  val nonStrict: Nysiis = Nysiis(strict = false)

  private def isVowel(c: Char): Boolean = {
    val lc = Character.toLowerCase(c)
    lc == 'a' || lc == 'e' || lc == 'i' || lc == 'o' || lc == 'u'
  }

  /** ref: nysiis.rs:80-120 */
  private def transcode(
      previous: Char,
      current: Char,
      next: Option[Char],
      nextNext: Option[Char]): String = {
    if (current == 'E' && next.contains('V')) return "AF"
    if (isVowel(current)) return "A"
    current match {
      case 'Q' => return "G"
      case 'Z' => return "S"
      case 'M' => return "N"
      case 'K' => return if (next.contains('N')) "NN" else "C"
      case _   =>
    }
    if (current == 'S' && next.contains('C') && nextNext.contains('H'))
      return "SSS"
    if (current == 'P' && next.contains('H')) return "FF"
    if ((current == 'H' && (!isVowel(previous) || !next.exists(isVowel))) ||
        (current == 'W' && isVowel(previous))) previous.toString
    else current.toString
  }
}
