package graft.phonetic

/** Caverphone 1 and 2 (David Hood, University of Otago), commons-codec
  * semantics (ref: /root/reference/src/caverphone.rs:38-140 and :156-274).
  *
  * Both are ordered literal-rewrite chains — order-sensitive, ported
  * rule-for-rule. V1 emits exactly 6 chars, V2 exactly 10, '1'-padded.
  */
private[phonetic] object CaverphoneOps {
  /** keep only lowercase letters (ref: helper.rs:70-75) */
  def removeNonLetters(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLowerCase(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }

  def replaceEnd(s: String, pattern: String, to: String): String =
    if (s.endsWith(pattern)) s.substring(0, s.length - pattern.length) + to
    else s

  def replaceStart(s: String, pattern: String, to: String): String =
    if (s.startsWith(pattern)) to + s.substring(pattern.length) else s

  /** Collapse runs of chars from `set` into a single uppercase char
    * (ref: helper.rs:23-45).
    */
  def compactToUpper(s: String, set: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var previous: Char = 0
    var hasPrev = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (set.indexOf(ch.toInt) >= 0) {
        if (!hasPrev || previous != ch) {
          sb.append(Character.toUpperCase(ch))
          previous = ch
          hasPrev = true
        }
      } else {
        sb.append(ch)
        hasPrev = false
      }
      i += 1
    }
    sb.toString
  }

  def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  def vowelsTo3(s: String): String = s.map(c => if (isVowel(c)) '3' else c)

  def firstVowelToA(s: String): String =
    if (s.nonEmpty && isVowel(s.charAt(0))) "A" + s.substring(1) else s
}

object Caverphone1 extends PhoneticEncoder {
  import CaverphoneOps._

  override def encode(s: String): String = {
    if (s.isEmpty) return "111111"
    var t = removeNonLetters(s.toLowerCase(java.util.Locale.ROOT))
    t = replaceStart(t, "cough", "cou2f")
    t = replaceStart(t, "rough", "rou2f")
    t = replaceStart(t, "tough", "tou2f")
    t = replaceStart(t, "enough", "enou2f")
    t = replaceStart(t, "gn", "2n")
    t = replaceEnd(t, "mb", "m2")
    t = t.replace("cq", "2q")
    t = t.replace("ci", "si").replace("ce", "se").replace("cy", "sy")
    t = t.replace("tch", "2ch")
    t = t.replace('c', 'k').replace('q', 'k').replace('x', 'k')
    t = t.replace('v', 'f')
    t = t.replace("dg", "2g")
    t = t.replace("tio", "sio").replace("tia", "sia")
    t = t.replace('d', 't')
    t = t.replace("ph", "fh")
    t = t.replace('b', 'p')
    t = t.replace("sh", "s2")
    t = t.replace('z', 's')
    t = firstVowelToA(t)
    t = vowelsTo3(t)
    t = t.replace("3gh3", "3kh3")
    t = t.replace("gh", "22")
    t = t.replace('g', 'k')
    t = compactToUpper(t, "stpkfmn")
    t = t.replace("w3", "W3").replace("wy", "Wy")
    t = t.replace("wh3", "Wh3").replace("why", "Why")
    t = t.replace("w", "2")
    t = replaceStart(t, "h", "A")
    t = t.replace("h", "2")
    t = t.replace("r3", "R3").replace("ry", "Ry").replace("r", "2")
    t = t.replace("l3", "L3").replace("ly", "Ly").replace("l", "2")
    t = t.replace("j", "y")
    t = t.replace("y3", "Y3").replace("y", "2")
    t = t.replace("2", "").replace("3", "")
    (t + "111111").substring(0, 6)
  }
}

object Caverphone2 extends PhoneticEncoder {
  import CaverphoneOps._

  override def encode(s: String): String = {
    if (s.isEmpty) return "1111111111"
    var t = removeNonLetters(s.toLowerCase(java.util.Locale.ROOT))
    t = replaceEnd(t, "e", "")
    t = replaceStart(t, "cough", "cou2f")
    t = replaceStart(t, "rough", "rou2f")
    t = replaceStart(t, "tough", "tou2f")
    t = replaceStart(t, "enough", "enou2f")
    t = replaceStart(t, "trough", "trou2f")
    t = replaceStart(t, "gn", "2n")
    t = replaceEnd(t, "mb", "m2")
    t = t.replace("cq", "2q")
    t = t.replace("ci", "si").replace("ce", "se").replace("cy", "sy")
    t = t.replace("tch", "2ch")
    t = t.replace('c', 'k').replace('q', 'k').replace('x', 'k')
    t = t.replace('v', 'f')
    t = t.replace("dg", "2g")
    t = t.replace("tio", "sio").replace("tia", "sia")
    t = t.replace('d', 't')
    t = t.replace("ph", "fh")
    t = t.replace('b', 'p')
    t = t.replace("sh", "s2")
    t = t.replace('z', 's')
    t = firstVowelToA(t)
    t = vowelsTo3(t)
    t = t.replace("j", "y")
    t = replaceStart(t, "y3", "Y3")
    t = replaceStart(t, "y", "A")
    t = t.replace("y", "3")
    t = t.replace("3gh3", "3kh3")
    t = t.replace("gh", "22")
    t = t.replace('g', 'k')
    t = compactToUpper(t, "stpkfmn")
    t = t.replace("w3", "W3")
    t = t.replace("wh3", "Wh3")
    t = replaceEnd(t, "w", "3")
    t = t.replace("w", "2")
    t = replaceStart(t, "h", "A")
    t = t.replace("h", "2")
    t = t.replace("r3", "R3")
    t = replaceEnd(t, "r", "3")
    t = t.replace("r", "2")
    t = t.replace("l3", "L3")
    t = replaceEnd(t, "l", "3")
    t = t.replace("l", "2")
    t = t.replace("2", "")
    t = replaceEnd(t, "3", "A")
    t = t.replace("3", "")
    (t + "1111111111").substring(0, 10)
  }
}
