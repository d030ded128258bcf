package graft.phonetic

/** A phonetic algorithm: deterministic, total transform of a string into a
  * phonetic code used as a record-linkage blocking key.
  *
  * Mirrors the reference API surface (`/root/reference/src/lib.rs:180-232`):
  * every algorithm provides `encode`, and `isEncodedEquals` defaults to
  * equality of the codes (MatchRatingApproach overrides it with a rating
  * procedure).
  */
trait PhoneticEncoder extends Serializable {
  def encode(s: String): String

  def isEncodedEquals(first: String, second: String): Boolean =
    encode(first) == encode(second)
}

/** Soundex-family addition: positional overlap count of the two encodings
  * (`/root/reference/src/lib.rs:248-311`). 0 = no similarity; for 4-char
  * Soundex max is 4; RefinedSoundex difference can exceed 4.
  */
trait SoundexCommons extends PhoneticEncoder {
  def difference(value1: String, value2: String): Int = {
    val a = encode(value1)
    val b = encode(value2)
    if (a.isEmpty || b.isEmpty) 0
    else {
      var i = 0
      var n = 0
      val len = math.min(a.length, b.length)
      while (i < len) {
        if (a.charAt(i) == b.charAt(i)) n += 1
        i += 1
      }
      n
    }
  }
}

private[phonetic] object SoundexUtils {
  /** Keep alphabetic chars only, uppercased (`/root/reference/src/lib.rs:234-242`).
    * Uses Character.toUpperCase per char plus String-level uppercasing for
    * chars whose uppercase expands (e.g. ß→SS), matching Rust's
    * `char::to_uppercase` which yields a sequence.
    */
  def soundexClean(value: String): String = {
    val sb = new java.lang.StringBuilder(value.length)
    var i = 0
    while (i < value.length) {
      val cp = value.codePointAt(i)
      if (Character.isLetter(cp)) {
        // Rust char::to_uppercase can expand (ß -> SS); replicate via
        // String.toUpperCase on the single code point.
        val s = new String(Character.toChars(cp))
        sb.append(s.toUpperCase(java.util.Locale.ROOT))
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }
}
