package graft.pipeline

/** Labeled name pairs from the reference test suites — the F1 fixture.
  *
  * Positives: MRA `is_encoded_equals` matches
  * (/root/reference/src/match_rating_approach.rs:513-757) plus Metaphone
  * equivalence classes (/root/reference/src/metaphone.rs:379-545).
  * Negatives: the MRA non-match pairs.
  *
  * `families` is the transitive closure (union-find) of the positive pairs:
  * the ground-truth entity partition used by the synthetic repo-file
  * generator.
  */
object NameFixtures {

  /** MRA positive pairs (ref: match_rating_approach.rs tests). */
  val mraPositives: Seq[(String, String)] = Seq(
    ("smith", "smyth"), ("Burns", "Bourne"), ("Catherine", "Kathryn"),
    ("Brian", "Bryan"), ("Stephen", "Steven"), ("Steven", "Stefan"),
    ("Sam", "Samuel"), ("Micky", "Michael"), ("Oona", "Oonagh"),
    ("Sophie", "Sofia"), ("Franciszek", "Frances"), ("Tomasz", "tom"),
    ("Kl", "Karl"), ("Zach", "Zacharia"), ("Hailey", "Halley"),
    ("Auerbach", "Uhrbach"), ("Moskowitz", "Moskovitz"),
    ("LIPSHITZ", "LIPPSZYC"), ("LEWINSKY", "LEVINSKI"),
    ("SZLAMAWICZ", "SHLAMOVITZ"), ("Peterson", "Peters"), ("Sean", "John"))

  /** MRA negative pairs (ref: match_rating_approach.rs tests). */
  val negatives: Seq[(String, String)] = Seq(
    ("Karl", "Alessandro"), ("Murphy", "Lynch"), ("Sean", "Pete"),
    ("Al", "Ed"), ("Úna", "Oonagh"), ("Moriarty", "OMuircheartaigh"))

  /** Metaphone equivalence classes (ref: metaphone.rs:379-545), each a set
    * of names sharing a metaphone code.
    */
  val metaphoneClasses: Seq[Seq[String]] = Seq(
    Seq("White", "Wade", "Wait", "Waite", "Wat", "Whit", "Wiatt", "Wit",
      "Wittie", "Witty", "Wood", "Woodie", "Woody"),
    Seq("Albert", "Ailbert", "Alberik", "Alberto", "Albrecht"),
    Seq("Gary", "Cahra", "Cara", "Carey", "Cari", "Caria", "Carie", "Caro",
      "Carree", "Carri", "Carrie", "Carry", "Cary", "Cora", "Corey", "Cori",
      "Corie", "Correy", "Corri", "Corrie", "Corry", "Cory", "Gray", "Kara",
      "Kare", "Karee", "Kari", "Karia", "Karie", "Karrah", "Karrie", "Karry",
      "Kary", "Keri", "Kerri", "Kerrie", "Kerry", "Kira", "Kiri", "Kora",
      "Kore", "Kori", "Korie", "Korrie", "Korry"),
    Seq("Knight", "Hynda", "Nada", "Nadia", "Nady", "Nat", "Nata", "Natty",
      "Neda", "Nedda", "Nedi", "Netta", "Netti", "Nettie", "Netty", "Nita",
      "Nydia"),
    Seq("Mary", "Mair", "Maire", "Mara", "Mareah", "Mari", "Maria", "Marie",
      "Maura", "Maure", "Meara", "Merrie", "Merry", "Mira", "Moira", "Mora",
      "Moria", "Moyra", "Muire", "Myra", "Myrah"),
    Seq("Paris", "Pearcy", "Perris", "Piercy", "Pierz", "Pryse"),
    Seq("Peter", "Peadar", "Peder", "Pedro", "Petr", "Peyter", "Pieter",
      "Pietro", "Piotr"),
    Seq("Ray", "Rey", "Roi", "Roy", "Ruy"),
    Seq("Susan", "Siusan", "Sosanna", "Susana", "Susann", "Susanna",
      "Susannah", "Susanne", "Suzann", "Suzanna", "Suzanne", "Zuzana"),
    Seq("Wright", "Rota", "Rudd", "Ryde"),
    Seq("Xalan", "Celene", "Celina", "Celine", "Selena", "Selene", "Selina",
      "Seline", "Suellen", "Xylina"))

  /** All labeled positive pairs: MRA positives + within-class Metaphone
    * pairs (adjacent pairs suffice — same-class equality is transitive).
    */
  lazy val positives: Seq[(String, String)] =
    mraPositives ++ metaphoneClasses.flatMap(c => c.zip(c.tail))

  /** Ground-truth families: union-find over the positives. */
  lazy val families: Vector[Vector[String]] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(ra) = rb
    }
    positives.foreach { case (a, b) => union(a, b) }
    // Names only seen in negatives still form singleton families.
    negatives.foreach { case (a, b) => { find(a); find(b) } }
    parent.keys.toVector
      .groupBy(find)
      .values
      .map(_.sorted.toVector)
      .toVector
      .sortBy(_.head)
  }
}
