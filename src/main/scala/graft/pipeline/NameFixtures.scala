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

  /** The fused identifier form a name takes as a code token (see
    * [[RepoFiles.row]] + [[Tokenizer]]).
    */
  private def tokenOf(name: String): String =
    name.filter(_.isLetter).toLowerCase

  /** Ground-truth families for the synthetic generator: the transitive
    * closure of "co-blocked and [[Scoring.clusterMatch]]" over all fixture
    * names — exactly the entity partition the pipeline's blocking +
    * clustering criteria define ("at identical blocking keys", north rule),
    * so the end-to-end test checks the distributed machinery (blocking
    * recall, pair generation, connected components), while comparator
    * correctness vs the reference is covered by the encoder golden suites
    * and the pairwise-F1 test.
    */
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
    (positives ++ negatives).foreach { case (a, b) => { find(a); find(b) } }
    val names = parent.keys.toVector.sorted
    val keysOf = names.map(n => n -> Blocking.scalarBlockKeys(tokenOf(n))).toMap
    for {
      i <- names.indices
      j <- (i + 1) until names.length
      ta = tokenOf(names(i))
      tb = tokenOf(names(j))
      if keysOf(names(i)).exists(keysOf(names(j))) &&
        Scoring.clusterMatch(ta, tb)
    } union(names(i), names(j))
    names
      .groupBy(find)
      .values
      .map(_.sorted.toVector)
      .toVector
      .sortBy(_.head)
  }
}
