package graft.pipeline // for access to the package-private generator internals

/** Driver-side diagnosis of cross-entity merges in the synthetic 800k run:
  * for every pair of SYNTH entity base names that shares a blocking key,
  * which cluster-edge criterion (exact / metaphone_eq / mra+jw) fires?
  * Usage: MergeDiagnose [nEntities]
  */
object MergeDiagnose {
  def main(args: Array[String]): Unit = {
    val nEntities = args.headOption.map(_.toInt).getOrElse(32000)
    val names: Seq[(Long, String)] = (41L until nEntities.toLong)
      .map(e => e -> RepoFiles.synthBase(e))

    // metaphone collisions across entities
    val byMeta = names.groupBy(n => graft.phonetic.Metaphone.unbounded.encode(n._2))
    val metaCollide = byMeta.values.filter(_.size > 1).toSeq
    println(s"DIAG metaphone-collision groups=${metaCollide.size} " +
      s"entities=${metaCollide.map(_.size).sum}")

    // co-blocked cross-entity pairs by criterion
    val byKey = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, String)]]
    names.foreach { case (e, n) =>
      Blocking.scalarBlockKeys(n).foreach { k =>
        byKey.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty)
          .append((e, n))
      }
    }
    var exact = 0L; var meta = 0L; var mraJw = 0L
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    var bigBlocks = 0
    byKey.values.foreach { members =>
      if (members.size > 200) bigBlocks += 1
      else {
        var i = 0
        while (i < members.size) {
          var j = i + 1
          while (j < members.size) {
            val (ea, na) = members(i); val (eb, nb) = members(j)
            if (ea != eb && seen.add((math.min(ea, eb), math.max(ea, eb)))) {
              if (na == nb) exact += 1
              else if (graft.phonetic.Metaphone.unbounded.encode(na) ==
                graft.phonetic.Metaphone.unbounded.encode(nb)) meta += 1
              else if (graft.phonetic.MatchRatingApproach.isEncodedEquals(na, nb) &&
                graft.phonetic.JaroWinkler.similarity(na, nb) >= 0.85) mraJw += 1
            }
            j += 1
          }
          i += 1
        }
      }
    }
    println(s"DIAG cross-entity co-blocked pairs: exact=$exact " +
      s"metaphone_eq=$meta mra_jw=$mraJw bigBlocksSkipped=$bigBlocks")

    // candidate tightenings of the MRA cluster-edge corroboration: how
    // many cross-entity pairs survive each, and do all fixture families
    // stay transitively connected through edges passing it?
    import graft.phonetic.{JaroWinkler, MatchRatingApproach, Metaphone}
    def mraPass(a: String, b: String, jwGate: Double, levGate: Int): Boolean =
      MatchRatingApproach.isEncodedEquals(a, b) && {
        val jw = JaroWinkler.similarity(a, b)
        jw >= jwGate && levenshtein(a, b) <= levGate
      }
    def levenshtein(a: String, b: String): Int = {
      val d = Array.tabulate(b.length + 1)(identity)
      var i = 1
      while (i <= a.length) {
        var prev = d(0); d(0) = i
        var j = 1
        while (j <= b.length) {
          val t = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
          j += 1
        }
        i += 1
      }
      d(b.length)
    }

    def sxDiff(a: String, b: String): Int =
      graft.phonetic.Soundex.default.difference(a, b)
    def rsDiff(a: String, b: String): Int =
      graft.phonetic.RefinedSoundex.default.difference(a, b)
    val variants = Seq(
      ("jw085", (a: String, b: String) => mraPass(a, b, 0.85, Int.MaxValue)),
      ("jw090", (a: String, b: String) => mraPass(a, b, 0.90, Int.MaxValue)),
      ("jw092", (a: String, b: String) => mraPass(a, b, 0.92, Int.MaxValue)),
      ("jw085lev2", (a: String, b: String) => mraPass(a, b, 0.85, 2)),
      ("jw085lev1", (a: String, b: String) => mraPass(a, b, 0.85, 1)),
      ("jw090_or_lev2", (a: String, b: String) =>
        mraPass(a, b, 0.90, Int.MaxValue) || mraPass(a, b, 0.85, 2)),
      ("jw092_or_lev2", (a: String, b: String) =>
        mraPass(a, b, 0.92, Int.MaxValue) || mraPass(a, b, 0.85, 2)),
      ("jw085_sx4", (a: String, b: String) =>
        mraPass(a, b, 0.85, Int.MaxValue) && sxDiff(a, b) == 4),
      ("jw085_rs6", (a: String, b: String) =>
        mraPass(a, b, 0.85, Int.MaxValue) && rsDiff(a, b) >= 6),
      ("jw085_sx4_or_lev2", (a: String, b: String) =>
        (mraPass(a, b, 0.85, Int.MaxValue) && sxDiff(a, b) == 4) ||
          mraPass(a, b, 0.85, 2)),
      ("jw090_or_lev2_or_prefix", (a: String, b: String) =>
        mraPass(a, b, 0.85, Int.MaxValue) &&
          (JaroWinkler.similarity(a, b) >= 0.90 || levenshtein(a, b) <= 2 ||
            (math.min(a.length, b.length) >= 3 &&
              (a.startsWith(b) || b.startsWith(a))))),
      ("noMra", (_: String, _: String) => false))

    variants.foreach { case (vname, pass) =>
      var cross = 0L
      byKey.values.foreach { members =>
        if (members.size <= 200) {
          var i = 0
          while (i < members.size) {
            var j = i + 1
            while (j < members.size) {
              val (ea, na) = members(i); val (eb, nb) = members(j)
              if (ea != eb && na != nb &&
                Metaphone.unbounded.encode(na) != Metaphone.unbounded.encode(nb) &&
                pass(na, nb)) cross += 1
              j += 1
            }
            i += 1
          }
        }
      }
      // fixture-family connectivity: union-find over variants with
      // (exact || metaphone_eq || this-MRA-variant) edges
      var disconnected = 0
      NameFixtures.families.foreach { fam =>
        val ns = fam.map(_.toLowerCase).distinct
        val parent = Array.tabulate(ns.length)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        for (i <- ns.indices; j <- (i + 1) until ns.length) {
          val (a, b) = (ns(i), ns(j))
          val edge = a == b ||
            Metaphone.unbounded.encode(a) == Metaphone.unbounded.encode(b) ||
            pass(a, b)
          if (edge) parent(find(i)) = find(j)
        }
        if (ns.indices.map(find).distinct.size > 1) {
          disconnected += 1
          if (vname == "jw090_or_lev2" || vname == "jw085lev2") {
            val comps = ns.indices.groupBy(find).values
              .map(_.map(ns).mkString("/")).mkString(" || ")
            println(s"DIAG   [$vname] split family: $comps")
            // the bridging pairs the current criterion used
            for (i <- ns.indices; j <- (i + 1) until ns.length) {
              val (a, b) = (ns(i), ns(j))
              if (Metaphone.unbounded.encode(a) != Metaphone.unbounded.encode(b) &&
                mraPass(a, b, 0.85, Int.MaxValue) && !pass(a, b))
                println(f"DIAG     lost bridge: $a/$b " +
                  f"jw=${JaroWinkler.similarity(a, b)}%.3f " +
                  f"lev=${levenshtein(a, b)}")
            }
          }
        }
      }
      println(s"DIAG variant=$vname crossEntityPairs=$cross " +
        s"disconnectedFixtureFamilies=$disconnected/" +
        s"${NameFixtures.families.length}")
    }
  }
}
