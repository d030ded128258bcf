package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionTestWrapper

/** Round-trips every Catalyst expression through df.select and SQL,
  * including null-safety and codegen paths.
  */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("register replaces a pre-existing graft_* binding on first call") {
    // a stale or third-party temp function must not shadow the library;
    // only repeat register() calls on an already-populated registry skip
    val fresh = spark.newSession()
    fresh.udf.register("graft_soundex", (s: String) => "BOGUS")
    GraftFunctions.register(fresh)
    import fresh.implicits._
    val got = Seq("Washington").toDF("name")
      .selectExpr("graft_soundex(name)").head().getString(0)
    assert(got == "W252", s"stale binding shadowed the library: $got")
  }

  test("concurrent register(): no caller sees a half-registered session") {
    // the race this pins: a second register() returning while the first is
    // mid-way through binding, so the second caller's immediate
    // call_function hits an undefined function
    (0 until 20).foreach { _ =>
      val fresh = spark.newSession()
      import fresh.implicits._
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 8).map { _ =>
        val t = new Thread(() => {
          try {
            start.await()
            GraftFunctions.register(fresh)
            // must be bound the instant register() returns — including the
            // LAST function in the builders list
            val r = Seq(("Washington", "Smith")).toDF("a", "b")
              .selectExpr("graft_soundex(a)", "graft_minhash_signature(b)")
              .head()
            assert(r.getString(0) == "W252")
          } catch { case e: Throwable => errors.add(e) }
        })
        t.start(); t
      }
      start.countDown()
      threads.foreach(_.join(30000))
      assert(errors.isEmpty, s"concurrent register failed: ${errors.peek()}")
    }
  }

  test("all unary functions via SQL, incl null handling") {
    import spark.implicits._
    val df = Seq("Washington", "Smith", "müller", null).toDF("name")
    df.createOrReplaceTempView("names")
    val rows = spark
      .sql("""SELECT
        graft_soundex(name) AS sx,
        graft_refined_soundex(name) AS rs,
        graft_metaphone(name) AS mp,
        graft_double_metaphone(name) AS dmp,
        graft_nysiis(name) AS ny,
        graft_phonex(name) AS px,
        graft_cologne(name) AS co,
        graft_caverphone1(name) AS c1,
        graft_caverphone2(name) AS c2,
        graft_mra_encode(name) AS mra,
        graft_dm_soundex(name) AS dm,
        graft_dm_encode(name) AS dme
      FROM names""")
      .collect()

    val w = rows(0)
    assert(w.getString(0) == "W252")
    assert(w.getString(2) == "WXNK")
    assert(w.getSeq[String](3).nonEmpty)
    assert(w.getString(4) == "WASANG")

    val s = rows(1)
    assert(s.getString(0) == "S530")
    assert(s.getString(9) == "SMTH")

    val m = rows(2)
    assert(m.getString(6) == "657") // Cologne müller

    val n = rows(3)
    (0 until 12).foreach(i => assert(n.isNullAt(i), s"col $i should be null"))
  }

  test("binary functions") {
    import spark.implicits._
    val df = Seq(("Smith", "Smyth"), ("Karl", "Alessandro")).toDF("a", "b")
    df.createOrReplaceTempView("pairs")
    val rows = spark
      .sql("""SELECT graft_mra_match(a, b), graft_mra_rating(a, b),
        graft_soundex_difference(a, b), graft_jaro_winkler(a, b)
        FROM pairs""")
      .collect()
    assert(rows(0).getBoolean(0))
    assert(rows(0).getInt(2) == 4)
    assert(math.abs(rows(0).getDouble(3) - 0.8933333333333333) < 1e-12)
    assert(!rows(1).getBoolean(0))
  }

  test("explode of array codes lands one name in multiple blocks") {
    import spark.implicits._
    val df = Seq("AUERBACH").toDF("name")
    val blocks = df
      .select(explode(GraftFunctions.graftDmSoundex($"name")).as("code"))
      .collect()
      .map(_.getString(0))
      .toSet
    assert(blocks == Set("097400", "097500"))
  }

  test("column API + metaphone options") {
    import spark.implicits._
    val df = Seq("synchronization").toDF("name")
    val r = df
      .select(
        call_function("graft_metaphone", $"name", lit(0)).as("unbounded"),
        GraftFunctions.graftMetaphone($"name").as("m4"))
      .head()
    assert(r.getString(0) == "SNXRNSXN")
    assert(r.getString(1) == "SNXR")
  }

  test("beider-morse via SQL and column API") {
    import spark.implicits._
    val df = Seq("Angelo", null).toDF("name")
    df.createOrReplaceTempView("bm_names")
    val rows = spark.sql(
      """SELECT graft_beider_morse(name, 'gen', 'exact') AS raw,
        |  graft_bm_codes(name) AS codes FROM bm_names""".stripMargin)
      .collect()
    assert(rows(0).getString(0) ===
      "anZelo|andZelo|angelo|anhelo|anjelo|anxelo")
    assert(rows(0).getSeq[String](1).nonEmpty)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    val exploded = Seq("D'Angelo").toDF("name")
      .select(explode(GraftFunctions.graftBmCodes($"name")).as("code"))
      .collect().map(_.getString(0)).toSet
    // prefix groups flatten: variants both with and without the d'
    assert(exploded.contains("angilo") && exploded.contains("dangilo"))
  }

  test("new round-2 SQL surface: variants, dm-equal, bm language functions") {
    import spark.implicits._
    val df = Seq(("Dodds", "jumped")).toDF("a", "b")
    df.createOrReplaceTempView("r2")
    val r = spark.sql(
      """SELECT graft_soundex_simplified(a),
        |  graft_soundex_mapping(b, '01360240043788015936020505'),
        |  graft_double_metaphone_equal(a, b),
        |  graft_double_metaphone_equal(a, a, true),
        |  graft_bm_guess_lang('Renault'),
        |  graft_bm_encode_langs('Angelo', 'gen', 'exact', true, 20,
        |    'italian')
        |FROM r2""".stripMargin).head()
    assert(r.getString(0) == "D320")
    assert(r.getString(1) == "J816")
    assert(!r.getBoolean(2))
    assert(r.getBoolean(3))
    assert(r.getString(4) == "french")
    assert(r.getString(5) == "andZelo")
  }

  test("option arguments are validated with clear errors") {
    import spark.implicits._
    Seq("x").toDF("s").createOrReplaceTempView("argcheck")
    // non-literal option argument
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_metaphone(s, length(s)) FROM argcheck")
        .collect())
    assert(e1.getMessage.contains("must be a literal"), e1.getMessage)
    // NULL option argument
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_nysiis(s, CAST(NULL AS BOOLEAN)) FROM argcheck")
        .collect())
    assert(e2.getMessage.contains("must not be NULL"), e2.getMessage)
    // wrong arity
    val e3 = intercept[Exception](
      spark.sql("SELECT graft_soundex(s, 1, 2, 3) FROM argcheck").collect())
    assert(e3.getMessage.contains("number of arguments") ||
      e3.getMessage.contains("arguments"), e3.getMessage)
  }

  test("GraftExtensions injects functions via spark.sql.extensions") {
    // the extensions deployment path: no register() call — the session is
    // built with GraftExtensions applied (spark.sql.extensions is a
    // context-static conf, so in-suite we exercise the same class through
    // the public programmatic builder hook over the shared context)
    import org.apache.spark.sql.SparkSession
    assert(spark.sparkContext.isLocal) // force shared context creation
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions()(_))
        .getOrCreate()
      val code = s2.sql("SELECT graft_soundex('Washington')")
        .head().getString(0)
      assert(code == "W252")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("expressions stay codegen-friendly (no ScalaUDF in plan)") {
    import spark.implicits._
    val df = Seq("Washington").toDF("name")
      .select(GraftFunctions.graftSoundex($"name").as("k"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
