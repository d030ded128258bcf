package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench measurement-protocol pins: a throwing query must surface in the
  * artifact as an error, never as a fast row; the probe gate must accept
  * a healthy window without burning retries.
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("a throwing query is recorded as -1 + an error, not a fast time") {
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame](
      "q_ok" -> ((s, _) => s.range(10).toDF("n")),
      "q_broken" -> ((s, _) =>
        // fails at analysis when the pass executes it (count() prunes
        // projections, so a throwing SELECT column would not do)
        s.range(1).toDF("id").filter(org.apache.spark.sql.functions
          .expr("assert_true(id > 5, 'deliberate')").isNotNull)))
    val (times, errs) = Bench.runQueryPass(spark, "/unused", queries)
    val t = times.toMap
    assert(t("q_ok") >= 0.0)
    assert(t("q_broken") == -1.0,
      s"broken query must read -1, got ${t("q_broken")}")
    assert(errs.contains("q_broken") && errs("q_broken").nonEmpty,
      errs.toString)
    assert(!errs.contains("q_ok"))
    // the error string is embedded raw inside a JSON string literal —
    // it must carry no characters that would break the artifact line
    assert(!errs("q_broken").exists(c => c == '"' || c == '\\' || c == '\n'),
      errs("q_broken"))
  }

  test("probe gate returns live probes and a bounded attempt count") {
    val (p4, p16, attempts, _) = Bench.probeUntilHealthy(
      floor16 = 1L, maxAttempts = 2)
    assert(p4 > 0 && p16 > 0)
    assert(attempts >= 1 && attempts <= 2)
  }
}
