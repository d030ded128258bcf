package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.phonetic._

/** Dev drive: run the phonetic core through a real Spark session over the
  * driver testdata. Not part of the driver contract.
  */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val soundexU = udf((s: String) => Soundex.default.encode(s))
    val metaphoneU = udf((s: String) => Metaphone.default.encode(s))
    val nysiisU = udf((s: String) => Nysiis.default.encode(s))
    val cologneU = udf((s: String) => Cologne.encode(s))
    val cav2U = udf((s: String) => Caverphone2.encode(s))
    val phonexU = udf((s: String) => Phonex.default.encode(s))
    val mraU = udf((s: String) => MatchRatingApproach.encode(s))
    val refinedU = udf((s: String) => RefinedSoundex.default.encode(s))

    val dmU = udf((s: String) =>
      DaitchMokotoff.default.innerSoundex(s, branching = true))
    val dblU = udf { (s: String) =>
      val r = DoubleMetaphone.default.doubleMetaphone(s)
      Seq(r.primary, r.alternate)
    }

    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_name"))
      .withColumn("dm_codes", dmU($"c_name"))
      .withColumn("double_metaphone", dblU($"c_name"))
      .withColumn("soundex", soundexU($"c_name"))
      .withColumn("refined", refinedU($"c_name"))
      .withColumn("metaphone", metaphoneU($"c_name"))
      .withColumn("nysiis", nysiisU($"c_name"))
      .withColumn("cologne", cologneU($"c_name"))
      .withColumn("caverphone2", cav2U($"c_name"))
      .withColumn("phonex", phonexU($"c_name"))
      .withColumn("mra", mraU($"c_name"))
    df.show(10, truncate = false)

    // MRA pairwise comparator over a self-join on soundex blocking key
    val a = df.select($"c_name".as("name_a"), $"soundex")
    val b = df.select($"c_name".as("name_b"), $"soundex")
    val mraEq = udf((x: String, y: String) =>
      MatchRatingApproach.isEncodedEquals(x, y))
    val pairs = a.join(b, "soundex").where($"name_a" < $"name_b")
      .withColumn("mra_match", mraEq($"name_a", $"name_b"))
    println(s"blocked pairs: ${pairs.count()}")
    pairs.show(10, truncate = false)

    spark.stop()
  }
}
