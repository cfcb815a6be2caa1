package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked ground truth for the r16 audit gates (t41 lang-id
  * confusion matrix, t42 script census, q71 Benford, q72 CUSUM drift,
  * q73 star profit, t43 fertility, m21 audio clipping, p32 freshness) on
  * tiny controlled fixtures written as parquet — the same entry points the
  * oracle gate runs, end to end, with every output value computed by hand
  * in the comments. */
class AuditOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixtureDir(): String =
    Files.createTempDirectory("audit-ops").toFile.getAbsolutePath

  test("t41: confusion matrix cells and shares are exact") {
    import spark.implicits._
    val dir = fixtureDir()
    // en-labeled: 3 docs of pure-en stopwords, 1 gibberish (pred und);
    // fr-labeled: 2 docs of fr-only stopwords, 1 of es-only stopwords.
    Seq(
      (1L, "the and of", "en", "s", 10L),
      (2L, "the and of", "en", "s", 10L),
      (3L, "the and of", "en", "s", 10L),
      (4L, "zzz qqq", "en", "s", 7L),
      (5L, "les aux cette", "fr", "s", 13L),
      (6L, "les aux cette", "fr", "s", 13L),
      (7L, "los las como", "fr", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.t41LangIdEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // label rows: en total 4 -> 3/4 = 750000, 1/4 = 250000;
    //             fr total 3 -> 2/3 = 666666, 1/3 = 333333.
    // every pred column here is single-label, so pred shares are 1e6.
    assert(got.toSeq == Seq(
      ("en", "en", 3L, 750000L, 1000000L),
      ("en", "und", 1L, 250000L, 1000000L),
      ("fr", "es", 1L, 333333L, 1000000L),
      ("fr", "fr", 2L, 666666L, 1000000L)))
  }

  test("t42: per-source character-class counts and micro shares") {
    import spark.implicits._
    val dir = fixtureDir()
    // "ab1 c":      5 chars = 3 letters + 1 digit + 1 ws + 0 other
    // "x,\u000By":  4 chars = 2 letters + 0 digit + 1 ws + 1 other
    // (U+000B vertical tab IS in the explicit ws class — the class where
    // Java \s and RE2 \s disagree, hence the explicit class in t42)
    Seq(
      (1L, "ab1 c", "en", "a", 5L),
      (2L, "x,\u000By", "en", "b", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.t42ScriptCensus(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10)))
    assert(got.toSeq == Seq(
      ("a", 1L, 5L, 3L, 1L, 1L, 0L, 600000L, 200000L, 200000L, 0L),
      ("b", 1L, 4L, 2L, 0L, 1L, 1L, 500000L, 0L, 250000L, 250000L)))
  }

  test("q71: leading-digit census, Benford expectation, and deltas") {
    import spark.implicits._
    val dir = fixtureDir()
    // lineitem digits: 10.5 -> 1, 19.99 -> 1, 25.0 -> 2, 999.0 -> 9;
    // 0.5 -> digit 0 and -3.0 -> NULL digit are OUTSIDE Benford's domain
    // and must be excluded from the census (shares stay over 4 rows)
    Seq(10.5, 19.99, 25.0, 999.0, 0.5, -3.0).toDF("l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(5.0).toDF("o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val got = StatQueries.q71Benford(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("l_extendedprice", 1L, 2L, 500000L, 301030L, 198970L),
      ("l_extendedprice", 2L, 1L, 250000L, 176091L, 73909L),
      ("l_extendedprice", 9L, 1L, 250000L, 45757L, 204243L),
      ("o_totalprice", 5L, 1L, 1000000L, 79181L, 920819L)))
  }

  test("q72: scaled deviations, running CUSUM, and the peak flag") {
    import spark.implicits._
    val dir = fixtureDir()
    // three days with 1, 5, 3 events: total 9 over 3 days.
    // dev = events*3 - 9 -> -6, +6, 0; cusum -> -6, 0, 0; peak |-6| day 1.
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 01:00:00")),
      (2L, Timestamp.valueOf("2024-01-02 01:00:00")),
      (3L, Timestamp.valueOf("2024-01-02 02:00:00")),
      (4L, Timestamp.valueOf("2024-01-02 03:00:00")),
      (5L, Timestamp.valueOf("2024-01-02 04:00:00")),
      (6L, Timestamp.valueOf("2024-01-02 05:00:00")),
      (7L, Timestamp.valueOf("2024-01-03 01:00:00")),
      (8L, Timestamp.valueOf("2024-01-03 02:00:00")),
      (9L, Timestamp.valueOf("2024-01-03 03:00:00")))
    rows.toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
    val got = StatQueries.q72CusumDrift(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, -6L, -6L, 1),
      (5L, 6L, 0L, 0),
      (3L, 0L, 0L, 0)))
  }

  test("q73: promo-only star join revenue by (nation, year) is exact") {
    import spark.implicits._
    val dir = fixtureDir()
    Seq((1, "FRANCE", 0), (2, "GERMANY", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((10L, "S10", 1), (20L, "S20", 2))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((100L, "PROMO"), (200L, "STANDARD"))
      .toDF("p_partkey", "p_type")
      .write.parquet(s"$dir/part.parquet")
    Seq((1000L, Timestamp.valueOf("2023-03-01 00:00:00")),
      (2000L, Timestamp.valueOf("2024-05-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    // (order, part, supp, price, disc) — the STANDARD-part line must drop:
    //   (1000,100,10): 10.00 * 0.90 = 9.00  -> FRANCE 2023
    //   (1000,200,10): excluded (p_type STANDARD)
    //   (2000,100,20): 20.00 * 0.75 = 15.00 -> GERMANY 2024
    //   (2000,100,10):  5.00 * 1.00 = 5.00  -> FRANCE 2024
    Seq((1000L, 100L, 10L, 10.0, 0.10),
      (1000L, 200L, 10L, 99.0, 0.50),
      (2000L, 100L, 20L, 20.0, 0.25),
      (2000L, 100L, 10L, 5.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.q73StarProfit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("FRANCE", 2023L, 9.0, 1L),
      ("FRANCE", 2024L, 5.0, 1L),
      ("GERMANY", 2024L, 15.0, 1L)))
  }

  test("t43: per-language fertility counts and micro ratios") {
    import spark.implicits._
    val dir = fixtureDir()
    // "ab cd": 2 tokens; subwords 1 + 1 ws-run + 0 transitions = 2; 5 chars
    // "aB x9": 2 tokens; 1 + 1 ws + (a->B, x->9) = 4 subwords; 5 chars
    // "":      0 tokens, 0 subwords, 0 chars
    // "abc":   1 token, 1 subword, 3 chars
    Seq(
      (1L, "ab cd", "en", "s", 5L),
      (2L, "aB x9", "en", "s", 5L),
      (3L, "", "fr", "s", 0L),
      (4L, "abc", "fr", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.t43Fertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // en: 4 tokens, 6 subwords, 10 chars -> 6e6/4 = 1500000, 10e6/6 = 1666666
    // fr: 1 token,  1 subword,  3 chars -> 1000000, 3000000
    assert(got.toSeq == Seq(
      ("en", 2L, 4L, 6L, 10L, 1500000L, 1666666L),
      ("fr", 2L, 1L, 1L, 3L, 1000000L, 3000000L)))
  }

  test("m21: planted full-scale samples survive the real WAV round-trip") {
    import spark.implicits._
    val dir = fixtureDir()
    // doc 1: n=51 rate=16000, clips at i ≡ 4 (mod 11)  -> {4,15,26,37,48} = 5
    // doc 4: n=54 rate=40000, clips at i ≡ 5 (mod 11)  -> {5,16,27,38,49} = 5
    // doc 7: n=57 rate=24000, clips at i ≡ 6 (mod 11)  -> {6,17,28,39,50} = 5
    // (doc 3 is image-modality: doc_id % 3 != 1, excluded)
    Seq(1L, 3L, 4L, 7L).toDF("doc_id")
      .write.parquet(s"$dir/documents.parquet")
    val got = MultimodalQueries.m21AudioClipping(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (16000L, 1L, 51L, 5L, 1L, 98039L),
      (24000L, 1L, 57L, 5L, 1L, 87719L),
      (40000L, 1L, 54L, 5L, 1L, 92592L)))
  }

  test("m22: silence runs survive the WAV round-trip with exact boundaries") {
    import spark.implicits._
    val dir = fixtureDir()
    // quiet iff ((i + id) div 5) % 4 == 0:
    // doc 1 (n=51): i in 0-3, 19-23, 39-43    -> 14 quiet, longest 5
    // doc 4 (n=54): i in {0}, 16-20, 36-40    -> 11 quiet, longest 5
    // doc 7 (n=57): i in 13-17, 33-37, 53-56  -> 14 quiet, longest 5
    Seq(1L, 3L, 4L, 7L).toDF("doc_id")
      .write.parquet(s"$dir/documents.parquet")
    val got = MultimodalQueries.m22SilenceRuns(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 51L, 14L, 5L),
      (4L, 54L, 11L, 5L),
      (7L, 57L, 14L, 5L)))
  }

  test("p32: lag minutes vs the freshest type; 60-minute SLA boundary") {
    import spark.implicits._
    val dir = fixtureDir()
    // corpus max = click @ 12:00; view lags exactly 60 min (NOT stale,
    // strict >), purchase lags 150 min (stale).
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
      (2L, Timestamp.valueOf("2024-01-01 12:00:00"), "click"),
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), "view"),
      (4L, Timestamp.valueOf("2024-01-01 09:30:00"), "purchase"))
      .toDF("event_id", "ts", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = PipelineQueries.p32FreshnessLag(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    val noon = Timestamp.valueOf("2024-01-01 12:00:00").getTime * 1000L
    assert(got.toSeq == Seq(
      ("click", 2L, noon, 0L, 0),
      ("purchase", 1L, noon - 150L * 60000000L, 150L, 1),
      ("view", 1L, noon - 60L * 60000000L, 60L, 0)))
  }
}
