package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for [[Urls.canonicalizeUrl]] — one expectation per rule
  * plus the collision behavior the t11 gate relies on. */
class UrlsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("case, default port, www, fragment, trailing slash, tracking params") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/Path/?b=2&utm_source=x&a=1#frag",
      "https://example.com/Path?a=1&b=2",
      "http://example.com:80/",
      "http://example.com",
      "http://example.com:8080/x/",     // non-default port survives
      "https://example.com:80/x",       // 80 is NOT https' default
      "https://host.com/p?utm_source=a&utm_campaign=b&gclid=1&fbclid=2&ref=r"
    ) == Seq(
      "https://example.com/Path?a=1&b=2",
      "https://example.com/Path?a=1&b=2",
      "http://example.com/",
      "http://example.com/",
      "http://example.com:8080/x",
      "https://example.com:80/x",
      "https://host.com/p"))
  }

  test("path case and real params are preserved; params sort bytewise") {
    assert(canon("https://a.com/CaseSensitive/Path?z=1&y=2&x=3") ==
      Seq("https://a.com/CaseSensitive/Path?x=3&y=2&z=1"))
    // www only strips as a PREFIX label
    assert(canon("https://www2.a.com/p", "https://awww.a.com/p") ==
      Seq("https://www2.a.com/p", "https://awww.a.com/p"))
  }

  test("a '?' inside the fragment is not a query") {
    // RFC 3986: '#' ends the query-able part — '?x=1' here is fragment
    // content and must not survive canonicalization
    assert(canon(
      "https://a.com/p#frag?x=1",
      "https://a.com/p?a=1#frag?x=2&utm_source=s"
    ) == Seq(
      "https://a.com/p",
      "https://a.com/p?a=1"))
  }

  test("looksLikeUrl accepts absolute urls, rejects junk") {
    import spark.implicits._
    val flags = Seq("https://a.com/x", "ftp://h/x", "not a url",
      "http://", "mailto:x@y.z").toDF("u")
      .select(Urls.looksLikeUrl(col("u"))).collect().map(_.getBoolean(0)).toSeq
    assert(flags == Seq(true, true, false, false, false))
  }
}
