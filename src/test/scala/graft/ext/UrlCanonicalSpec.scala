package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlCanonicalSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(foldPathCase: Boolean, urls: String*): Seq[(String, String, String)] =
    UrlCanonical.canonicalize(
        urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url"),
        "url", foldPathCase = foldPathCase)
      .orderBy(col("id"))
      .select(col("canonical_url"), col("url_host"), col("registrable_domain"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  private def canon(urls: String*): Seq[(String, String, String)] =
    canon(false, urls: _*)

  test("scheme/host case, www, default port, trailing slash, tracking " +
      "params and param order all collapse (foldPathCase=true)") {
    val variants = Seq(
      "HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&id=3&v=1",
      "https://example.com/a/b?v=1&id=3",
      "Https://www.EXAMPLE.com/a/b/?id=3&utm_campaign=y&v=1&fbclid=z")
    val out = canon(true, variants: _*)
    assert(out.map(_._1).distinct == Seq("https://example.com/a/b?id=3&v=1"),
      s"got ${out.map(_._1)}")
    assert(out.forall(_._2 == "example.com"))
    assert(out.forall(_._3 == "example.com"))
  }

  test("default keeps path case (RFC 3986): /A/B and /a/b stay distinct") {
    val out = canon("https://example.com/A/B", "https://example.com/a/b")
    assert(out.map(_._1) == Seq(
      "https://example.com/A/B", "https://example.com/a/b"))
  }

  test("non-default ports are kept; http/https defaults are stripped") {
    val out = canon(
      "http://h.com:80/x", "http://h.com:8080/x", "https://h.com:443/x",
      "https://h.com:8443/x")
    assert(out.map(_._1) == Seq(
      "http://h.com/x", "http://h.com:8080/x", "https://h.com/x",
      "https://h.com:8443/x"))
  }

  test("empty path normalizes to '/', query-only URLs keep it") {
    val out = canon("http://h.com", "http://h.com/", "http://h.com?a=1")
    assert(out.map(_._1) == Seq(
      "http://h.com/", "http://h.com/", "http://h.com/?a=1"))
  }

  test("registrable domain via PSL: co.uk family takes three labels, " +
      "plain TLDs two; www strips but cdn does not") {
    val out = canon(
      "http://www.shop.co.uk/", "http://cdn.shop.co.uk/",
      "http://a.b.shop.com/", "http://shop.io/", "http://localhost/")
    assert(out.map(_._3) == Seq(
      "shop.co.uk", "shop.co.uk", "shop.com", "shop.io", "localhost"))
    assert(out.map(_._2) == Seq(
      "shop.co.uk", "cdn.shop.co.uk", "a.b.shop.com", "shop.io", "localhost"))
  }

  test("PSL private suffixes: each github.io user site is its own " +
      "registrable domain (the heuristic this replaced merged them)") {
    val out = canon(
      "http://alice.github.io/", "http://cdn.alice.github.io/p",
      "http://bob.github.io/", "http://photos.blogspot.com/x")
    assert(out.map(_._3) == Seq(
      "alice.github.io", "alice.github.io", "bob.github.io",
      "photos.blogspot.com"))
  }

  test("PSL wildcard and exception rules: *.ck consumes one extra label, " +
      "!www.ck restores ck as the suffix; deep amazonaws wildcards work") {
    val out = canon(
      "http://shop.foo.ck/", // *.ck → suffix foo.ck → reg shop.foo.ck
      "http://foo.www.ck/", // !www.ck → suffix ck → reg www.ck
      "http://foo.ck/", // *.ck → suffix foo.ck = host → fallback host
      "http://x.eu-1.compute.amazonaws.com/",
      "http://b.s3.amazonaws.com/")
    assert(out.map(_._3) == Seq(
      "shop.foo.ck", "www.ck", "foo.ck",
      "x.eu-1.compute.amazonaws.com", "b.s3.amazonaws.com"))
  }

  test("PSL exception at full depth: city.kawasaki.jp is registrable " +
      "while sibling prefecture hosts sit under the wildcard") {
    val out = canon(
      "http://city.kawasaki.jp/", "http://ward.city.kawasaki.jp/",
      "http://shop.foo.kawasaki.jp/")
    assert(out.map(_._3) == Seq(
      "city.kawasaki.jp", "city.kawasaki.jp", "shop.foo.kawasaki.jp"))
  }

  test("only tracking params are dropped; remaining params sort") {
    val out = canon(
      "http://h.com/p?z=2&utm_source=a&a=1&gclid=g&msclkid=m&ref=r&refresh=1")
    // `ref=` matches exactly; `refresh=1` must survive (prefix is ref=, not ref)
    assert(out.head._1 == "http://h.com/p?a=1&refresh=1&z=2")
  }

  test("dupClusters groups by canonical equality with min-id cluster ids") {
    val df = Seq(
      (1L, "http://A.com/x"), (2L, "http://a.com/x/"), (3L, "http://a.com/y"),
      (4L, "HTTP://WWW.A.COM/x")
    ).toDF("doc_id", "url")
    val rows = UrlCanonical.dupClusters(df, "url", "doc_id",
      foldPathCase = true).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("canonical_url") == "http://a.com/x")
    assert(r.getAs[Long]("cluster_size") == 3L)
    assert(r.getAs[Long]("n_raw_variants") == 3L)
    assert(r.getAs[Long]("cluster_id") == 1L)
  }

  test("domainStats: dup_rate reflects canonical collapse") {
    val df = Seq(
      (1L, "http://a.com/x"), (2L, "http://WWW.a.com/x"),
      (3L, "http://a.com/y"), (4L, "http://b.org/z")
    ).toDF("doc_id", "url")
    val got = UrlCanonical.domainStats(df, "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    assert(got("a.com") == ((3L, 3L, 2L, 0.333333)))
    assert(got("b.org") == ((1L, 1L, 1L, 0.0)))
  }

  test("canonicalize plan stays shuffle-free: PSL probes are broadcast " +
      "joins only") {
    val df = Seq((1L, "http://a.github.io/x")).toDF("doc_id", "url")
    val plan = UrlCanonical.canonicalize(df, "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in canonicalize plan:\n$plan")
  }
}
