"""URL/domain operators: parsing edge cases, per-domain stats, size-gated
blocklist filtering."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data2neo_spark.operators import web as W


def test_url_parsing(spark):
    rows = [
        (0, "https://www.example.com/a/b/c?q=1"),
        (1, "http://sub.shop.co.uk/item"),
        (2, "https://EXAMPLE.ORG"),
        (3, "https://host.io:8080/x/"),
        (4, "not a url"),
        (5, "ftp://files.example.net/pub"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "url"]))
    got = {r["i"]: (r["host"], r["registered_domain"], r["tld"], r["path_depth"])
           for r in W.with_url_parts(df).collect()}
    assert got[0] == ("www.example.com", "example.com", "com", 3)
    assert got[1] == ("sub.shop.co.uk", "shop.co.uk", "uk", 1)
    assert got[2] == ("example.org", "example.org", "org", 0)
    assert got[3] == ("host.io", "host.io", "io", 1)
    assert got[4] == (None, None, None, 0)
    assert got[5] == ("files.example.net", "example.net", "net", 1)


def test_domain_stats(spark):
    rows = [
        ("https://a.x.com/1", "one two"),
        ("https://b.x.com/2", "three four five"),
        ("https://y.org/", "six"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    got = {r["registered_domain"]: r for r in W.domain_stats(df).collect()}
    assert got["x.com"]["n_docs"] == 2 and got["x.com"]["n_hosts"] == 2
    assert got["x.com"]["avg_words_x10"] == 25  # (2+3)/2 words = 2.5
    assert got["y.org"]["n_docs"] == 1


def test_blocklist_small_inlines_and_filters(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "url": ["https://spam.biz/x", "https://good.com/y", "no-url"],
        "text": ["a", "b", "c"],
    }))
    bl = spark.createDataFrame(pd.DataFrame({"domain": ["spam.biz"]}))
    out = W.filter_domain_blocklist(df, bl)
    assert sorted(r["text"] for r in out.collect()) == ["b", "c"]
    assert out.columns == ["url", "text"]
    # small list → no join in the plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_blocklist_large_uses_anti_join(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "url": ["https://spam0.biz/x", "https://good.com/y"],
        "text": ["a", "b"],
    }))
    big = spark.range(300_000).selectExpr("concat('spam', id, '.biz') AS domain")
    out = W.filter_domain_blocklist(df, big)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join LeftAnti" in plan
    assert [r["text"] for r in out.collect()] == ["b"]


def test_dotless_and_suffix_edge_hosts(spark):
    rows = [
        (0, "http://localhost/admin"),        # dotless host → itself
        (1, "https://co.uk/"),                # bare two-label suffix
        (2, "https://a.b.c.d.example.com/x"), # deep subdomains → eTLD+1
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "url"]))
    got = {r["i"]: r["registered_domain"] for r in W.with_url_parts(df).collect()}
    assert got[0] == "localhost"
    assert got[1] == "co.uk"     # no third label available → falls back
    assert got[2] == "example.com"


def test_extract_links_and_link_graph(spark):
    from pyspark.sql import functions as F
    from data2neo_spark.operators.web import extract_links, link_graph

    html = (
        '<html><head><title>t</title></head><body>'
        '<a href="https://b.example/x">one</a>'
        '<a href="https://c.example/y">two</a>'
        '<a href="/relative/path">rel</a>'
        '<a href="https://a.example/self">self</a>'
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://a.example/p/1", html.encode())], "url string, html binary"
    )
    links = extract_links(pages).collect()
    assert len(links) == 4
    by_url = {r.dst_url: r.dst_host for r in links}
    assert by_url["https://b.example/x"] == "b.example"
    # relative href resolves to the page's own host
    assert by_url["/relative/path"] == "a.example"

    g = {(r.src_host, r.dst_host): r.n_links for r in link_graph(pages).collect()}
    # self-loops (explicit and via relative) dropped
    assert g == {("a.example", "b.example"): 1, ("a.example", "c.example"): 1}

    g2 = link_graph(pages, drop_self_loops=False)
    assert g2.where(
        (F.col("src_host") == "a.example") & (F.col("dst_host") == "a.example")
    ).collect()[0].n_links == 2


def test_canonical_url_and_dedup(spark):
    from pyspark.sql import functions as F
    from data2neo_spark.operators.web import canonical_url, dedup_urls

    urls = [
        "https://Example.org/a/b/?utm_source=x&z=1&a=2#frag",
        "https://example.org:8080/a/b?a=2&z=1",
        "HTTPS://example.org/a/b?z=1&a=2&fbclid=abc",
        "https://example.org/",
        "https://example.org",
        "https://other.example/x?ref=news&utm_campaign=c",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    c = {r.url: r.c for r in
         df.select("url", canonical_url(F.col("url")).alias("c")).collect()}
    # case, port, fragment, tracking junk, param order, trailing slash
    # all collapse to one form
    assert c[urls[0]] == c[urls[1]] == c[urls[2]] == "https://example.org/a/b?a=2&z=1"
    assert c[urls[3]] == c[urls[4]] == "https://example.org/"
    # ref/utm dropped but real params kept; path case preserved
    assert c[urls[5]] == "https://other.example/x"

    out = {r.canonical_url: (r.n_variants, r.keep_url)
           for r in dedup_urls(df).collect()}
    assert out["https://example.org/a/b?a=2&z=1"][0] == 3
    # deterministic keeper: lexicographic min of the raw variants
    assert out["https://example.org/a/b?a=2&z=1"][1] == urls[2]


def test_anchor_texts_and_alias_dictionary(spark):
    from data2neo_spark.operators.web import alias_dictionary, anchor_texts

    html = (
        '<html><body>'
        '<a href="https://wiki.example/Spark">Apache Spark</a>'
        '<a href="https://wiki.example/Spark" class="x">Spark</a>'
        '<a href="/local">ignored-empty-host-resolution</a>'
        '<a href="https://wiki.example/Flink"></a>'  # empty text
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://a.example/p", html.encode())], "url string, html binary"
    )
    rows = {(r.dst_host, r.anchor_text) for r in anchor_texts(pages).collect()}
    assert ("wiki.example", "Apache Spark") in rows
    assert ("wiki.example", "Spark") in rows  # attributes after href ok
    assert ("a.example", "ignored-empty-host-resolution") in rows  # relative
    assert ("wiki.example", "") in rows

    d = {(r.dst_host, r.anchor_text): r.n
         for r in alias_dictionary(pages).collect()}
    assert ("wiki.example", "") not in d  # empty text dropped
    assert d[("wiki.example", "Apache Spark")] == 1
