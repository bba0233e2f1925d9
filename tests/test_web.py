"""URL normalization and URL-seen dedup."""

from pyspark.sql import functions as F

from presto_bloomfilter_spark.operators import web


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    return [r.n for r in df.select(
        web.url_normalize_col(F.col("url")).alias("n")).collect()]


def test_url_normalize_steps(spark):
    got = _norm(spark, [
        "HTTP://Example.COM:80/A/b/?utm_source=x&q=1#frag",
        "https://example.com:443/",
        "http://example.com:8080/x/",
        "http://example.com/p?utm_campaign=a&ref=b&keep=1&fbclid=z",
        "http://example.com/p?utm_only=1",
        "example.com/no/scheme/",
        "",
    ])
    assert got[0] == "http://example.com/A/b?q=1"   # path case PRESERVED
    assert got[1] == "https://example.com/"          # root slash kept
    assert got[2] == "http://example.com:8080/x"     # non-default port kept
    assert got[3] == "http://example.com/p?keep=1"
    assert got[4] == "http://example.com/p"          # empty query dropped
    assert got[5] == "example.com/no/scheme"         # schemeless passthrough
    assert got[6] == ""


def test_url_normalize_scheme_in_query_not_stripped(spark):
    [n] = _norm(spark, ["http://a.com/r?u=http://b.com/x/"])
    # only the LEADING scheme is stripped; the embedded URL param and
    # its trailing slash (part of the query, not the path) survive
    assert n == "http://a.com/r?u=http://b.com/x/"


def test_domain_of(spark):
    df = spark.createDataFrame(
        [(1, "HTTPS://Sub.Host.ORG:8443/p?q=1"), (2, "plain.net/x"),
         (3, None)], "doc_id long, url string")
    got = [r.d for r in df.select(
        web.domain_of_col(F.col("url")).alias("d")).orderBy("doc_id").collect()]
    assert got == ["sub.host.org", "plain.net", ""]


def test_url_dedup_keeps_min_id(spark):
    df = spark.createDataFrame([
        (3, "http://example.com/a/b/"),
        (1, "HTTP://EXAMPLE.com:80/a/b?utm_source=t"),
        (2, "http://example.com/a/b"),
        (9, "http://example.com/other"),
    ], "doc_id long, url string")
    out = sorted((r.doc_id, r.norm_url) for r in web.url_dedup(df).collect())
    assert out == [(1, "http://example.com/a/b"),
                   (9, "http://example.com/other")]


def test_url_ops_map_only_plan(spark):
    df = spark.createDataFrame([(1, "http://a.com/")],
                               "doc_id long, url string")
    plan = (web.url_normalize(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan
    dplan = (web.url_dedup(df)
             ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in dplan and "Python" not in dplan
