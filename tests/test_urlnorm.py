"""URL canonicalization (functions/urlnorm.py) — rule-by-rule hand
cases plus idempotence."""

from pyspark.sql import functions as F

from whoiswho_spark.functions.urlnorm import canonical_url_col

CASES = {
    # scheme/host case-fold, www strip, default port, fragment, tracking
    # params dropped, query sorted, trailing slash folded
    "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag":
        "http://example.com/a/b?a=1&b=2",
    # https default port + root slash kept
    "https://example.com:443/": "https://example.com/",
    # empty path becomes /
    "https://example.com": "https://example.com/",
    # non-default port kept; path case preserved
    "http://example.com:8080/Docs/": "http://example.com:8080/Docs",
    # all params tracking -> no ?
    "http://example.com/a?fbclid=z&utm_medium=m": "http://example.com/a",
    # dangling ? dropped
    "http://example.com/a?": "http://example.com/a",
    # ref is a tracking param; the rest sort
    "http://example.com/a/b?b=2&a=1&ref=t": "http://example.com/a/b?a=1&b=2",
    # 'www-' prefixed host is NOT the www. label
    "HTTPS://Sub.WWW-site.org/Path": "https://sub.www-site.org/Path",
    # http on 443 is a real port
    "http://example.com:443/x": "http://example.com:443/x",
    # no scheme -> honest pass-through
    "not a url": "not a url",
    "example.com/a": "example.com/a",
}


def test_canonical_url_hand_cases(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = {
        r.url: r.c
        for r in df.select("url", canonical_url_col(F.col("url")).alias("c")).collect()
    }
    assert got == CASES


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in CASES.values()], "url string")
    got = [
        (r.url, r.c)
        for r in df.select("url", canonical_url_col(F.col("url")).alias("c")).collect()
    ]
    assert all(u == c for u, c in got), [g for g in got if g[0] != g[1]]
