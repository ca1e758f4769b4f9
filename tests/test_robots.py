import duckdb
from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.operators.robots import (
    _parse_robots_text,
    filter_robots_disallowed,
    parse_robots,
)


def test_parse_robots_grammar_arms():
    txt = """
# top comment
User-agent: engine-bot
Disallow: /private/
Allow: /private/ok
Crawl-delay: 5

User-agent: a
User-agent: b
Disallow: /shared$
Allow:

User-agent: *
Disallow: /tmp*junk
Disallow:
"""
    rules = _parse_robots_text(txt)
    assert ("engine-bot", False, "/private/") in rules
    assert ("engine-bot", True, "/private/ok") in rules
    # consecutive User-agent lines share the group's rules
    assert ("a", False, "/shared") in rules and ("b", False, "/shared") in rules
    # '$' anchor dropped, '*' truncates to the literal prefix
    assert ("*", False, "/tmp") in rules
    # empty Allow and empty Disallow emit no rule
    assert not any(p == "" for _, _, p in rules)
    assert _parse_robots_text("") == []
    # rules before any User-agent are void
    assert _parse_robots_text("Disallow: /x") == []


def test_filter_robots_disallowed_semantics(spark):
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok"),
            ("b.com", "User-agent: engine-bot\nDisallow: /\n"
                      "User-agent: *\nDisallow: /none"),
            ("c.com", "User-agent: otherbot\nDisallow: /"),
        ],
        ["domain", "robots_txt"],
    )
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [
            (1, "a.com", "https://a.com/private/x"),       # disallowed
            (2, "a.com", "https://a.com/private/ok/page"), # allow wins (longer)
            (3, "a.com", "https://a.com/public"),          # no match -> allow
            (4, "b.com", "https://b.com/anything"),        # exact group: all blocked
            (5, "c.com", "https://c.com/x"),   # only otherbot blocked -> '*absent' allow
            (6, "d.com", "https://d.com/x"),   # no robots at all -> allow
        ],
        ["doc_id", "domain", "url"],
    )
    kept = sorted(
        r.doc_id
        for r in filter_robots_disallowed(
            urls, rules, agent="engine-bot"
        ).collect()
    )
    assert kept == [2, 3, 5, 6]

    # DuckDB pin of the matching stage (longest prefix, allow wins ties)
    rpdf = rules.toPandas()
    updf = urls.toPandas()
    con = duckdb.connect()
    con.register("rules", rpdf)
    con.register("urls", updf)
    got = con.sql(
        """
        WITH r AS (
          SELECT *, CASE WHEN agent = 'engine-bot' THEN 1 ELSE 0 END AS ex
          FROM rules WHERE agent IN ('engine-bot', '*')),
        hx AS (SELECT domain, max(ex) AS hex FROM r GROUP BY domain),
        rr AS (SELECT r.* FROM r JOIN hx USING (domain)
               WHERE r.ex = 1 OR hx.hex = 0),
        u AS (SELECT *, regexp_replace(regexp_replace(url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''), '^[^/]*', '') AS p
              FROM urls),
        j AS (SELECT u.doc_id, rr.allow, length(rr.prefix) AS l
              FROM u LEFT JOIN rr
                ON u.domain = rr.domain AND starts_with(u.p, rr.prefix)),
        v AS (SELECT doc_id, max_by(allow, coalesce(l, -1) * 2
                     + coalesce(CAST(allow AS INT), 1)) AS a
              FROM j GROUP BY doc_id)
        SELECT doc_id FROM v WHERE coalesce(a, TRUE) ORDER BY doc_id
        """
    ).fetchall()
    assert [r[0] for r in got] == kept
