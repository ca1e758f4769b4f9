"""Reference-parity golden tests (SURVEY.md §5.2.1) on a FIXTURES.md A1
style fixture exercising every pinned edge case: header row counted,
embedded commas re-joined, short rows dropped, single-letter tokens from
'U.S.'/possessives, case folding, stop words, trim, ties."""

from __future__ import annotations

import pytest

from mapreduce_stockheadlines_spark.jobs.stock_count import stock_count
from mapreduce_stockheadlines_spark.jobs.word_count import word_count

# Each line: id,headline,date,stock (naive CSV — commas inside headlines are
# NOT quoted; the reference re-joins middle fields).
FIXTURE_LINES = [
    ",headline,date,stock",  # header: counted as ticker 'stock' in parity mode
    "1,Apple Stock Rises,2020-01-01 00:00:00,AAPL",
    "2,U.S. Market Update: Co.'s Q3 EPS est $1.5M,2020-01-02 00:00:00,AAPL",
    "3,Markets rally, tech leads, banks lag,2020-01-03 00:00:00,MS",  # embedded commas
    "4,short row",  # <= 3 fields → dropped by guard
    "5,The quick market and the slow market,2020-01-05 00:00:00, MS ",  # trim
    "6,MARKET Market market,2020-01-06 00:00:00,GS",  # case fold
    "7,123 456 !!!,2020-01-07 00:00:00,GS",  # punctuation/digits only → no tokens
    "8,of the and,2020-01-08 00:00:00,TSLA",  # all stop words
]


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("parity") / "headlines.csv"
    p.write_text("\n".join(FIXTURE_LINES))
    return str(p)


def test_stock_count_parity(spark, fixture_path):
    lines = [r.line for r in stock_count(spark, fixture_path).collect()]
    # counts: AAPL 2, GS 2, MS 2 (one trimmed), TSLA 1, stock 1 (header)
    # ties broken key ASC; format '<rank>: <key>, <cnt>' (StockCount.java:63)
    assert lines == [
        "1: AAPL, 2",
        "2: GS, 2",
        "3: MS, 2",
        "4: TSLA, 1",
        "5: stock, 1",
    ]


def test_stock_count_header_counted(spark, fixture_path):
    """Golden proof output/output_stock:5746 — the CSV header's 'stock' cell
    is counted as a ticker in parity mode (no header skipping)."""
    lines = [r.line for r in stock_count(spark, fixture_path).collect()]
    assert any(": stock, 1" in ln for ln in lines)


def test_word_count_parity(spark, fixture_path):
    got = {}
    for r in word_count(spark, fixture_path).collect():
        rank_word, cnt = r.line.split("\t")
        word = rank_word.split(": ")[1]
        got[word] = int(cnt)
    # market: rows 5 (2x), 6 (3x), 2 (1x from 'Market Update') → 6
    assert got["market"] == 6
    # single-letter fragments from 'U.S.', "$1.5M", "Co.'s" (tokenizer parity;
    # golden top words are fragments, output/output_words:1-2); 's' is a stop
    # word in the engine list so 'u' and 'm' survive, 's' must not appear
    assert got["u"] == 1 and got["m"] == 1
    assert "s" not in got
    # stop words filtered ('the', 'and', 'of' from rows 5, 8)
    for sw in ("the", "and", "of"):
        assert sw not in got
    # punctuation/digit-only row 7 contributes nothing
    assert "123" not in got
    # embedded-comma row 3: headline fully reconstructed
    for w in ("rally", "tech", "leads", "banks", "lag"):
        assert got[w] == 1
    # header row: 'headline' token from field-rejoin of the header is absent
    # because header has exactly 4 fields → headline column = 'headline'
    assert got.get("headline") == 1  # counted (parity: header not skipped)


def test_word_count_short_row_dropped(spark, fixture_path):
    got = " ".join(r.line for r in word_count(spark, fixture_path).collect())
    assert "short" not in got and "row" not in got


REF_STOPWORDS = "/root/reference/src/stop-word-list.txt"
REF_STOCK_GOLDEN = "/root/reference/output/output_stock"


def test_reference_stopword_file_loads_all_319(spark):
    """The reference's actual shipped artifact: 319 entries, CRLF line
    endings, no trailing newline — trim+lower must neutralize all of it
    (WordCount.java:34 loads with trim+toLowerCase)."""
    from mapreduce_stockheadlines_spark.functions.text import load_stopwords_file

    raw = open(REF_STOPWORDS, "rb").read()
    assert b"\r\n" in raw and not raw.endswith(b"\n")  # the pathology is real

    words = [r.word for r in load_stopwords_file(spark, REF_STOPWORDS).collect()]
    assert len(words) == 319
    assert all(w == w.strip().lower() and w for w in words)  # no CR residue
    assert "a" in words and "yourselves" in words  # first and last entries


def test_word_count_with_reference_stopword_file(spark, fixture_path):
    """Parity job 2 driven by the real stop-word file instead of the
    built-in list: every one of the 319 words must be filtered, including
    ones ('about', 'seems') absent from the built-in ~110-word list."""
    lines = [
        r.line
        for r in word_count(spark, fixture_path, stopwords_path=REF_STOPWORDS)
        .collect()
    ]
    words = {l.split(": ")[1].split("\t")[0] for l in lines}
    ref_stop = {
        w.strip().lower()
        for w in open(REF_STOPWORDS).read().splitlines()
        if w.strip()
    }
    assert words, "word count produced no output"
    assert not (words & ref_stop), f"stop words leaked: {words & ref_stop}"
    assert "market" in words  # non-stop content survived


def _parse_golden_stock(path: str) -> dict[str, int]:
    """'<rank>: <key>, <cnt>' lines → {key: cnt}. Keys may contain commas
    in principle; the reference's are plain tickers, rsplit to be safe."""
    counts: dict[str, int] = {}
    for line in open(path).read().splitlines():
        rest = line.split(": ", 1)[1]
        key, cnt = rest.rsplit(", ", 1)
        counts[key] = int(cnt)
    return counts


def test_stock_count_golden_invariants_replay(spark):
    """The raw Kaggle CSV is not shipped (reference README.md:33), so full
    replay is impossible — but the committed golden output IS a complete
    frequency table. Re-expand it into one row per original headline
    (explode by count, distributed via sequence()) and run the engine's
    count+rank pipeline over that: per-key counts must round-trip exactly,
    recovering every committed invariant (Σ=486,634 rows, 5,903 keys, MS
    top at 1,174, the header-artifact 'stock' key at 1)."""
    from pyspark.sql import functions as F

    from mapreduce_stockheadlines_spark.operators.rank import count_by_key, ranked

    golden = _parse_golden_stock(REF_STOCK_GOLDEN)
    assert len(golden) == 5903
    assert sum(golden.values()) == 486634
    assert golden["stock"] == 1  # header row counted as a ticker

    pairs = spark.createDataFrame(
        list(golden.items()), "stock string, n int"
    )
    exploded = pairs.select(
        "stock", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_i")
    ).select("stock")
    counted = count_by_key(exploded, "stock")
    got = {r.stock: r.cnt for r in counted.collect()}
    assert got == golden

    top = ranked(counted, "stock", limit=3).collect()
    assert [(r.stock, r.cnt) for r in top] == [
        ("MS", 1174), ("MRK", 1141), ("MU", 1096),
    ]


def test_sql_cli_guard_rejects_cartesian(spark, capsys):
    import pytest

    from mapreduce_stockheadlines_spark.jobs.sql import main as sql_main
    from mapreduce_stockheadlines_spark.plans.guard import PlanGuardError

    # clean query passes and prints
    sql_main(["SELECT r_name FROM region ORDER BY r_name",
              "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"])
    assert "AFRICA" in capsys.readouterr().out

    with pytest.raises(PlanGuardError, match="Cartesian|NestedLoop"):
        sql_main(["SELECT * FROM region, nation",
                  "--sf-dir", "/root/testdata/sf0.001", "--guard"])
