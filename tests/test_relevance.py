"""TF-IDF / BM25 relevance operators: hand-checked values on tiny input
plus full cross-engine pinning vs DuckDB over the real documents table."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.operators import relevance as R


def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry dates"),
        ],
        ["doc_id", "text"],
    )


def test_tfidf_hand_values(spark):
    out = R.tfidf_top_terms(tiny_docs(spark), "doc_id", "text", k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # N=3. doc 0: apple tf=2 df=1 → 2*(ln(4/2)+1); banana tf=1 df=2 → ln(4/3)+1
    r00 = rows[(0, 1)]
    assert r00.term == "apple" and r00.tf == 2 and r00.df == 1
    assert r00.score == round(2 * (math.log(4 / 2) + 1), 4)
    assert rows[(0, 2)].term == "banana"
    # doc 2: cherry tf=3 dominates dates tf=1
    assert rows[(2, 1)].term == "cherry" and rows[(2, 2)].term == "dates"


def test_tfidf_tie_broken_by_term_asc(spark):
    df = spark.createDataFrame([(0, "zebra apple")], ["doc_id", "text"])
    rows = R.tfidf_top_terms(df, "doc_id", "text", k=2).orderBy("rank").collect()
    assert [r.term for r in rows] == ["apple", "zebra"]  # equal scores


def test_bm25_hand_values(spark):
    out = R.bm25_scores(
        tiny_docs(spark), "doc_id", "text", ["cherry", "banana"], k1=1.2, b=0.75
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0, 1, 2}  # doc 0 matches banana only
    assert rows[0].n_matched_terms == 1
    assert rows[1].n_matched_terms == 2
    # doc 2 has tf=3 of the rarer-weighted cherry and is longest
    n, k1, b = 3, 1.2, 0.75
    dls = {0: 3.0, 1: 2.0, 2: 4.0}
    avgdl = sum(dls.values()) / 3

    def idf(df_):
        return math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))

    def contrib(tf, df_, dl):
        return idf(df_) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want2 = round(contrib(3, 2, dls[2]), 4)  # cherry df=2, tf=3 in doc 2
    assert rows[2].bm25 == pytest.approx(want2, abs=1e-4)
    want1 = round(contrib(1, 2, dls[1]) + contrib(1, 2, dls[1]), 4)
    assert rows[1].bm25 == pytest.approx(want1, abs=1e-4)


TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(
             regexp_replace(lower(text), '[^a-zA-Z ]', ' ', 'g'), '\\s+')) AS token
    FROM documents
  ) WHERE length(token) > 0),
tf AS (SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, token),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * (ln((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)) + 1), 4)
           AS score
  FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rank
      FROM scored)
SELECT doc_id, rank, term, tf, df, score FROM r WHERE rank <= 5
ORDER BY doc_id, rank
"""


def test_tfidf_matches_duckdb_on_documents(spark, sf_dir):
    got = [
        (r.doc_id, r.rank, r.term, r.tf, r.df, r.score)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .transform(lambda d: R.tfidf_top_terms(d, "doc_id", "text", k=5))
        .orderBy("doc_id", "rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [tuple(t) for t in con.sql(TFIDF_ORACLE).fetchall()]
    assert got == want


def test_ngram_contamination_values(spark):
    from mapreduce_stockheadlines_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over dogs"),  # shares a 3-gram run
            (1, "completely unrelated words here now"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sleeps")], ["q_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in TS.ngram_contamination(
            docs, bench, "doc_id", "text", n=3
        ).collect()
    }
    # doc 0 grams: 5 distinct; bench grams: {the quick brown, quick brown fox,
    # brown fox sleeps} → hits = {the quick brown, quick brown fox} = 2
    assert out[0].n_distinct_grams == 5
    assert out[0].n_contaminated == 2
    assert out[0].containment == 0.4
    assert out[1].n_contaminated == 0 and out[1].containment == 0.0


def test_ngram_contamination_duplicate_grams_counted_once(spark):
    from mapreduce_stockheadlines_spark.operators import textstats as TS

    docs = spark.createDataFrame([(0, "a b c a b c a b c")], ["doc_id", "text"])
    bench = spark.createDataFrame([(1, "a b c")], ["q_id", "text"])
    r = TS.ngram_contamination(docs, bench, "doc_id", "text", n=3).first()
    # distinct 3-grams of doc 0: {a b c, b c a, c a b} — "a b c" repeats
    assert r.n_distinct_grams == 3
    assert r.n_contaminated == 1
    assert r.containment == 0.3333


VOCAB_ORACLE = """
WITH toks AS (
  SELECT token FROM (
    SELECT unnest(string_split_regex(
             regexp_replace(lower(text), '[^a-zA-Z ]', ' ', 'g'), '\\s+')) AS token
    FROM documents
  ) WHERE length(token) > 0),
f AS (SELECT token AS term, CAST(count(*) AS BIGINT) AS freq
      FROM toks GROUP BY token),
r AS (SELECT term, freq,
             CAST(row_number() OVER (ORDER BY freq DESC, term ASC) AS BIGINT)
               AS term_id
      FROM f)
SELECT term, freq, term_id FROM r WHERE term_id <= 50 ORDER BY term_id
"""


def test_vocabulary_matches_duckdb(spark, sf_dir):
    from mapreduce_stockheadlines_spark.operators.relevance import vocabulary

    got = [
        (r.term, r.freq, r.term_id)
        for r in vocabulary(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), "text", top_v=50
        )
        .orderBy("term_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [tuple(t) for t in con.sql(VOCAB_ORACLE).fetchall()]
    assert got == want


def test_vocabulary_no_single_partition_window(spark, sf_dir):
    """VERDICT r4 #3: term-id assignment must use the bucketed-rank
    shape — no SinglePartition exchange anywhere in the vocab plan."""
    import io
    from contextlib import redirect_stdout

    from mapreduce_stockheadlines_spark.operators.relevance import vocabulary

    df = vocabulary(spark.read.parquet(f"{sf_dir}/documents.parquet"), "text")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(_fb" in plan


def test_oov_stats_hand_values(spark):
    from mapreduce_stockheadlines_spark.operators.relevance import (
        oov_stats,
        vocabulary,
    )

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "apple zebra")], ["doc_id", "text"]
    )
    vocab = vocabulary(docs, "text", top_v=2)  # apple(3), banana(1)
    terms = {r.term for r in vocab.collect()}
    assert terms == {"apple", "banana"}
    rows = {r.doc_id: r for r in oov_stats(docs, "doc_id", "text", vocab).collect()}
    assert rows[0].n_tokens == 3 and rows[0].n_oov == 0 and rows[0].oov_rate == 0.0
    assert rows[1].n_tokens == 2 and rows[1].n_oov == 1 and rows[1].oov_rate == 0.5


# --- bigram LM perplexity ----------------------------------------------------

def test_bigram_lm_hand_values(spark):
    """Hand-checked add-k bigram model on a two-doc corpus."""
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b a")], ["doc_id", "text"]
    )
    lm, ctx, v = R.train_bigram_lm(docs, "doc_id", "text", add_k=0.5)
    # bigrams: doc0: <s> a, a b; doc1: <s> a, a b, b a
    # c12: '<s> a'=2, 'a b'=2, 'b a'=1; c1: <s>=2, a=2, b=1; V={a,b}=2
    assert v == 2
    lm_rows = {r.bigram: r.logp for r in lm.collect()}
    k = 0.5
    assert lm_rows["<s> a"] == round(math.log((2 + k) / (2 + k * 2)), 4)
    assert lm_rows["b a"] == round(math.log((1 + k) / (1 + k * 2)), 4)

    ppl = {
        r.doc_id: r
        for r in R.lm_perplexity(docs, lm, ctx, v, "doc_id", "text").collect()
    }
    # doc 0: mean of logp('<s> a'), logp('a b')
    want_mean = round(
        (lm_rows["<s> a"] + lm_rows["a b"]) / 2, 4
    )
    assert ppl[0].n_bigrams == 2
    assert ppl[0].avg_logp == want_mean
    assert ppl[0].ppl == round(math.exp(-want_mean), 4)


def test_lm_perplexity_unseen_bigram_backoff(spark):
    """Held-out doc: unseen bigram under a seen context uses the smoothed
    floor k/(c1+kV); an unseen context falls to the uniform 1/V floor."""
    train = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    lm, ctx, v = R.train_bigram_lm(train, "doc_id", "text", add_k=0.5)
    held = spark.createDataFrame([(9, "a a zz")], ["doc_id", "text"])
    out = R.lm_perplexity(held, lm, ctx, v, "doc_id", "text").collect()[0]
    assert v == 2
    k, vv = 0.5, 2  # V = {a, b}
    # grams: '<s> a' (seen), 'a a' (unseen, ctx a has c1=1), 'a zz'
    # (unseen, ctx a), ...wait 'a zz': ctx 'a' seen; 'zz' never predicted
    logp_sa = round(math.log((1 + k) / (1 + k * vv)), 4)
    floor_a = round(math.log(k / (1 + k * vv)), 4)
    want_mean = round((logp_sa + floor_a + floor_a) / 3, 4)
    assert out.n_bigrams == 3
    assert out.avg_logp == want_mean
    assert out.ppl == round(math.exp(-want_mean), 4)


LM_PPL_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_prepend('<s>', list_filter(
           string_split_regex(
             regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +'),
           t -> t <> '')) AS ts
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bigram
  FROM toks),
bg AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c12
       FROM grams GROUP BY bigram),
bgx AS (SELECT bigram, c12, split_part(bigram, ' ', 1) AS w1,
               split_part(bigram, ' ', 2) AS w2
        FROM bg),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bgx GROUP BY w1),
v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bgx),
lm AS (SELECT bigram,
              round(ln((c12 + 0.5) / (c1 + 0.5 * v)), 4) AS logp
       FROM bgx JOIN ctx USING (w1) CROSS JOIN v),
agg AS (SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(CAST(round(logp * 10000) AS BIGINT)) AS BIGINT) AS s4
        FROM grams JOIN lm USING (bigram)
        GROUP BY doc_id),
-- exact fixed-point mean (1e-4 units): order-free integer sum + HALF_UP
-- integer division, mirroring the Spark side
fx AS (SELECT doc_id, n_bigrams,
              ((2 * abs(s4) + n_bigrams) // (2 * n_bigrams))
                * sign(s4) / 10000.0 AS avg_logp
       FROM agg)
SELECT doc_id, n_bigrams, avg_logp, round(exp(-avg_logp), 4) AS ppl
FROM fx ORDER BY doc_id
"""


def test_lm_perplexity_matches_duckdb_on_documents(spark, sf_dir):
    """Full cross-engine pin of train + self-score over the real
    documents table: DuckDB re-derives the entire model."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm, ctx, v = R.train_bigram_lm(docs, "doc_id", "text", add_k=0.5)
    got = [
        (r.doc_id, r.n_bigrams, r.avg_logp, r.ppl)
        for r in R.lm_perplexity(docs, lm, ctx, v, "doc_id", "text")
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [tuple(t) for t in con.sql(LM_PPL_ORACLE).fetchall()]
    assert got == want


def test_lm_perplexity_no_backoff_matches_on_self_trained(spark, sf_dir):
    """backoff=False (the self-trained fast path — no context join, no
    vocab broadcast) returns identical scores when every gram is in the
    model, and null ppl (loud failure) on an unseen gram."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    lm, ctx, v = R.train_bigram_lm(docs, "doc_id", "text")
    with_b = R.lm_perplexity(docs, lm, ctx, v, "doc_id", "text")
    no_b = R.lm_perplexity(
        docs, lm, ctx, v, "doc_id", "text", backoff=False
    )
    assert sorted(map(tuple, with_b.collect())) == sorted(
        map(tuple, no_b.collect())
    )

    # PARTIALLY unseen doc: 'the' is in-vocab, 'zzzqqq' is not — the
    # whole doc must null out, never average only the seen grams
    held = spark.createDataFrame(
        [(999, "zzz qqq"), (998, "the zzzqqq")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in R.lm_perplexity(
            held, lm, ctx, v, "doc_id", "text", backoff=False
        ).collect()
    }
    assert rows[999].ppl is None  # fully unseen fails loudly
    assert rows[998].ppl is None  # partially unseen also fails loudly


# --- vocabulary application (text → token-id sequences) ----------------------

def test_apply_vocabulary_round_trip(spark):
    """Encoding under vocabulary() round-trips: decoding the id
    sequences through the inverted vocab reproduces the token stream in
    order; OOV tokens map to the reserved unk id and are counted."""
    train = spark.createDataFrame(
        [(0, "apple banana apple cherry"), (1, "banana banana dates")],
        ["doc_id", "text"],
    )
    vocab = R.vocabulary(train, "text")
    id2term = {r.term_id: r.term for r in vocab.collect()}
    assert 0 not in id2term  # vocabulary ids start at 1: unk=0 is free

    docs = spark.createDataFrame(
        [(7, "apple dates zebra apple")], ["doc_id", "text"]
    )
    enc = R.apply_vocabulary(docs, "doc_id", "text", vocab).collect()[0]
    assert enc.n_tokens == 4 and enc.n_unk == 1  # 'zebra' is OOV
    decoded = [id2term.get(i, "<unk>") for i in enc.token_ids]
    assert decoded == ["apple", "dates", "<unk>", "apple"]


APPLY_VOCAB_ORACLE = """
WITH toks AS (
  SELECT doc_id, token, pos FROM (
    SELECT doc_id,
           unnest(l) AS token,
           generate_subscripts(l, 1) AS pos
    FROM (SELECT doc_id, list_filter(string_split_regex(
                 regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +'),
                 t -> t <> '') AS l
          FROM documents))),
enc AS (SELECT t.doc_id,
               list(coalesce(v.term_id, 0) ORDER BY t.pos) AS token_ids,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.term_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unk
        FROM toks t LEFT JOIN vocab v USING (token)
        GROUP BY t.doc_id)
SELECT doc_id, array_to_string(token_ids, ' ') AS ids_str, n_tokens, n_unk
FROM enc ORDER BY doc_id
"""


def test_apply_vocabulary_matches_duckdb(spark, sf_dir):
    """Full cross-engine pin over the real documents table: DuckDB
    re-derives the encoded sequences from the SAME exported vocab."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = R.vocabulary(docs, "text")
    got = [
        (r.doc_id, " ".join(map(str, r.token_ids)), r.n_tokens, r.n_unk)
        for r in R.apply_vocabulary(docs, "doc_id", "text", vocab)
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    vpdf = vocab.select(
        F.col("term").alias("token"), "term_id"
    ).toPandas()
    con.register("vocab", vpdf)
    want = [tuple(t) for t in con.sql(APPLY_VOCAB_ORACLE).fetchall()]
    assert got == want


def test_precomputed_tf_census_equivalence(spark):
    """The ``tf=`` shared-census mode of every lexical operator returns
    the same rows as the self-exploding mode — the x26 panel's one-pass
    composition is a pure plan change, not a semantics change."""
    from mapreduce_stockheadlines_spark.operators.textstats import (
        classifier_score,
    )

    docs = tiny_docs(spark)
    tf = R.term_frequencies(docs, "doc_id", "text")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(R.tfidf_top_terms(docs, "doc_id", "text", k=2, tf=tf)) == rows(
        R.tfidf_top_terms(docs, "doc_id", "text", k=2)
    )
    q = ["banana", "cherry"]
    assert rows(R.bm25_scores(docs, "doc_id", "text", q, tf=tf)) == rows(
        R.bm25_scores(docs, "doc_id", "text", q)
    )
    assert rows(R.vocabulary(docs, "text", tf=tf)) == rows(
        R.vocabulary(docs, "text")
    )
    vocab = R.vocabulary(docs, "text", top_v=2)
    assert rows(R.oov_stats(docs, "doc_id", "text", vocab, tf=tf)) == rows(
        R.oov_stats(docs, "doc_id", "text", vocab)
    )
    assert rows(classifier_score(docs, "doc_id", "text", tf=tf)) == rows(
        classifier_score(docs, "doc_id", "text")
    )


def test_scalar_attach_avoids_nested_loop_join(spark):
    """tfidf/bm25's one-row scalar attaches (N, avgdl) must compile to
    BroadcastHashJoin via the non-foldable _zero_key — a literal-key
    equi-join constant-folds back to the BroadcastNestedLoopJoin the
    plan guard forbids (regression pin for the x26 promotion)."""
    from mapreduce_stockheadlines_spark.plans.guard import formatted_plan

    docs = tiny_docs(spark)
    for df in (
        R.tfidf_top_terms(docs, "doc_id", "text", k=1),
        R.bm25_scores(docs, "doc_id", "text", ["banana"]),
    ):
        plan = formatted_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
