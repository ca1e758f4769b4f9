"""WordPiece tokenizer (operators/wordpiece.py): likelihood-scored
merges (the property separating it from BPE), greedy longest-match
encoding, incremental-vs-recount trainer equivalence, and the
cross-engine determinism of the double-division score."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.operators import wordpiece as W


# --- naive reference (independent code path: full recount per merge) -------


def ref_train_wp(word_freqs: dict[str, int], num_merges: int):
    """WordPiece with a full pair+symbol recount every merge —
    deliberately different bookkeeping from the incremental trainer."""
    seqs = {w: tuple(W._wp_seq(w)) for w in word_freqs if w}
    merges = []
    for _ in range(num_merges):
        pair_c: dict[tuple[str, str], int] = {}
        sym_c: dict[str, int] = {}
        for w, seq in seqs.items():
            for s in seq:
                sym_c[s] = sym_c.get(s, 0) + word_freqs[w]
            for p in zip(seq, seq[1:]):
                pair_c[p] = pair_c.get(p, 0) + word_freqs[w]
        live = [
            (-(float(c) / (float(sym_c[p[0]]) * float(sym_c[p[1]]))), p)
            for p, c in pair_c.items()
            if c > 0
        ]
        if not live:
            break
        best = min(live)[1]
        merges.append(best)
        seqs = {
            w: tuple(W._merge_wp_seq(list(s), *best))
            for w, s in seqs.items()
        }
    return merges, seqs


# --- trainer ----------------------------------------------------------------


def test_wordpiece_score_differs_from_bpe_count(spark):
    """The defining property: ('x','##y') has count 6 < ('a','##a')'s
    10, but score 6/(6·6) ≈ 0.167 beats 10/(10·10) = 0.1 — WordPiece
    merges the rarer pair whose parts occur nowhere else; BPE would
    merge the frequent one."""
    docs = spark.createDataFrame(
        [(0, " ".join(["aa"] * 10 + ["xy"] * 6))], ["doc_id", "text"]
    )
    vocab, merges, alphabet = W.train_wordpiece(docs, "text", num_merges=1)
    assert merges == [("x", "##y")]
    assert alphabet == sorted({"a", "##a", "x", "##y"})
    assert vocab == sorted({"a", "##a", "x", "##y"}) + ["xy"]


def test_wordpiece_symbol_join_keeps_continuation_marker():
    """Merging two continuation symbols keeps ##; merging from the
    word-initial symbol does not."""
    assert W._wp_join("h", "##e") == "he"
    assert W._wp_join("##l", "##l") == "##ll"
    merges, _ = W._train_wordpiece([("lll", 5)], 1)
    # seq [l, ##l, ##l]: pairs (l,##l) c=5 sym l=5,##l=10 → 0.1;
    # (##l,##l) c=5, sym 10·10 → 0.05 — the initial pair wins
    assert merges == [("l", "##l")]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=12),
)
def test_wp_train_property_incremental_equals_naive(words, n_merges):
    """The incremental trainer's inverted-index + symbol-count
    bookkeeping equals the full-recount reference on arbitrary
    corpora."""
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    ref_merges, _ = ref_train_wp(freqs, n_merges)
    merges, alphabet = W._train_wordpiece(sorted(freqs.items()), n_merges)
    assert merges == ref_merges
    want_alpha = sorted(
        {s for w in freqs for s in W._wp_seq(w)}
    )
    assert alphabet == want_alpha


def test_wp_train_stops_when_pairs_exhausted():
    """Single-char census words have no pairs — the loop must stop
    early, not loop on dead counts."""
    merges, alphabet = W._train_wordpiece([("a", 3), ("b", 2)], 5)
    assert merges == []
    assert alphabet == ["a", "b"]


# --- greedy longest-match encode ---------------------------------------------


def test_encode_greedy_longest_match_hand_values():
    vocab = {"h", "##e", "##l", "##o", "he", "##ll"}
    assert W._encode_word_wp("hello", vocab) == ["he", "##ll", "##o"]
    # prefers the longest match even when shorter pieces would also fit
    assert W._encode_word_wp("he", vocab) == ["he"]
    assert W._encode_word_wp("h", vocab) == ["h"]


def test_encode_unk_on_any_uncovered_position():
    vocab = {"h", "##e"}
    assert W._encode_word_wp("hex", vocab) == [W.UNK]  # no ##x anywhere
    assert W._encode_word_wp("zh", vocab) == [W.UNK]  # no initial z


def test_encode_census_words_never_unk(spark, sf_dir):
    """The trained alphabet covers every census character, so census
    words always segment (the coverage property the [UNK] fallback is
    NOT allowed to mask on training data)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab, merges, _ = W.train_wordpiece(docs, "text", num_merges=8)
    from mapreduce_stockheadlines_spark.operators.bpe import word_census

    words = word_census(docs, "text").select("word")
    enc = W.encode_word_types_wp(words, vocab)
    n_unk = enc.filter(F.array_contains("pieces", W.UNK)).count()
    assert n_unk == 0
    # and the reassembled pieces spell the word back
    bad = enc.filter(
        F.expr(
            "replace(concat_ws('', transform(pieces,"
            " p -> CASE WHEN p LIKE '##%' THEN substr(p, 3) ELSE p END)),"
            " ' ', '') != word"
        )
    ).count()
    assert bad == 0


def test_encode_word_types_wp_arrow_path_matches_driver(spark):
    """The Arrow pandas-UDF path returns exactly the driver-side
    segmentation for every distinct type."""
    docs = spark.createDataFrame(
        [(0, "hello help hold hello")], ["doc_id", "text"]
    )
    vocab, _, _ = W.train_wordpiece(docs, "text", num_merges=4)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    got = {
        r["word"]: list(r["pieces"])
        for r in W.encode_word_types_wp(words, vocab).collect()
    }
    vset = set(vocab)
    for w, pieces in got.items():
        assert pieces == W._encode_word_wp(w, vset), w


def test_wp_train_and_encode_match_duckdb_unrolled_ctes(spark, sf_dir):
    """DuckDB re-derives the WHOLE WordPiece surface — 8 score-ranked
    merge rounds, the first-wins vocabulary, its fingerprint AND the
    greedy longest-match piece count of every word type — via the x28
    registry's own CTE fragment (plans/extensions._x28_wp_train_ctes),
    exercised standalone. Unrolled, not recursive: DuckDB 1.0 plans a
    correlated subquery inside a RECURSIVE member inconsistently
    (measured — the registry fragment documents it)."""
    from mapreduce_stockheadlines_spark.plans.extensions import (
        _x28_bpe_train_ctes,
        _x28_wp_train_ctes,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab, _, _ = W.train_wordpiece(docs, "text", num_merges=8,
                                    max_word_types=4096)
    words = (
        docs.select(
            F.explode(
                F.split(
                    F.regexp_replace(F.lower("text"), "[^a-z ]", " "), " +"
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .select("word")
        .distinct()
    )
    got_enc = sorted(
        (r["word"], len(r["pieces"]))
        for r in W.encode_word_types_wp(words, vocab).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    head = """
        WITH RECURSIVE words AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +'),
                 t -> t <> '')) AS word
          FROM documents)"""
    # the wp fragment consumes the bpe fragment's bw census and be0
    # word list (one census for both trainers — the coupling is the
    # point), so the standalone harness prepends it
    ctes = _x28_bpe_train_ctes() + _x28_wp_train_ctes()
    want_fp = con.execute(head + ctes + "\nSELECT fp FROM wfp").fetchall()
    assert want_fp == [(W.wordpiece_vocab_fp8(vocab),)]
    want_enc = con.execute(
        head + ctes + "\nSELECT word, np FROM wpnp ORDER BY word"
    ).fetchall()
    assert got_enc == [tuple(r) for r in want_enc]


def test_x28_wp_columns_nondegenerate_and_distinct_from_bpe(spark, sf_dir):
    """Promotion guard for the round-9 WordPiece columns: n_wp_pieces
    varies across docs AND differs from the trained-BPE piece counts on
    some docs — greedy longest-match under a score-trained vocab is a
    genuinely different tokenizer, not a relabeled copy of the BPE
    column."""
    from conftest import assert_column_nondegenerate

    from mapreduce_stockheadlines_spark.plans.registry import ALL_QUERIES

    x28 = ALL_QUERIES["x28_lm_perplexity"].builder(spark, sf_dir).cache()
    try:
        assert_column_nondegenerate(x28, "n_wp_pieces", f"at {sf_dir}")
        n_diff = x28.filter(
            F.col("n_wp_pieces") != F.col("n_bpe_pieces_trained")
        ).count()
        assert n_diff > 0
    finally:
        x28.unpersist()


def test_save_load_round_trip(spark, tmp_path, sf_dir):
    """Deploy shape: a vocabulary saved and reloaded encodes
    identically (and the fingerprint survives the round trip)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab, _, _ = W.train_wordpiece(docs, "text", num_merges=6)
    W.save_wordpiece(spark, vocab, str(tmp_path / "wp"))
    back = W.load_wordpiece(spark, str(tmp_path / "wp"))
    assert back == vocab
    assert W.wordpiece_vocab_fp8(back) == W.wordpiece_vocab_fp8(vocab)
