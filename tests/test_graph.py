"""PageRank pinned against a numpy power-iteration reference, plus
structural invariants (mass conservation, dangling handling, hubs)."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_stockheadlines_spark.operators.graph import pagerank


def ref_pagerank(edges, d=0.85, iters=10):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, t in edges:
            nxt[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (nxt + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3),
    (6, 1),  # 6 has out-links; 7 is dangling (in-link only)
    (3, 7),
]


def test_pagerank_matches_numpy_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iters=10).collect()}
    want = ref_pagerank(EDGES, iters=10)
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-7), n
    # probability mass conserved (dangling node 7 redistributes)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # 3 is the hub: every other node links to it
    assert got[3] == max(got.values())


def test_pagerank_parallel_edges_and_validation(spark):
    # duplicate edge doubles the contribution weight
    single = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    doubled = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3)], "src long, dst long"
    )
    r1 = {r.node: r.rank for r in pagerank(single, n_iters=3).collect()}
    r2 = {r.node: r.rank for r in pagerank(doubled, n_iters=3).collect()}
    assert r2[2] > r1[2]
    with pytest.raises(ValueError):
        pagerank(single, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(single, n_iters=0)


def test_domain_authority_co_citation(spark):
    """Domains co-cited with many others rank highest; an isolated
    single-domain doc reports rank 0 (no co-citation evidence); the
    per-doc domain cap bounds clique fan-out."""
    from mapreduce_stockheadlines_spark.operators.graph import (
        domain_authority,
    )

    rows = [
        (1, "see https://hub.com/a and https://alpha.com/x today"),
        (2, "see https://hub.com/b and https://beta.com/y today"),
        (3, "see https://hub.com/c and https://gamma.com/z today"),
        (4, "only https://lonely.org/p here"),
        (5, "no urls at all in this document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.domain: r.rank for r in domain_authority(docs, n_iters=8).collect()}
    assert set(got) == {"hub.com", "alpha.com", "beta.com", "gamma.com",
                        "lonely.org"}
    assert got["hub.com"] == max(got.values())  # co-cited by all three
    assert got["lonely.org"] == 0.0
    linked = {d: v for d, v in got.items() if d != "lonely.org"}
    assert sum(linked.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_quantized_is_partitioning_invariant(spark):
    """quantize_dp makes the iteration bit-reproducible: the same graph
    at 1 partition and at 16 partitions yields IDENTICAL ranks (the
    x31 oracle's cross-engine precondition), and the quantized result
    stays within the quantization error of the unquantized one."""
    from mapreduce_stockheadlines_spark.operators.graph import pagerank

    edges = [(i % 13, (i * 5 + 3) % 13) for i in range(60)]
    edges = [(s, d) for s, d in edges if s != d and s % 4 != 0]
    df1 = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    df16 = spark.createDataFrame(edges, "src long, dst long").repartition(16)
    r1 = {r.node: r.rank for r in pagerank(df1, quantize_dp=10).collect()}
    r16 = {r.node: r.rank for r in pagerank(df16, quantize_dp=10).collect()}
    assert r1 == r16  # bitwise equal, not approx
    full = {r.node: r.rank for r in pagerank(df1).collect()}
    for n in full:
        assert abs(full[n] - r1[n]) < 1e-8
    # lineage truncation cadence never changes values: every round and
    # every-3rd/4th round agree bitwise (plan re-expansion doubles per
    # un-truncated round — interval stays small by design, see docstring)
    for interval in (1, 3, 4):
        ri = {
            r.node: r.rank
            for r in pagerank(
                df16, quantize_dp=10, checkpoint_interval=interval
            ).collect()
        }
        assert ri == r1
