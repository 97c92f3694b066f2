"""Dedup family tests: exact, MinHash+LSH vs brute-force Jaccard,
SimHash hamming, embedding near-dup."""

import numpy as np
import pandas as pd
import pytest

from rasters_rs_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs_pdf():
    base = ("spark filter join window batch stream table scan merge sort "
            "group agg row column vector hash key value order part").split()
    rng = np.random.default_rng(77)
    rows = []
    for i in range(40):
        words = list(rng.choice(base, size=30))
        rows.append((f"d{i:03d}", " ".join(words)))
    # exact duplicate of d000 and a near-duplicate (2-word change)
    rows.append(("d100", rows[0][1]))
    near = rows[1][1].split()
    near[5], near[17] = "changed", "words"
    rows.append(("d101", " ".join(near)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_dedup(spark, docs_pdf):
    df = spark.createDataFrame(docs_pdf)
    kept = D.exact_dedup(df, ["text"], "doc_id")
    assert kept.count() == len(docs_pdf) - 1  # d100 dropped
    assert kept.where("doc_id = 'd100'").count() == 0
    groups = D.duplicate_groups(df, ["text"], "doc_id").collect()
    assert len(groups) == 1 and groups[0]["keeper"] == "d000"


def test_minhash_dedup_finds_planted_pairs(spark, docs_pdf):
    df = spark.createDataFrame(docs_pdf)
    pairs = D.minhash_dedup(df, threshold=0.5, shingle_k=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("d000", "d100") in got       # identical
    assert ("d001", "d101") in got       # near-dup
    # verified jaccard values are exact
    jmap = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jmap[("d000", "d100")] == 1.0
    brute = D.jaccard(docs_pdf["text"][1], docs_pdf["text"][41], 3)
    assert abs(jmap[("d001", "d101")] - brute) < 1e-12
    # no false positives vs brute force at the same threshold
    for (a, b) in got:
        ta = docs_pdf.set_index("doc_id")["text"][a]
        tb = docs_pdf.set_index("doc_id")["text"][b]
        assert D.jaccard(ta, tb, 3) >= 0.5


def test_keep_canonical(spark, docs_pdf):
    df = spark.createDataFrame(docs_pdf)
    pairs = D.minhash_dedup(df, threshold=0.5, shingle_k=3)
    kept = D.keep_canonical(df, pairs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert "d100" not in ids and "d101" not in ids
    assert "d000" in ids and "d001" in ids


def test_simhash_dedup(spark, docs_pdf):
    df = spark.createDataFrame(docs_pdf)
    pairs = D.simhash_dedup(df, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[("d000", "d100")] == 0
    # hamming verified: every reported pair satisfies the bound
    assert all(h <= 3 for h in got.values())


def test_connected_components_transitive(spark):
    """Min-label propagation closes chains transitively (a-b, b-c, c-d
    one component even though a and d never pair directly) and keeps
    disjoint clusters apart; matches a python union-find oracle."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d"),      # chain of 4
             ("x", "y"),                               # pair
             ("m", "n"), ("n", "o"), ("m", "o")]       # triangle
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    got = {r["node"]: r["component"]
           for r in D.connected_components(df).collect()}

    # union-find oracle
    parent = {}
    def find(v):
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v
    for a, b in pairs:
        parent[find(a)] = find(b)
    nodes = {v for p in pairs for v in p}
    expect = {}
    roots = {}
    for v in sorted(nodes):
        r = find(v)
        roots.setdefault(r, v)   # smallest member = component id
    for v in nodes:
        expect[v] = roots[find(v)]
    assert got == expect
    assert got["a"] == got["d"] == "a"
    assert got["x"] == "x" and got["m"] == "m"


def test_embedding_neardup(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(30, 16))
    vecs[7] = vecs[3] + rng.normal(size=16) * 0.01   # planted near-dup
    pdf = pd.DataFrame({
        "vec_id": [f"v{i:02d}" for i in range(30)],
        "embedding": [v.tolist() for v in vecs],
    })
    out = D.embedding_neardup(spark.createDataFrame(pdf), threshold=0.99,
                              n_planes=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert ("v03", "v07") in got
    # verify every reported cosine against numpy
    for r in out:
        a = vecs[int(r["id_a"][1:])]
        b = vecs[int(r["id_b"][1:])]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cosine"]) < 1e-9
