"""Gopher quality rules + C4 line cleaning: exact cross-checks of the
Spark operators against independent pure-Python re-implementations of
the published rule sets, over the same deterministic fixture text the
contract rows use (both engines build it from one SQL template)."""

import re

import __spark_entry__ as entrymod
from rasters_rs_spark.operators import text as T


def _fixture_docs(spark, n=400):
    return spark.range(n).selectExpr(
        "printf('doc_%05d', id) AS doc_id",
        entrymod._gopher_fixture_text("id") + " AS text")


def _py_gopher(text, min_words=50, max_words=100000):
    words = [w for w in re.split("[ \n]", text) if w != ""]
    lines = text.split("\n")
    n_words, n_lines = len(words), len(lines)
    n_nospace = sum(len(w) for w in words)
    n_hash = text.count("#")
    n_ell = (len(text) - len(text.replace("...", ""))) // 3
    n_bullet = sum(1 for l in lines
                   if l.startswith(("- ", "* ")) or l.startswith("•"))
    n_ell_lines = sum(1 for l in lines if l.endswith("..."))
    n_alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    n_stop = sum(1 for r in T.GOPHER_REQUIRED_WORDS if r in words)
    rules = {
        "ok_word_count": min_words <= n_words <= max_words,
        "ok_mean_len": 3 * n_words <= n_nospace <= 10 * n_words,
        "ok_symbol": 10 * (n_hash + n_ell) <= n_words,
        "ok_bullet": 10 * n_bullet <= 9 * n_lines,
        "ok_ellipsis": 10 * n_ell_lines <= 3 * n_lines,
        "ok_alpha": 10 * n_alpha >= 8 * n_words,
        "ok_stop": n_stop >= 2,
    }
    return {"n_words": n_words, "n_lines": n_lines, **rules,
            "keep": all(rules.values())}


def test_gopher_matches_python_reference(spark):
    docs = _fixture_docs(spark)
    got = {r["doc_id"]: r.asDict()
           for r in T.gopher_quality_filter(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == 400
    for did, text in texts.items():
        want = _py_gopher(text)
        have = {k: got[did][k] for k in want}
        assert have == want, f"{did}: {have} != {want}\ntext={text!r}"


def test_gopher_every_rule_fires_both_ways(spark):
    rows = T.gopher_quality_filter(_fixture_docs(spark)).collect()
    for col in ["ok_word_count", "ok_mean_len", "ok_symbol", "ok_bullet",
                "ok_ellipsis", "ok_alpha", "ok_stop", "keep"]:
        vals = {r[col] for r in rows}
        assert vals == {True, False}, f"{col} never flips: {vals}"


def test_gopher_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = T.gopher_quality_filter(docs, min_words=5)
    assert out.count() == docs.count()
    got = {r["doc_id"]: r for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, text in list(texts.items())[:50]:
        want = _py_gopher(text, min_words=5)
        assert {k: got[did][k] for k in want} == want


def _c4_fixture_docs(spark, n=400):
    return spark.range(n).selectExpr(
        "printf('doc_%05d', id) AS doc_id",
        entrymod._c4_fixture_text("id") + " AS text")


def _py_c4(text, min_line_words=3, min_kept_lines=3):
    lines = text.split("\n")

    def ok(l):
        lt = l.rstrip()
        return (lt.endswith((".", "!", "?", '"'))
                and len([w for w in l.split(" ") if w]) >= min_line_words
                and "javascript" not in l.lower())

    kept = [l for l in lines if ok(l)]
    has_lorem = "lorem ipsum" in text.lower()
    has_brace = "{" in text
    return {"n_lines": len(lines), "n_kept_lines": len(kept),
            "cleaned_text": "\n".join(kept), "has_lorem": has_lorem,
            "has_brace": has_brace,
            "keep": len(kept) >= min_kept_lines
            and not has_lorem and not has_brace}


def test_c4_matches_python_reference(spark):
    docs = _c4_fixture_docs(spark)
    got = {r["doc_id"]: r.asDict() for r in T.c4_clean(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, text in texts.items():
        want = _py_c4(text)
        have = {k: got[did][k] for k in want}
        assert have == want, f"{did}: {have} != {want}\ntext={text!r}"


def test_c4_gates_fire_both_ways(spark):
    rows = T.c4_clean(_c4_fixture_docs(spark)).collect()
    for col in ["has_lorem", "has_brace", "keep"]:
        assert {r[col] for r in rows} == {True, False}, col
    # the cleaner actually removes lines somewhere (and keeps some)
    assert any(r["n_kept_lines"] < r["n_lines"] for r in rows)
    assert any(r["n_kept_lines"] > 0 for r in rows)


def test_c4_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [("a", None), ("b", "")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in T.c4_clean(docs).collect()}
    for k in ("a", "b"):
        assert rows[k]["keep"] is False
        assert rows[k]["cleaned_text"] == ""
    g = {r["doc_id"]: r for r in T.gopher_quality_filter(docs).collect()}
    for k in ("a", "b"):
        assert g[k]["keep"] is False


def _py_waterfill(counts, budget, max_epochs):
    """The paper's iterative waterfilling (Chung et al. 2023): repeat
    'split remaining budget evenly; cap any source whose capacity is
    below its share' until no new caps."""
    caps = {s: max_epochs * n for s, n in counts.items()}
    alloc = {}
    remaining = dict(caps)
    b = budget
    while remaining:
        share = b / len(remaining)
        below = {s for s, c in remaining.items() if c <= share}
        if not below:
            for s in remaining:
                alloc[s] = share
            return alloc
        for s in below:
            alloc[s] = float(remaining.pop(s))
            b -= alloc[s]
    return alloc


def test_unimax_allocation_matches_iterative_waterfill(spark):
    import random
    rng = random.Random(3)
    for trial in range(4):
        rows = []
        did = 0
        counts = {}
        for s in range(6):
            n = rng.randint(1, 40)
            counts[f"s{s}"] = n
            for _ in range(n):
                rows.append((did, f"s{s}"))
                did += 1
        budget = rng.randint(10, 3 * sum(counts.values()) + 20)
        docs = spark.createDataFrame(rows, ["doc_id", "source"])
        got = {r["source"]: r for r in
               T.unimax_allocation(docs, budget, max_epochs=3).collect()}
        want = _py_waterfill(counts, budget, 3)
        assert set(got) == set(want)
        for s in want:
            assert abs(got[s]["alloc_docs"] - want[s]) < 1e-9, \
                (trial, s, got[s]["alloc_docs"], want[s])
            assert got[s]["capped"] == (
                abs(want[s] - 3 * counts[s]) < 1e-12) or \
                got[s]["alloc_docs"] <= 3 * counts[s] + 1e-9
        total = sum(r["alloc_docs"] for r in got.values())
        assert abs(total - min(budget, 3 * sum(counts.values()))) < 1e-6


def test_unimax_sample_consistency(spark):
    rows = [(i, f"s{i % 3}") for i in range(60)] + \
           [(100 + i, "s_big") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    # caps (E=2): 40/40/40 for the small sources, 400 for s_big; at
    # budget 300 the smalls are capped (40*(4-r)+S_r <= 300) and s_big
    # waterlines at (300-120)/1 = 180 docs -> rate 0.9
    out = T.unimax_sample(docs, budget=300, max_epochs=2).collect()
    assert len(out) == 260
    for r in out:
        assert r["copies"] == r["n_full"] + int(r["extra"])
        assert 0 <= r["rate"] <= 2.0 + 1e-12
    # capped sources get exactly the epoch cap, n_full == cap, no coin
    capped = [r for r in out if r["source"] != "s_big"]
    assert all(r["rate"] == 2.0 and r["n_full"] == 2 and not r["extra"]
               for r in capped)
    big = [r for r in out if r["source"] == "s_big"]
    assert all(r["rate"] == 0.9 and r["n_full"] == 0 for r in big)
    assert 0 < sum(r["extra"] for r in big) < len(big)
    # replayable: same salt, same decisions
    again = T.unimax_sample(docs, budget=300, max_epochs=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_split_passages_python_reference(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j"), (1, "x"), (2, ""), (3, None),
         (4, " ".join(f"w{i}" for i in range(100)))],
        ["doc_id", "text"])
    got = {}
    for r in T.split_passages(docs, window=6, stride=4).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for did, text in [(0, "a b c d e f g h i j"), (1, "x"), (2, ""),
                      (3, ""), (4, " ".join(f"w{i}" for i in range(100)))]:
        toks = [w for w in (text or "").split(" ") if w]
        n = len(toks)
        n_pass = 1 + max(0, -(-(max(0, n - 6)) // 4))
        rows = sorted(got[did], key=lambda r: r["passage_id"])
        assert len(rows) == n_pass, (did, len(rows), n_pass)
        for p, r in enumerate(rows):
            s = p * 4
            assert r["start_token"] == s
            assert r["n_tokens"] == min(6, n - s)
            assert r["passage"] == " ".join(toks[s:s + 6])
    # coverage: every token position is inside >= 1 passage window
    rows4 = sorted(got[4], key=lambda r: r["passage_id"])
    covered = set()
    for r in rows4:
        covered.update(range(r["start_token"],
                             r["start_token"] + r["n_tokens"]))
    assert covered == set(range(100))


def test_split_passages_validates_params(spark):
    import pytest as _pt
    docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with _pt.raises(ValueError):
        T.split_passages(docs, window=0)
    with _pt.raises(ValueError):
        T.split_passages(docs, stride=0)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_row_local_operators_have_no_exchange(spark):
    """Gopher, C4 and passage splitting are per-row map/generate
    stages — any Exchange in their plans would be a scale bug."""
    docs = spark.createDataFrame([(0, "a b c.")], ["doc_id", "text"])
    for df in (T.gopher_quality_filter(docs), T.c4_clean(docs),
               T.split_passages(docs, window=4, stride=2)):
        p = _plan(df)
        assert "Exchange" not in p, p


def test_unimax_plan_one_corpus_aggregation(spark):
    """unimax_sample touches the corpus twice (the per-source count
    aggregation and the final broadcast-rate projection) and the rate
    table comes back via broadcast — never a corpus-keyed sort-merge
    join."""
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], ["doc_id", "source"])
    p = _plan(T.unimax_sample(docs, budget=20))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
