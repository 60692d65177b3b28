"""Planted-fixture tests for the span-level curation operators
(llm/spans.py): segment dedup keeps/drops the right segments, the
substring-span detector finds exactly the planted runs, the Spark BPE
fold matches its pure-Python spec, OHLC tie-breaks deterministically,
SCD2 intervals partition time, and equi-depth buckets balance."""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.llm.spans import (
    BPE_JOIN,
    MIN_SPAN,
    SEGMENT_DUP_MIN_DOCS,
    SEGMENT_WIDTH,
    bpe_merges_python,
)

from conftest import SF_SMOKE


def _write_documents(spark, tmp_path, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string").selectExpr(
        "doc_id",
        "text",
        "'en' AS lang",
        "'test' AS source",
        "CAST(length(text) AS LONG) AS n_chars",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_segment_dedup_flags_planted_boilerplate(spark, tmp_path):
    """A 12-word segment planted at position 0 of SEGMENT_DUP_MIN_DOCS
    docs must be flagged in each of them; a doc made of unique words
    keeps every word."""
    boiler = " ".join(f"b{j}" for j in range(SEGMENT_WIDTH))
    docs = []
    for i in range(SEGMENT_DUP_MIN_DOCS):
        tail = " ".join(f"u{i}x{j}" for j in range(SEGMENT_WIDTH))
        docs.append((i, f"{boiler} {tail}"))
    docs.append((100, " ".join(f"solo{j}" for j in range(30))))
    _write_documents(spark, tmp_path, docs)
    out = {
        r["doc_id"]: r
        for r in registry.get("text_segment_dedup")
        .fn(spark, str(tmp_path))
        .collect()
    }
    for i in range(SEGMENT_DUP_MIN_DOCS):
        assert out[i]["n_segments"] == 2
        assert out[i]["n_dup_segments"] == 1
        assert out[i]["n_kept_words"] == SEGMENT_WIDTH
    assert out[100]["n_dup_segments"] == 0
    assert out[100]["n_kept_words"] == 30


def test_substring_span_finds_planted_run(spark, tmp_path):
    """Two docs sharing a 20-token run at DIFFERENT offsets must pair
    with max_shared_span == 20; a pair sharing only a 10-token run
    (< MIN_SPAN) must not appear."""
    run = " ".join(f"r{j}" for j in range(20))
    short = " ".join(f"s{j}" for j in range(10))
    docs = [
        (1, f"{run} " + " ".join(f"a{j}" for j in range(15))),
        (2, " ".join(f"c{j}" for j in range(7)) + f" {run}"),
        (3, f"{short} " + " ".join(f"d{j}" for j in range(15))),
        (4, f"{short} " + " ".join(f"e{j}" for j in range(15))),
    ]
    _write_documents(spark, tmp_path, docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["max_shared_span"]
        for r in registry.get("dedup_substring_span")
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {(1, 2): 20}, got
    assert MIN_SPAN > 10  # the (3,4) exclusion above tests the threshold


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_fold_matches_python_spec(spark, corpora):
    """Property test: the Spark greedy-merge fold must reproduce the
    pure-Python left-to-right scan on tiny adversarial corpora (repeated
    symbols like 'aa aa aa' exercise the non-overlapping greedy step)."""
    texts = [" ".join(toks) for toks in corpora]
    expected = bpe_merges_python(texts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS LONG) AS n_chars",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in registry.get("text_bpe_train").fn(spark, d).collect()
        ]
    assert got == expected


def test_bpe_merged_symbols_chain():
    """Round r+1 can merge a symbol produced in round r (the defining BPE
    property): 'a b c' repeated makes (a,b) win round 1 and (a_b, c)
    win round 2."""
    rows = bpe_merges_python(["a b c", "a b c", "a b c"], rounds=2)
    assert rows[0][1:3] == ("a", "b")
    assert rows[1][1:3] == ("a" + BPE_JOIN + "b", "c")


def test_ohlc_open_close_tiebreak(spark, tmp_path):
    """Duplicate timestamps inside a bar: open/close must tie-break on
    event_id, matching the oracle's (ts, event_id) row_number order."""
    ts = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (2, ts, 1, "click", 5.0, "{}"),
        (1, ts, 1, "click", 9.0, "{}"),  # same ts, lower id -> open
        (3, datetime(2024, 1, 1, 10, 30, 0), 1, "click", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = registry.get("rollup_ohlc_bars").fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    bar = out[0]
    assert bar["open"] == 9.0 and bar["close"] == 7.0
    assert bar["high"] == 9.0 and bar["low"] == 5.0 and bar["n_events"] == 3


def test_scd2_intervals_partition_time(spark):
    """Per key: versions are contiguous (valid_to == next valid_from),
    exactly one open version, and the version count follows the
    deterministic update generations."""
    out = registry.get("sink_scd2_history").fn(spark, SF_SMOKE).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["c_custkey"], []).append(r)
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from"])
        expect = 1 + (key % 10 == 0) + (key % 20 == 0)
        assert len(versions) == expect, (key, versions)
        assert sum(v["is_current"] for v in versions) == 1
        assert versions[-1]["is_current"] and versions[-1]["valid_to"] is None
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_equidepth_buckets_balanced(spark):
    """8 buckets, counts sum to the table size, each bucket within 2% of
    n/8 (exact interpolated boundaries => near-perfect depth balance),
    and bucket value ranges are ordered and disjoint."""
    out = sorted(
        registry.get("agg_histogram_equidepth").fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in out] == list(range(1, 9))
    total = sum(r["n_rows"] for r in out)
    target = total / 8
    for r in out:
        assert abs(r["n_rows"] - target) <= max(2.0, 0.02 * target), out
    for a, b in zip(out, out[1:]):
        assert a["hi"] <= b["lo"]


def test_gopher_rules_fire_individually(spark, tmp_path):
    """Each Gopher rule must fire on its designed violation and ONLY
    that rule (plus keep=False), pinning rule independence."""
    from data_ingestion_poc_spark import registry

    good = "the quick brown fox and that dog have fun with words " * 5
    docs = [
        (1, good),                                  # passes everything
        (2, "the short and that text"),             # word count < 50
        (3, ("the of and that be to have with "
             + "a b c d e f g h i j " * 10)),       # mean word len < 3
        (4, good.replace("fox", "fox###")),         # symbol ratio > 0.1
        (5, good.replace("fun", "123 456 789")),    # 15/60 digit words
        (6, " ".join(["zz"] * 60)),                 # no required stopwords
    ]
    rows = [(i, "en", "web", t.strip(), len(t)) for i, t in docs]
    spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in registry.get("text_gopher_rules").fn(spark, str(tmp_path)).collect()
    }
    assert out[1]["keep"]
    assert not out[2]["ok_word_count"] and not out[2]["keep"]
    assert not out[3]["ok_mean_word_len"] and not out[3]["keep"]
    assert not out[4]["ok_symbol_ratio"] and not out[4]["keep"]
    # alpha rule: 15 of 60 words are pure digits -> 75% alpha < 80%
    assert not out[5]["ok_alpha_words"] and not out[5]["keep"]
    assert out[5]["ok_word_count"] and out[5]["ok_req_stopwords"]
    assert not out[6]["ok_req_stopwords"] and not out[6]["keep"]
    # rule independence: doc 2's only failure is word count
    assert out[2]["ok_mean_word_len"] and out[2]["ok_req_stopwords"]


def _write_docs(spark, tmp_path, docs):
    rows = [(i, "en", src, t, len(t)) for i, src, t in docs]
    spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_readability_known_values(spark, tmp_path):
    """Hand-computed Flesch scores: 'the cat sat . the dog ran .' has
    8 space-words, 2 sentence runs, 6 vowel groups."""
    from data_ingestion_poc_spark import registry

    _write_docs(spark, tmp_path, [(1, "s", "the cat sat . the dog ran .")])
    r = registry.get("text_readability").fn(spark, str(tmp_path)).collect()[0]
    assert r["wc"] == 8 and r["n_sentences"] == 2 and r["n_syllables"] == 6
    wps, spw = 8 / 2, 6 / 8
    assert abs(r["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-9
    assert abs(r["fk_grade"] - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-9


def test_zipf_fit_recovers_power_law(spark, tmp_path):
    """A corpus built as count(rank k) = floor(120/k) must fit slope
    ~ -1 with near-perfect R^2; a uniform corpus must fit slope ~ 0."""
    from data_ingestion_poc_spark import registry

    zipf_words = []
    for k in range(1, 21):
        zipf_words += [f"w{k:02d}"] * (120 // k)
    flat_words = [f"u{k:02d}" for k in range(1, 21)] * 6
    _write_docs(
        spark,
        tmp_path,
        [(1, "zipfy", " ".join(zipf_words)), (2, "flat", " ".join(flat_words))],
    )
    out = {
        r["source"]: r
        for r in registry.get("text_zipf_fit").fn(spark, str(tmp_path)).collect()
    }
    assert out["zipfy"]["vocab"] == 20 and out["zipfy"]["n_ranks"] == 20
    assert -1.1 < out["zipfy"]["zipf_slope"] < -0.9
    assert out["zipfy"]["zipf_r2"] > 0.98
    assert abs(out["flat"]["zipf_slope"]) < 1e-6


def test_ttr_and_hapax(spark, tmp_path):
    """'a a b c' -> 4 tokens, 3 types, 2 hapax; ttr 0.75, hapax 2/3."""
    from data_ingestion_poc_spark import registry

    _write_docs(spark, tmp_path, [(1, "s", "a a b c")])
    r = registry.get("text_ttr").fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (4, 3, 2)
    assert abs(r["ttr"] - 0.75) < 1e-9
    assert abs(r["hapax_frac"] - round(2 / 3, 4)) < 1e-9


def test_url_canonical_dedup_strips_tracking_keeps_content(spark, tmp_path):
    """docs 0-3 share /articles/0: 0 (www+port+fragment noise), 2 (utm_*)
    and 3 (ref) must fold onto doc 0; doc 1 keeps its content-bearing
    page=2 param and must NOT merge."""
    from data_ingestion_poc_spark import registry

    _write_docs(spark, tmp_path, [(i, "s", f"doc {i}") for i in range(8)])
    out = {
        r["doc_id"]: r
        for r in registry.get("dedup_url_canonical").fn(spark, str(tmp_path)).collect()
    }
    base = "https://site0.example.com/articles/0"
    assert out[0]["canonical_url"] == base and not out[0]["is_dup"]
    assert out[0]["url"].startswith("https://WWW.Site0.example.com:443/")
    assert out[1]["canonical_url"] == base + "?page=2" and not out[1]["is_dup"]
    for d in (2, 3):
        assert out[d]["canonical_url"] == base
        assert out[d]["is_dup"] and out[d]["dup_of"] == 0
    # the next group of four folds onto doc 4
    assert out[6]["dup_of"] == 4 and out[5]["canonical_url"].endswith("?page=2")


def test_heaps_law_exact_extremes(spark, tmp_path):
    """All-unique corpus: V = T at every prefix, so the fit is exactly
    beta=1, k=1. Closed-vocabulary corpus: V constant, so beta=0."""
    from data_ingestion_poc_spark import registry

    uniq = [
        (i, "s", " ".join(f"w{i:03d}_{j}" for j in range(10)))
        for i in range(20)
    ]
    _write_docs(spark, tmp_path, uniq)
    out = sorted(
        registry.get("corpus_heaps_law").fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in out] == list(range(1, 11))
    assert all(r["cum_tokens"] == r["cum_vocab"] for r in out)
    assert out[-1]["cum_tokens"] == 200
    assert abs(out[0]["heaps_beta"] - 1.0) < 1e-9
    assert abs(out[0]["heaps_k"] - 1.0) < 1e-9

    closed = [(i, "s", "a b c d e") for i in range(20)]
    _write_docs(spark, tmp_path, closed)
    out = registry.get("corpus_heaps_law").fn(spark, str(tmp_path)).collect()
    assert all(r["cum_vocab"] == 5 for r in out)
    assert abs(out[0]["heaps_beta"]) < 1e-9


def test_ngram_novelty_planted(spark, tmp_path):
    """Doc 0 is all-novel; doc 1 repeats doc 0 exactly (novelty 0);
    doc 2 shares one gram with doc 0 and adds one new."""
    from data_ingestion_poc_spark import registry

    _write_docs(
        spark,
        tmp_path,
        [
            (0, "s", "a b c d"),      # grams: "a b c", "b c d"  (2 novel)
            (1, "s", "a b c d"),      # same grams, later doc -> 0 novel
            (2, "s", "b c d e"),      # "b c d" seen, "c d e" novel
        ],
    )
    out = {
        r["doc_id"]: r
        for r in registry.get("text_ngram_novelty").fn(spark, str(tmp_path)).collect()
    }
    assert out[0]["n_grams"] == 2 and out[0]["n_novel"] == 2
    assert out[0]["novelty"] == 1.0
    assert out[1]["n_novel"] == 0 and out[1]["novelty"] == 0.0
    assert out[2]["n_grams"] == 2 and out[2]["n_novel"] == 1
    assert abs(out[2]["novelty"] - 0.5) < 1e-9
