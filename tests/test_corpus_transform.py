"""Corpus transform operators (#188/#189/#192) + the round-6 analytics
additions (#190 welch, #191 PMI): planted-input semantics and
sf0.001 structural properties."""

from __future__ import annotations

import math

from zigchain_indexer_clickhouse_spark.operators.corpus_transform import (
    BOILER_MIN_DOCS,
    NOVELTY_BUCKETS,
    SEG_TOKENS,
    boilerplate_strip,
    ngram_novelty_decay,
    segment_dedup_reassemble,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    """Write a planted documents.parquet and return its dir."""
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_reassemble_keeps_global_first_occurrence(spark, tmp_path):
    """Two docs share their first 16-token segment: the lower doc_id
    keeps it, the higher one loses it and reassembles WITHOUT it;
    within-doc repeats of one segment also collapse to one copy."""
    shared = " ".join(f"s{i}" for i in range(SEG_TOKENS))
    uniq_a = " ".join(f"a{i}" for i in range(SEG_TOKENS))
    uniq_b = " ".join(f"b{i}" for i in range(SEG_TOKENS))
    rows = [
        (shared + " " + uniq_a, "src0"),            # doc 0
        (shared + " " + uniq_b, "src0"),            # doc 1: loses shared
        (uniq_a, "src1"),                           # doc 2: dup of a-seg
    ]
    out = {
        r["doc_id"]: r
        for r in segment_dedup_reassemble(
            spark, _docs(spark, tmp_path, rows)
        ).collect()
    }
    assert out[0]["clean_text"] == shared + " " + uniq_a
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (2, 0)
    assert out[1]["clean_text"] == uniq_b
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (1, 1)
    # doc 2's only segment first occurred in doc 0 → fully emptied
    assert out[2]["clean_text"] == ""
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (0, 1)


def test_boilerplate_is_per_source_and_strips_all_copies(spark, tmp_path):
    """A 2-token template in BOILER_MIN_DOCS docs of one source strips
    from EVERY doc of that source (no canonical copy survives); the
    same template below threshold in another source is untouched."""
    tpl = "copyright footer"
    rows = (
        [(tpl + f" body{i} text{i}", "srcA") for i in range(BOILER_MIN_DOCS)]
        + [(tpl + " unique words", "srcB")]  # 1 doc < threshold in srcB
    )
    out = {
        (r["doc_id"]): r
        for r in boilerplate_strip(
            spark, _docs(spark, tmp_path, rows)
        ).collect()
    }
    for i in range(BOILER_MIN_DOCS):
        assert out[i]["n_boiler"] == 1, out[i]
        assert not out[i]["clean_text"].startswith(tpl)
    b = out[BOILER_MIN_DOCS]
    assert b["n_boiler"] == 0
    assert b["clean_text"] == tpl + " unique words"


def test_novelty_decays_and_buckets_cover(spark):
    rows = ngram_novelty_decay(spark, SF).collect()
    assert {r["bucket"] for r in rows} == set(range(NOVELTY_BUCKETS))
    by_b = {r["bucket"]: r for r in rows}
    # the first bucket defines the corpus → highest novelty; the tail
    # re-reads earlier content → strictly lower
    assert by_b[0]["novelty_ppm"] == max(r["novelty_ppm"] for r in rows)
    assert by_b[NOVELTY_BUCKETS - 1]["novelty_ppm"] < by_b[0]["novelty_ppm"]
    for r in rows:
        assert 0 < r["n_novel"] <= r["n_grams"]


def test_welch_t_matches_reference_formula(spark):
    """Recompute Welch's t from the raw cents in pure Python for one
    pair and compare at micro precision."""
    from zigchain_indexer_clickhouse_spark.catalog import load
    from zigchain_indexer_clickhouse_spark.operators.ch_aggregates import (
        welch_ttest_by_type,
    )

    rows = welch_ttest_by_type(spark, SF).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    got = {(r["type_a"], r["type_b"]): r for r in rows}
    raw = load(spark, SF, "events").select("event_type", "value").collect()
    by_type: dict[str, list[int]] = {}
    for r in raw:
        by_type.setdefault(r["event_type"], []).append(
            int(round(r["value"] * 100))
        )
    ta, tb = sorted(by_type)[:2]
    xa, xb = by_type[ta], by_type[tb]

    def stats(x):
        n = len(x)
        m = sum(x) / n
        v = (sum(c * c for c in x) - sum(x) ** 2 / n) / (n - 1)
        return n, m, v

    na, ma, va = stats(xa)
    nb, mb, vb = stats(xb)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    r = got[(ta, tb)]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert abs(r["t_micro"] / 1e6 - t) < 1e-4


def test_pmi_ranking_matches_bruteforce(spark):
    from zigchain_indexer_clickhouse_spark.catalog import load
    from zigchain_indexer_clickhouse_spark.operators.text_analysis import (
        PMI_MIN_PAIR,
        PMI_TOP,
        token_pmi_pairs,
    )

    docs = load(spark, SF, "documents").select("text").collect()
    uni: dict[str, int] = {}
    pair: dict[tuple[str, str], int] = {}
    for r in docs:
        toks = r["text"].strip().split(" ")
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    n = sum(uni.values())
    scored = sorted(
        (
            (c * n * 1_000_000 // (uni[w1] * uni[w2]), w1, w2)
            for (w1, w2), c in pair.items()
            if c >= PMI_MIN_PAIR
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:PMI_TOP]
    got = [
        (r["lift_ppm"], r["w1"], r["w2"])
        for r in token_pmi_pairs(spark, SF).collect()
    ]
    assert got == scored
