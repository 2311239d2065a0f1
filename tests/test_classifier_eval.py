"""Checks for lang_id_confusion (#227) and vocab_mass_spectrum (#228):
cross-operator consistency with #40 and exact mass conservation."""

from __future__ import annotations

from collections import Counter, defaultdict

from zigchain_indexer_clickhouse_spark.operators.text_analysis import (
    lang_id,
    lang_id_confusion,
    vocab_mass_spectrum,
)


def test_confusion_agrees_with_lang_id(spark, sf_dir):
    truth = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    pred = {r.doc_id: r.pred_lang for r in lang_id(spark, sf_dir).collect()}
    tp = defaultdict(int)
    fp = defaultdict(int)
    fn = defaultdict(int)
    for d, t in truth.items():
        p = pred[d]
        if p == t:
            tp[t] += 1
        else:
            fp[p] += 1
            fn[t] += 1
    got = {r.lang: r for r in lang_id_confusion(spark, sf_dir).collect()}
    assert set(got) == set(Counter(truth.values()))
    for lang, row in got.items():
        assert (row.tp, row.fp) == (tp[lang], fp[lang])
        assert row.n_docs == tp[lang] + fn[lang]
        denom_p = tp[lang] + fp[lang]
        if denom_p:
            assert row.precision_ppm == tp[lang] * 1_000_000 // denom_p
        assert row.recall_ppm == tp[lang] * 1_000_000 // row.n_docs
        f1d = 2 * tp[lang] + fp[lang] + fn[lang]
        assert row.f1_ppm == (2 * tp[lang] * 1_000_000 // f1d if f1d else 0)


def test_vocab_spectrum_conserves_mass(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = Counter()
    for d in docs:
        counts.update(d.text.strip().split(" "))
    rows = vocab_mass_spectrum(spark, sf_dir).collect()
    assert sum(r.token_mass for r in rows) == sum(counts.values())
    assert sum(r.n_tokens for r in rows) == len(counts)
    # bucket k holds tokens with count in [2^(k-1), 2^k)
    by_bucket = defaultdict(lambda: [0, 0])
    for c in counts.values():
        k = c.bit_length()
        by_bucket[k][0] += 1
        by_bucket[k][1] += c
    assert {r.log2_bucket: (r.n_tokens, r.token_mass) for r in rows} == {
        k: tuple(v) for k, v in by_bucket.items()
    }
