"""Landing-zone connector: explicit-schema ingestion with dead-letter
quarantine (malformed rows must surface, not kill the job)."""

from __future__ import annotations

from zigchain_indexer_clickhouse_spark.sources.landing import (
    dead_letters,
    good_rows,
    read_csv,
    read_jsonl,
)


def test_jsonl_dead_letter_quarantine(spark, tmp_path):
    p = tmp_path / "dump.jsonl"
    p.write_text(
        '{"event_id": 1, "ts": "2024-01-01T00:00:00.000000Z", "user_id": 7, '
        '"event_type": "click", "value": 1.5, "props": "{}"}\n'
        "this is not json\n"
        '{"event_id": 2, "ts": "2024-01-01T00:00:01.000000Z", "user_id": 8, '
        '"event_type": "view", "value": 2.0, "props": "{}"}\n'
    )
    df = read_jsonl(spark, str(p))
    ok, bad = good_rows(df).collect(), dead_letters(df).collect()
    assert sorted(r["event_id"] for r in ok) == [1, 2]
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_csv_explicit_schema_types(spark, tmp_path):
    p = tmp_path / "dump.csv"
    p.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        '5,2024-01-02T03:04:05.000000Z,9,purchase,3.25,"{""k"":""v""}"\n'
    )
    row = good_rows(read_csv(spark, str(p))).collect()[0]
    assert row["event_id"] == 5 and row["value"] == 3.25
    assert row["ts"].year == 2024 and row["ts"].second == 5
    assert row["props"] == '{"k":"v"}'
