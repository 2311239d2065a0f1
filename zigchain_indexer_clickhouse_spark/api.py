"""User-facing indexer API — the reference's database helper surface
(src/database/clickhouse_queries.js module.exports, src/core/
orchestrator.js splitRange) re-expressed over parquet + DataFrames.

A user of the reference drives it through ~14 functions
(getLastIndexedHeight, countWorkQueue, getPendingWork,
updateWorkQueueStatus, insertWorkQueue, getOverlappingRanges,
addFailedBlock, ...). This facade exposes the same surface with the
same semantics, one method per reference export (camelCase aliases
included), so switching engines is a s/require/import/.

Storage model — Spark-first, not a port: ClickHouse mutates rows in
place via ReplacingMergeTree merges and async `ALTER TABLE` mutations.
On an object store at 100 TB, in-place mutation is the wrong primitive;
the native design is an APPEND-ONLY versioned log per table:

- every write (insert/update/delete) appends rows with a monotonically
  increasing ``_version`` and a ``_deleted`` tombstone flag;
- every read applies FINAL: latest version per key wins
  (``max_by``-style window), tombstones drop out.

That is exactly ReplacingMergeTree + CollapsingMergeTree semantics with
the merge moved to read time (and compaction as an offline rewrite —
``compact()``), which is how log-structured tables (Iceberg/Delta/Hudi)
do it on Spark. Point updates cost one tiny appended file, never a
partition rewrite; the FINAL window shuffles only the key column.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_WORK_QUEUE_SCHEMA = (
    "id long, start_height long, end_height long, status string, "
    "error_message string, created_at timestamp, updated_at timestamp, "
    "_version long, _deleted boolean"
)
_FAILED_BLOCKS_SCHEMA = (
    "block_height long, error_type string, error_message string, "
    "worker_id string, attempts int, "
    "_version long, _deleted boolean"
)
_INDEX_STATE_SCHEMA = (
    "index_name string, last_processed_height long, updated_at timestamp, "
    "_version long, _deleted boolean"
)

# FINAL-merged tables: (schema, key columns) — used by the versioned
# append path and auto-compaction.
_MERGED_TABLES = {
    "work_queue": (_WORK_QUEUE_SCHEMA, ["id"]),
    "failed_blocks": (_FAILED_BLOCKS_SCHEMA, ["block_height"]),
    "index_state": (_INDEX_STATE_SCHEMA, ["index_name"]),
}

# Auto-compact a table's append-only log once it accretes this many
# appended files since the last compaction. Keeps hot tables
# (index_state updates every block in the reference) at a bounded file
# count instead of one tiny parquet file per update forever.
AUTO_COMPACT_EVERY = 64


class IndexerAPI:
    """Drop-in query/command surface of the reference indexer.

    Parameters
    ----------
    spark : SparkSession
    base_path : str
        Directory holding one subdirectory per table
        (``work_queue/``, ``failed_blocks/``, ``index_state/``,
        ``blocks/``). Tables are created lazily on first write.
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base = base_path.rstrip("/")
        # per-table version counters, lazily seeded from the on-disk
        # high-water mark (max existing _version), and per-table append
        # counts since the last compaction
        self._versions: dict[str, int] = {}
        self._appends_since_compact: dict[str, int] = {}

    # -- storage primitives -------------------------------------------------
    def _path(self, table: str) -> str:
        return f"{self.base}/{table}"

    def _read_log(self, table: str, schema: str) -> DataFrame:
        """Raw versioned log (may not exist yet → empty)."""
        try:
            return self.spark.read.schema(schema).parquet(self._path(table))
        except Exception:
            return self.spark.createDataFrame([], schema)

    def _next_version(self, table: str, schema: str) -> int:
        """Monotonic per-table version, seeded from max(_version) on
        disk — survives process restarts without resurrecting stale
        rows or tombstones (wall-clock seeding did not: a sub-ms write
        burst + restart could re-seed below already-written versions).
        A multi-writer cluster deployment would use a commit-service
        sequence or transactional table format instead."""
        if table not in self._versions:
            hw = (
                self._read_log(table, schema)
                .agg(F.max("_version"))
                .collect()[0][0]
            )
            self._versions[table] = int(hw or 0)
        self._versions[table] += 1
        return self._versions[table]

    def _append(self, table: str, rows: list[dict], schema: str) -> None:
        v = self._next_version(table, schema)
        full = [{**r, "_version": v, "_deleted": r.get("_deleted", False)}
                for r in rows]
        (self.spark.createDataFrame(full, schema)
         .coalesce(1)
         .write.mode("append").parquet(self._path(table)))
        n = self._appends_since_compact.get(table, 0) + 1
        if table in _MERGED_TABLES and n >= AUTO_COMPACT_EVERY:
            schema_, keys = _MERGED_TABLES[table]
            self.compact(table, schema_, keys)
        else:
            self._appends_since_compact[table] = n

    @staticmethod
    def _final(log: DataFrame, key_cols: list[str]) -> DataFrame:
        """FINAL semantics: latest version per key, tombstones removed.
        One shuffle on the key — the same cost ClickHouse pays in its
        background merge, paid lazily here."""
        w = Window.partitionBy(*key_cols).orderBy(F.col("_version").desc())
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (~F.col("_deleted")))
            .drop("_rn", "_version", "_deleted")
        )

    def compact(self, table: str, schema: str, key_cols: list[str]) -> None:
        """Offline compaction: rewrite the log as its FINAL state (the
        explicit analog of ClickHouse's background merge / OPTIMIZE).

        The swap is rename-based: the compacted copy is fully written to
        a side directory first, then swapped in with two directory
        renames (atomic per-op on a POSIX fs). A crash between the
        renames leaves the old log intact at ``<table>__old`` —
        recoverable, never a window where the data exists nowhere (the
        previous overwrite-in-place had one)."""
        final = self._final(self._read_log(table, schema), key_cols)
        path = self._path(table)
        tmp, old = path + "__compact", path + "__old"
        final_with_meta = final.withColumn(
            "_version", F.lit(self._next_version(table, schema))
        ).withColumn("_deleted", F.lit(False))
        final_with_meta.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        self._appends_since_compact[table] = 0

    # -- work_queue (clickhouse_queries.js:153-231) -------------------------
    def work_queue(self) -> DataFrame:
        """work_queue FINAL — the view every queue query runs against."""
        return self._final(
            self._read_log("work_queue", _WORK_QUEUE_SCHEMA), ["id"]
        )

    def insert_work_queue(self, items: list[dict]) -> None:
        """insertWorkQueue (clickhouse_queries.js:199-214): enqueue
        [{id, start_height, end_height, status?}, ...]."""
        now = time.time()
        self._append(
            "work_queue",
            [
                {
                    "id": int(it["id"]),
                    "start_height": int(it["start_height"]),
                    "end_height": int(it["end_height"]),
                    "status": it.get("status", "pending"),
                    "error_message": None,
                    "created_at": datetime.fromtimestamp(now),
                    "updated_at": datetime.fromtimestamp(now),
                }
                for it in items
            ],
            _WORK_QUEUE_SCHEMA,
        )

    def count_work_queue(self, status: str) -> int:
        """countWorkQueue (clickhouse_queries.js:153-158):
        `SELECT count() FROM work_queue FINAL WHERE status = ?`."""
        return (
            self.work_queue().filter(F.col("status") == status).count()
        )

    def get_pending_work(self, limit: int = 1) -> DataFrame:
        """getPendingWork (clickhouse_queries.js:163-168): first N
        pending items by id — TakeOrderedAndProject, no global sort."""
        return (
            self.work_queue()
            .filter(F.col("status") == "pending")
            .orderBy("id")
            .limit(limit)
        )

    def update_work_queue_status(
        self, id: int, status: str, error_message: str | None = None
    ) -> None:
        """updateWorkQueueStatus (clickhouse_queries.js:173-185): the
        reference issues `ALTER TABLE ... UPDATE`; here it is a
        versioned re-append of the row — O(1) write, merged at read."""
        cur = self.work_queue().filter(F.col("id") == id).collect()
        if not cur:
            raise KeyError(f"work_queue id {id} not found")
        r = cur[0].asDict()
        r.update(
            status=status,
            error_message=error_message,
            updated_at=datetime.now(),
        )
        self._append("work_queue", [r], _WORK_QUEUE_SCHEMA)

    def delete_work_queue_item(self, id: int) -> None:
        """deleteWorkQueueItem (clickhouse_queries.js:190-194): tombstone
        append (`ALTER TABLE ... DELETE` analog; no partition rewrite)."""
        self._append(
            "work_queue",
            [{
                "id": int(id), "start_height": None, "end_height": None,
                "status": None, "error_message": None, "created_at": None,
                "updated_at": None, "_deleted": True,
            }],
            _WORK_QUEUE_SCHEMA,
        )

    def get_overlapping_ranges(self, start_height: int, end_height: int) -> DataFrame:
        """getOverlappingRanges (clickhouse_queries.js:220-231): queued
        ranges overlapping [start, end] — `NOT (e < s1 OR e1 < s)` with
        the probe interval a literal, so it pushes down to the scan."""
        return self.work_queue().filter(
            F.col("status").isin("pending", "processing")
            & ~(
                (F.col("end_height") < F.lit(start_height))
                | (F.lit(end_height) < F.col("start_height"))
            )
        )

    # -- failed_blocks (clickhouse_queries.js:234-258, worker.js:335-374) ---
    def failed_blocks(self) -> DataFrame:
        return self._final(
            self._read_log("failed_blocks", _FAILED_BLOCKS_SCHEMA),
            ["block_height"],
        )

    def add_failed_block(
        self,
        height: int,
        error_type: str,
        error_message: str,
        worker_id: str | None = None,
    ) -> None:
        """addFailedBlock (clickhouse_queries.js:234-252): upsert with
        attempts+1 — read current attempts, append the bumped row."""
        cur = self.failed_blocks().filter(
            F.col("block_height") == height
        ).collect()
        attempts = (cur[0]["attempts"] if cur else 0) + 1
        self._append(
            "failed_blocks",
            [{
                "block_height": int(height), "error_type": error_type,
                "error_message": error_message, "worker_id": worker_id,
                "attempts": attempts,
            }],
            _FAILED_BLOCKS_SCHEMA,
        )

    def remove_failed_block(self, height: int) -> None:
        """removeFailedBlock (clickhouse_queries.js:256-258)."""
        self._append(
            "failed_blocks",
            [{
                "block_height": int(height), "error_type": None,
                "error_message": None, "worker_id": None, "attempts": None,
                "_deleted": True,
            }],
            _FAILED_BLOCKS_SCHEMA,
        )

    def retry_schedule(self) -> DataFrame:
        """Retry backoff per failed block —
        `min(600, 2^min(attempts,5) * 5)` seconds
        (worker.js:335-374, scripts/retry_failed.js:82)."""
        return self.failed_blocks().withColumn(
            "retry_in_s",
            F.least(
                F.lit(600),
                F.pow(F.lit(2), F.least(F.col("attempts"), F.lit(5))) * 5,
            ).cast("int"),
        )

    # -- index_state (clickhouse_queries.js:115-139) ------------------------
    def get_last_indexed_height(self, index_name: str = "decoded_indexer") -> int:
        """getLastIndexedHeight (clickhouse_queries.js:115-125): latest
        row by updated_at for the index — argmax, 0 when absent."""
        log = self._read_log("index_state", _INDEX_STATE_SCHEMA)
        row = (
            self._final(log, ["index_name"])
            .filter(F.col("index_name") == index_name)
            .select("last_processed_height")
            .collect()
        )
        return int(row[0][0]) if row else 0

    def update_last_indexed_height(self, index_name: str, height: int) -> None:
        """updateLastIndexedHeight (clickhouse_queries.js:130-139)."""
        self._append(
            "index_state",
            [{
                "index_name": index_name,
                "last_processed_height": int(height),
                "updated_at": datetime.now(),
            }],
            _INDEX_STATE_SCHEMA,
        )

    # -- blocks / generic (clickhouse_queries.js:96-148) --------------------
    def insert(self, table: str, df: DataFrame) -> None:
        """insert (clickhouse_queries.js:96-110): bulk append of a
        DataFrame into a table directory."""
        df.write.mode("append").parquet(self._path(table))

    def get_max_block_height(self) -> int:
        """getMaxBlockHeight (clickhouse_queries.js:142-148)."""
        try:
            blocks = self.spark.read.parquet(self._path("blocks"))
        except Exception:
            return 0
        row = blocks.agg(F.max("height")).collect()[0][0]
        return int(row) if row is not None else 0

    def query(self, sql: str) -> DataFrame:
        """query (clickhouse_queries.js:8-72): ad-hoc SQL over the FINAL
        views — registers work_queue / failed_blocks / index_state and
        delegates to Spark SQL (Catalyst replaces the hand-rolled
        DELETE/UPDATE → ALTER rewriting: those are API methods here)."""
        self.work_queue().createOrReplaceTempView("work_queue")
        self.failed_blocks().createOrReplaceTempView("failed_blocks")
        self._final(
            self._read_log("index_state", _INDEX_STATE_SCHEMA), ["index_name"]
        ).createOrReplaceTempView("index_state")
        return self.spark.sql(sql)

    # -- orchestrator helpers (src/core/orchestrator.js) --------------------
    @staticmethod
    def split_range(start: int, end: int, parts: int) -> list[tuple[int, int]]:
        """splitRange (orchestrator.js:78-92): contiguous parts covering
        [start, end], sizes differing by ≤1, remainder on the first
        parts. Pure driver-side function (the distributed twin is the
        `range_split` operator)."""
        total = end - start + 1
        parts = max(1, min(parts, total))
        base, rem = divmod(total, parts)
        out, cur = [], start
        for i in range(parts):
            size = base + (1 if i < rem else 0)
            out.append((cur, cur + size - 1))
            cur += size
        return out

    # -- ClickHouse SQL dialect shim ----------------------------------------
    @staticmethod
    def ch_sql(sql: str) -> str:
        """Translate the ClickHouse SQL dialect the reference actually
        writes (clickhouse_queries.js / orchestrator.js / monitor) into
        Spark SQL, so a user can paste their query strings verbatim:

        - ``FROM t FINAL`` → ``FROM t`` (FINAL-at-read is built into
          every view this engine serves — the merge IS the read path)
        - ``count()`` → ``count(*)``
        - ``CAST(x AS UInt8/16/32/64 | Int64)`` / ``toUInt*/toInt64``
          → BIGINT casts
        - ``NOW()`` → ``current_timestamp()``
        - ``intDiv(a, b)`` → ``(a div b)``
        - ``argMax(a, b)`` / ``argMin`` → ``max_by`` / ``min_by``
        - ``uniqExact(x)`` → ``count(DISTINCT x)``;
          ``uniq(x)`` → ``approx_count_distinct(x)``
        - ``toStartOfDay(x)`` → ``date_trunc('DAY', x)``;
          ``toDate(x)`` → ``CAST(x AS DATE)``
        - ``expr::Int64/UInt64/bigint/int`` postfix casts (CH supports
          the PG-style ``::`` cast too) → ``CAST(expr AS BIGINT)``
        - ``generate_series(a, b)`` → ``explode(sequence(a, b))`` (the
          monitor's gap probe)
        - ``EXTRACT(EPOCH FROM (a - b))`` → unix_timestamp difference
          (the monitor's stuck/stale age arithmetic)
        - ``countIf(cond)`` → ``count_if(cond)``

        Round-8 breadth (the GROUP BY modifier / combinator families
        the CH-style OLAP surface serves — #83 rollup_totals, #84
        sum_map_daily):

        - ``GROUP BY k... WITH TOTALS`` → ``GROUP BY GROUPING SETS
          ((k...), ())`` — the grand-total extra row; rolled-up keys
          arrive as NULL (Spark grouping-sets idiom) where CH emits
          type defaults, disambiguate with ``grouping()`` either way
        - ``GROUP BY ... WITH ROLLUP / WITH CUBE`` pass through (Spark
          parses the CH postfix spelling natively — parity-tested)
        - ``sumMap(m)`` / ``minMap(m)`` / ``maxMap(m)`` over a
          ``Map(String, Int64)`` column (the attrs-map shape this
          engine serves) → a ``collect_list`` fold merged per key with
          ``map_zip_with`` — same union-of-keys semantics as CH
        - ``sumIf/avgIf/minIf/maxIf(x, cond)`` → ``agg(IF(cond, x,
          NULL))`` (countIf above predates this family)
        - ``quantile(q)(x)`` → ``percentile_approx(x, q)``;
          ``quantileExact(q)(x)`` → ``percentile(x, q)`` — the
          parameterized-aggregate syntax class
        - ``toStartOfMinute/Hour/Week/Month(x)`` → ``date_trunc`` of
          the matching unit (extends the toStartOfDay rewrite)

        Pure text translation for the constructs the reference uses —
        not a full CH parser; combinator arguments support one nested
        paren level (matching the intDiv/argMax patterns); anything it
        does not recognize passes through to Spark SQL untouched.
        tests/test_ch_dialect_parity.py extracts EVERY SELECT template
        literal actually present in the reference tree and runs it
        through this shim, so dialect drift in a future reference
        version fails a test instead of a user."""
        import re as _re

        out = _re.sub(r"\bFINAL\b", "", sql)
        # generate_series before the ::cast rewrite so its args are
        # still parenthesis-free when this pattern sees them
        out = _re.sub(
            r"\bgenerate_series\(([^()]+)\)",
            r"explode(sequence(\1))", out,
        )
        out = _re.sub(
            r"(\w+\(\*\)|\$?\w+)::(?:Int|UInt)?(?:int|bigint|8|16|32|64)\b",
            r"CAST(\1 AS BIGINT)", out, flags=_re.IGNORECASE,
        )
        out = _re.sub(
            r"EXTRACT\(\s*EPOCH\s+FROM\s+\(\s*(NOW\(\)|\w+)\s*-\s*(NOW\(\)|\w+)\s*\)\s*\)",
            r"(unix_timestamp(\1) - unix_timestamp(\2))",
            out, flags=_re.IGNORECASE,
        )
        out = _re.sub(r"\bcountIf\(", "count_if(", out)
        out = _re.sub(r"\bcount\(\s*\)", "count(*)", out,
                      flags=_re.IGNORECASE)
        # rewrite the TYPE token rather than the whole CAST(...) — the
        # cast operand may itself contain parens (a scalar subquery,
        # orchestrator.js's last_idx resolution)
        out = _re.sub(
            r"\bAS\s+(?:U?Int)(?:8|16|32|64)\b",
            "AS BIGINT", out, flags=_re.IGNORECASE,
        )
        out = _re.sub(r"\bto(?:UInt|Int)(?:8|16|32|64)\(([^()]+)\)",
                      r"CAST(\1 AS BIGINT)", out)
        out = _re.sub(r"\bNOW\(\)", "current_timestamp()", out,
                      flags=_re.IGNORECASE)
        out = _re.sub(r"\bintDiv\(([^(),]+),\s*([^()]+)\)",
                      r"(\1 div \2)", out)
        out = _re.sub(r"\bargMax\(([^(),]+),\s*([^()]+)\)",
                      r"max_by(\1, \2)", out)
        out = _re.sub(r"\bargMin\(([^(),]+),\s*([^()]+)\)",
                      r"min_by(\1, \2)", out)
        out = _re.sub(r"\buniqExact\(([^()]+)\)",
                      r"count(DISTINCT \1)", out)
        out = _re.sub(r"\buniq\(([^()]+)\)",
                      r"approx_count_distinct(\1)", out)
        out = _re.sub(r"\btoStartOfDay\(([^()]+)\)",
                      r"date_trunc('DAY', \1)", out)
        # toStartOfWeek defaults to mode 0 = SUNDAY-start weeks in
        # ClickHouse, while Spark's date_trunc('WEEK', x) is Monday-
        # start — shift by a day on both sides so the bucket boundary
        # lands on Sunday (and the result is a DATE, as in CH).
        out = _re.sub(
            r"\btoStartOfWeek\(([^()]+)\)",
            r"date_sub(date_trunc('WEEK', date_add(\1, 1)), 1)",
            out,
        )
        out = _re.sub(
            r"\btoStartOf(Minute|Hour|Month)\(([^()]+)\)",
            lambda m: f"date_trunc('{m.group(1).upper()}', {m.group(2)})",
            out,
        )
        out = _re.sub(r"\btoDate\(([^()]+)\)", r"CAST(\1 AS DATE)", out)
        # GROUP BY modifiers: WITH TOTALS is the one Spark lacks as a
        # postfix — the equivalent is the explicit grouping-sets pair
        # (all keys, grand total); WITH ROLLUP / WITH CUBE parse as-is.
        # the tempered dot — (?!GROUP\s+BY). — forbids a nested GROUP
        # BY inside the captured key list, so the rewrite anchors on
        # the LAST GROUP BY before WITH TOTALS and a subquery's own
        # grouping can never be folded into the grouping-sets keys
        out = _re.sub(
            r"GROUP\s+BY\s+((?:(?!GROUP\s+BY).)*?)\s+WITH\s+TOTALS",
            r"GROUP BY GROUPING SETS ((\1), ())",
            out, flags=_re.IGNORECASE | _re.S,
        )
        # -Map combinators over Map(String, Int64) columns: merge the
        # group's maps per key. map_zip_with unions key sets; the
        # coalesce pair makes a key missing on either side behave as
        # CH does (sum treats it as 0, min/max take the present value).
        _arg = r"([^(),]*(?:\([^()]*\)[^(),]*)*)"
        _fold = (
            "aggregate(collect_list({m}), "
            "cast(map() as map<string,bigint>), "
            "(acc, x) -> map_zip_with(acc, x, (k, a, b) -> {merge}))"
        )
        out = _re.sub(
            r"\bsumMap\(" + _arg + r"\)",
            lambda m: _fold.format(
                m=m.group(1), merge="coalesce(a, 0L) + coalesce(b, 0L)"
            ),
            out,
        )
        out = _re.sub(
            r"\bminMap\(" + _arg + r"\)",
            lambda m: _fold.format(
                m=m.group(1), merge="least(coalesce(a, b), coalesce(b, a))"
            ),
            out,
        )
        out = _re.sub(
            r"\bmaxMap\(" + _arg + r"\)",
            lambda m: _fold.format(
                m=m.group(1), merge="greatest(coalesce(a, b), coalesce(b, a))"
            ),
            out,
        )
        # -If combinator family (countIf handled above: Spark has a
        # native count_if; the rest become agg over a NULL-masked arg).
        # sumIf over a group where NO row satisfies the condition is 0
        # in ClickHouse (the type default) but sum(NULL...) = NULL in
        # Spark — coalesce restores the CH default. avgIf/minIf/maxIf
        # keep the NULL (CH would return nan/0/0 there; like the WITH
        # TOTALS caveat above, that empty-set corner is documented as
        # a dialect difference rather than faked with a sentinel that
        # would corrupt real aggregates).
        out = _re.sub(
            r"\bsumIf\(" + _arg + r",\s*" + _arg + r"\)",
            r"coalesce(sum(IF(\2, \1, NULL)), 0)", out,
        )
        out = _re.sub(
            r"\b(avg|min|max)If\(" + _arg + r",\s*" + _arg + r"\)",
            r"\1(IF(\3, \2, NULL))", out,
        )
        # parameterized aggregates: quantileExact BEFORE quantile (the
        # latter's pattern is a prefix of the former's)
        out = _re.sub(
            r"\bquantileExact\(([^()]+)\)\(([^()]+)\)",
            r"percentile(\2, \1)", out,
        )
        out = _re.sub(
            r"\bquantile\(([^()]+)\)\(([^()]+)\)",
            r"percentile_approx(\2, \1)", out,
        )
        return out

    def ch_query(self, sql: str) -> DataFrame:
        """Run a ClickHouse-dialect query string verbatim: translate
        with :meth:`ch_sql`, then execute over the FINAL views like
        :meth:`query`. The switch-engines path for a reference user's
        existing query text."""
        return self.query(self.ch_sql(sql))

    # -- PostgreSQL dialect shim (the monitor scripts) ----------------------
    # the table surface test_connection.js:29-40 probes for
    _PG_EXPECTED_TABLES = (
        "blocks", "failed_blocks", "index_state", "transactions_raw",
        "work_queue",
    )

    @staticmethod
    def pg_bind(sql: str, params=None) -> str:
        """node-pg positional binding: replace ``$1..$N`` with SQL
        literals the way the monitor's ``targetDB.query(sql, [..])``
        call sites do (scripts/monitor_indexer.js:104 binds the gap
        probe's ``Math.min(maxHeight, 10000)``)."""
        if not params:
            return sql
        out = sql
        for i in range(len(params), 0, -1):  # $10 before $1
            v = params[i - 1]
            if v is None:
                lit = "NULL"
            elif isinstance(v, bool):
                lit = "TRUE" if v else "FALSE"
            elif isinstance(v, (int, float)):
                lit = repr(v)
            elif isinstance(v, datetime):
                lit = f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
            else:
                lit = "'" + str(v).replace("'", "''") + "'"
            out = out.replace(f"${i}", lit)
        return out

    @classmethod
    def pg_sql(cls, sql: str, params=None) -> str:
        """Translate the PostgreSQL-dialect strings of the reference's
        monitor scripts (scripts/monitor_indexer.js:24-230,
        scripts/test_connection.js:22-58) to Spark SQL. The CH shim
        already covers the shared constructs (``NOW()``, ``::`` casts,
        ``generate_series`` → ``explode(sequence())``,
        ``EXTRACT(EPOCH FROM (a - b))`` → unix_timestamp difference);
        PG adds positional ``$N`` parameters (bound like node-pg) and
        the ``information_schema.tables`` catalog probe (served by the
        view :meth:`pg_query` registers). ``INTERVAL 'n unit'``
        literals and scalar subqueries parse natively in Spark."""
        import re as _re

        out = cls.pg_bind(sql, params)
        out = _re.sub(r"\binformation_schema\.tables\b",
                      "information_schema_tables", out,
                      flags=_re.IGNORECASE)
        return cls.ch_sql(out)

    def pg_query(self, sql: str, params=None) -> DataFrame:
        """Run one of the monitor scripts' PG-dialect queries VERBATIM
        — the switch-engines path for the reference's operational
        tooling, mirroring ``targetDB.query(sql, params)``
        (scripts/monitor_indexer.js:24, scripts/test_connection.js:22).

        Registers the monitor's full table surface first: the merged
        queue/state views, raw ``blocks`` / ``transactions_raw``
        (empty-with-schema before anything is indexed — the scripts'
        own "indexer may not have started yet" branch), a
        monitor-compat ``failed_blocks`` projection carrying the
        reference DDL's column names (init_clickhouse.js:95-111:
        ``height``/``retry_count``/``max_retries``/``status`` on top
        of the engine's narrower log schema), and the
        ``information_schema_tables`` view behind test_connection.js's
        structure probe."""
        self.work_queue().createOrReplaceTempView("work_queue")
        self._final(
            self._read_log("index_state", _INDEX_STATE_SCHEMA),
            ["index_name"],
        ).createOrReplaceTempView("index_state")
        # monitor-compat projection over the engine's failed-block log:
        # the DDL's max_retries default is 5 (init_clickhouse.js:102)
        fb = self.failed_blocks()
        fb.withColumn("height", F.col("block_height")) \
            .withColumn("retry_count", F.col("attempts")) \
            .withColumn("max_retries", F.lit(5)) \
            .withColumn(
                "status",
                F.when(F.col("attempts") >= 5, F.lit("failed"))
                .otherwise(F.lit("pending"))) \
            .createOrReplaceTempView("failed_blocks")
        raw = {
            "blocks": "height long, created_at timestamp",
            "transactions_raw":
                "tx_hash string, height long, created_at timestamp",
        }
        for t, schema in raw.items():
            try:
                df = self.spark.read.parquet(self._path(t))
            except Exception:
                df = self.spark.createDataFrame([], schema)
            df.createOrReplaceTempView(t)
        present = [(t, "public") for t in self._PG_EXPECTED_TABLES
                   if os.path.isdir(self._path(t))]
        self.spark.createDataFrame(
            present, "table_name string, table_schema string"
        ).createOrReplaceTempView("information_schema_tables")
        return self.spark.sql(self.pg_sql(sql, params))

    # -- client-level resilience (src/database/db.js) -----------------------
    # per-class linear backoff seconds (db.js:48-55: connection errors
    # back off 2s*attempt, timeouts 1s*attempt)
    TRANSIENT_BACKOFF = {"connection": 2.0, "timeout": 1.0}

    @staticmethod
    def _classify_transient(err: Exception) -> str | None:
        """db.js's transient-error taxonomy: connection-level failures
        (ECONNREFUSED / ENOTFOUND — here: refused/unreachable storage)
        and timeouts retry; everything else is a real error."""
        msg = str(err)
        if any(
            s in msg
            for s in (
                "ECONNREFUSED",
                "ENOTFOUND",
                "Connection refused",
                "UnknownHost",
            )
        ):
            return "connection"
        if "timeout" in msg.lower() or "timed out" in msg.lower():
            return "timeout"
        return None

    def run_with_retry(self, fn, retries: int = 3, sleeper=time.sleep):
        """The runClickHouseQuery / insertClickHouse retry policy
        (db.js:31-98): call ``fn`` (any thunk — a query action, an
        insert); on a TRANSIENT error (connection refused / timeout)
        back off linearly per class and retry up to ``retries``
        attempts, re-raising the last transient error on exhaustion;
        any non-transient error re-raises immediately, exactly like
        db.js's ``else throw err``. ``sleeper`` is injectable so tests
        assert the backoff schedule without sleeping."""
        last: Exception | None = None
        for attempt in range(1, retries + 1):
            try:
                return fn()
            except Exception as err:  # noqa: BLE001 — classify below
                cls = self._classify_transient(err)
                if cls is None:
                    raise
                last = err
                if attempt < retries:
                    sleeper(self.TRANSIENT_BACKOFF[cls] * attempt)
        assert last is not None
        raise last

    def test_connection(self, index_name: str = "orchestrator") -> dict:
        """testClickHouseConnection (db.js:99-113) + the health walk of
        scripts/test_connection.js:22-58: engine version, which of the
        expected tables exist under base_path, and the named index
        state's last height + staleness seconds (None when the indexer
        has not started — the script's '⚠️ no index state' branch).
        Returns a plain dict; an operational point-read like the
        reference's console check, not a registered analytics query."""
        expected = ("blocks", "work_queue", "failed_blocks", "index_state")
        tables = [t for t in expected if os.path.isdir(self._path(t))]
        out: dict = {
            "version": self.spark.version,
            "tables": tables,
            "last_processed_height": None,
            "state_age_s": None,
        }
        state = (
            self._final(
                self._read_log("index_state", _INDEX_STATE_SCHEMA),
                ["index_name"],
            )
            .filter(F.col("index_name") == index_name)
            .collect()
        )
        if state:
            out["last_processed_height"] = state[0]["last_processed_height"]
            updated = state[0]["updated_at"]
            if updated is not None:
                out["state_age_s"] = max(
                    0.0, round(time.time() - updated.timestamp(), 3)
                )
        return out

    # camelCase aliases — the reference's exact export names
    getLastIndexedHeight = get_last_indexed_height
    updateLastIndexedHeight = update_last_indexed_height
    getMaxBlockHeight = get_max_block_height
    countWorkQueue = count_work_queue
    getPendingWork = get_pending_work
    updateWorkQueueStatus = update_work_queue_status
    deleteWorkQueueItem = delete_work_queue_item
    insertWorkQueue = insert_work_queue
    getOverlappingRanges = get_overlapping_ranges
    addFailedBlock = add_failed_block
    removeFailedBlock = remove_failed_block
    splitRange = split_range
    runClickHouseQuery = run_with_retry
    testClickHouseConnection = test_connection
