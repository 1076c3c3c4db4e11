"""CDC ingestion: Debezium envelope handling (SURVEY.md S10).

The reference's CDC path (cdc-local/) runs Postgres logical decoding
through Debezium Server with the ``ExtractNewRecordState`` SMT, so each
message is a JSON envelope whose ``payload`` is the *new row image* plus
metadata ``op, db, table, schema, lsn, source.ts_ms``
(cdc-local/config/debezium/application.properties:21-29; the consumer
reads ``payload`` at cdc-local/ps_sub.py:10-12).

The engine exposes:
- ``debezium_unwrap``  — envelope JSON -> typed row columns + metadata
- ``apply_changes``    — change-log compaction: latest-op-wins upsert /
  delete semantics over a batch of changes (the MERGE a foreachBatch
  sink would run per micro-batch).

Both are pure DataFrame transforms — in streaming they run unchanged on
a Kafka-source frame inside foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_demos_spark.schemas import debezium_envelope

_META = [
    ("op", T.StringType()),
    ("db", T.StringType()),
    ("table", T.StringType()),
    ("schema", T.StringType()),
    ("lsn", T.LongType()),
    ("source_ts_ms", T.LongType()),
]


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Full message schema: {"payload": {row..., meta...}}."""
    return T.StructType([T.StructField("payload", debezium_envelope(row_schema), True)])


def debezium_unwrap(raw: DataFrame, json_col: str, row_schema: T.StructType) -> DataFrame:
    """Parse Debezium envelope JSON strings into typed columns.

    Input: one string column of envelope JSON (Kafka ``value`` in the
    live path). Output: the row image columns typed per ``row_schema``
    plus the metadata columns. from_json runs JVM-side — no Python in
    the hot path.
    """
    parsed = raw.select(
        F.from_json(F.col(json_col), envelope_schema(row_schema)).alias("msg")
    )
    row_cols = [F.col(f"msg.payload.{f.name}").alias(f.name) for f in row_schema.fields]
    meta_cols = [F.col(f"msg.payload.{name}").alias(name) for name, _ in _META]
    return parsed.select(*row_cols, *meta_cols)


def apply_changes(changes: DataFrame, key_cols: list[str], seq_col: str = "lsn") -> DataFrame:
    """Compact a change log into current-state rows.

    Debezium op semantics: c/r/u upsert the row image, d deletes it
    (with delete-rewrite the tombstone still carries the key). The
    latest change per key wins, ordered by the log sequence number —
    one shuffle on the primary key, rank-1 filter, drop deletes.

    At scale this is the standard "dedupe change-log by (pk, max lsn)"
    pattern; AQE handles key skew and the window runs within the
    shuffled partitions (no second shuffle).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "d"))
        .drop("_rn")
    )


def scd2_history(
    changes: DataFrame, key_cols: list[str], seq_col: str = "lsn"
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log.

    Where ``apply_changes`` keeps only the latest row per key, this
    keeps EVERY version: each upsert (c/r/u) opens an interval
    ``[valid_from, valid_to)`` in log-sequence coordinates, closed by
    the next change to the same key; a delete (d) closes the previous
    version without opening one; ``is_current`` marks versions with no
    successor. This is the history table the reference's CDC consumer
    (cdc-local/ps_sub.py:10-12) would build if it kept versions instead
    of overwriting.

    One shuffle on the primary key; ``lead()`` runs inside the shuffled
    partitions. ``valid_to`` must be computed BEFORE dropping delete
    tombstones (a delete closes its predecessor's interval) — Catalyst
    keeps the op filter above the window because ``op`` is not a window
    partition key, so the order is stable.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.asc(seq_col))
    return (
        changes.withColumn("valid_from", F.col(seq_col))
        .withColumn("valid_to", F.lead(seq_col).over(w))
        .filter(F.col("op") != "d")
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_at(
    history: DataFrame, seq: int, seq_col: str = "lsn"
) -> DataFrame:
    """Time-travel read over an SCD-2 history: the table state AS OF
    log sequence ``seq`` — rows whose validity interval contains it
    (``valid_from <= seq`` and ``valid_to`` open or beyond). With the
    history materialized this is a pure filter: no window, no shuffle,
    and partition/row-group pruning applies if the history is laid out
    by ``valid_from`` (see ``catalog.write_range_sorted``).
    """
    return history.filter(
        (F.col("valid_from") <= F.lit(seq))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(seq)))
    ).drop(seq_col, "is_current")


def apply_changes_with_deletes(
    changes: DataFrame, key_cols: list[str], seq_col: str = "lsn"
) -> DataFrame:
    """Latest change per key INCLUDING delete tombstones.

    ``apply_changes`` answers "what rows exist now" and drops deletes;
    a sink maintaining EXTERNAL state must instead see the winning
    tombstones to propagate removals. Same single-shuffle rank-1 plan.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_foreach_batch(store: dict, key_cols: list[str], seq_col: str = "lsn"):
    """Build a ``foreachBatch`` function that MERGEs each micro-batch of
    unwrapped changes into a dict-like store: latest-wins upsert, delete
    on tombstone, and a sequence-number guard so a batch replayed after
    checkpoint recovery (or containing late-arriving older changes) can
    never regress a newer row — which is what makes the sink idempotent
    and therefore exactly-once under Structured Streaming's at-least-
    once foreachBatch contract.

    Deletes are retained as TOMBSTONE entries (op='d') rather than
    popped: dropping them would let an older upsert replayed after the
    delete resurrect the row (prev would be gone, so the guard could
    not fire). Read the live rows through ``current_state``; a real
    deployment garbage-collects tombstones once the replay window (the
    checkpoint retention) has passed them.

    The per-batch ``collect`` is bounded by the micro-batch's DISTINCT
    keys (post-compaction), not its row count; the production analog
    swaps the dict for a JDBC/Delta MERGE with the same guard in the ON
    clause.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        latest = apply_changes_with_deletes(batch_df, key_cols, seq_col)
        for r in latest.collect():
            row = r.asDict()
            key = (
                tuple(row[c] for c in key_cols)
                if len(key_cols) > 1
                else row[key_cols[0]]
            )
            prev = store.get(key)
            if prev is not None and prev[seq_col] >= row[seq_col]:
                continue
            store[key] = row

    return fn


def current_state(store: dict) -> dict:
    """Live rows of an ``upsert_foreach_batch`` store (tombstones
    filtered out)."""
    return {k: v for k, v in store.items() if v["op"] != "d"}


def make_envelopes(
    rows: DataFrame,
    op: str,
    db: str,
    table: str,
    schema: str = "public",
    lsn_offset: int = 0,
) -> DataFrame:
    """Build envelope JSON strings from typed rows (test/demo helper —
    the inverse of debezium_unwrap; mirrors what Debezium's SMT emits).
    ``lsn = key*10 + lsn_offset`` (key = first column) gives each op a
    deterministic position in the change log, so a c/u/d sequence built
    with increasing offsets compacts reproducibly."""
    first = rows.columns[0]
    lsn = F.col(first).cast("long") * 10 + F.lit(lsn_offset)
    payload = F.struct(
        *[F.col(c) for c in rows.columns],
        F.lit(op).alias("op"),
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.lit(schema).alias("schema"),
        lsn.alias("lsn"),
        (lsn * 1000).alias("source_ts_ms"),
    )
    return rows.select(F.to_json(F.struct(payload.alias("payload"))).alias("value"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-feed OUT — the inverse of ``apply_changes``: diff two
    snapshots of the same table into a minimal change set. Emits one row
    per changed key with ``op`` ('i' insert / 'u' update / 'd' delete)
    and, for updates, the comma-joined sorted list of changed columns
    (a string, not an array, so downstream sorts/hashes stay trivial).
    Unchanged keys emit nothing.

    This is how a batch pipeline publishes increments to consumers that
    can't rescan the world: diff yesterday's 100 TB snapshot against
    today's, ship only the delta. Plan: ONE co-partitioned full-outer
    join on the key (both sides shuffle by the same key — on bucketed
    tables even that exchange disappears), null-safe column compares,
    no window, no driver state.
    """
    cmp_cols = compare_cols or [
        c for c in old.columns if c in set(new.columns) and c not in key_cols
    ]
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in cmp_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in cmp_cols],
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ko_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_kn_{key_cols[0]}").isNotNull()
    changed = F.array_sort(
        F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    )
                    for c in cmp_cols
                ]
            )
        )
    )
    op = (
        F.when(~in_old, F.lit("i"))
        .when(~in_new, F.lit("d"))
        .when(F.size(changed) > 0, F.lit("u"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_kn_{k}"), F.col(f"_ko_{k}")).alias(k)
                for k in key_cols
            ],
            "op",
            F.when(F.col("op") == "u", F.array_join(changed, ","))
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )
