"""Model sinks/sources closing the LinUCB loop (SURVEY.md S13/S14) and
generic debug sinks (S11/S16).

Reference parity:
- Redis sink:   recsys-trainer/.../infrastructure/redis/RedisSinkWriter.kt:50-69
                (SET linucb:{productId} -> JSON {"A_inv": [[..]], "b": [..]},
                 idempotent => at-least-once delivery is effectively-once,
                 RedisSink.kt:10-22)
- Redis source: recsys-engine/src/bandit_manager.py:109-132 (one MGET for
                all models; identity/zeros fallback for cold keys)

The store is pluggable: any dict-like client with ``mset``/``mget``
works. ``redis.Redis`` satisfies it when the library is installed
(import-gated — not baked into this container); tests use InMemoryKV.
Publishing happens driver-side after collecting ONLY the model rows —
P·(d²+d) doubles, a broadcast-scale payload by construction, never the
feedback log itself.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


class InMemoryKV:
    """Dict-backed stand-in for a Redis client (tests/local runs)."""

    def __init__(self):
        self.data: dict[str, str] = {}

    def mset(self, mapping: dict[str, str]) -> None:
        self.data.update(mapping)

    def mget(self, keys: list[str]) -> list[str | None]:
        return [self.data.get(k) for k in keys]


def redis_client(url: str = "redis://localhost:6379"):
    """Real Redis client, import-gated (library not in this container)."""
    try:
        import redis  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "the redis library is not installed in this container; pass an "
            "InMemoryKV or any client with mset/mget instead"
        ) from exc
    return redis.Redis.from_url(url, decode_responses=True)


def publish_models(
    models: DataFrame,
    kv,
    key_prefix: str = "linucb:",
    key_col: str = "product_id",
) -> int:
    """SET linucb:{pid} -> JSON(A_inv, b) for every model row, one
    batched mset round trip (RedisSinkWriter.kt:55-61 wire format).
    Idempotent by construction — safe to replay a micro-batch."""
    rows = models.select(key_col, "a_inv", "b").collect()
    mapping = {
        f"{key_prefix}{r[key_col]}": json.dumps(
            {"A_inv": r["a_inv"], "b": r["b"]}, separators=(",", ":")
        )
        for r in rows
    }
    if mapping:
        kv.mset(mapping)
    return len(mapping)


def model_sink(kv, key_prefix: str = "linucb:", key_col: str = "product_id"):
    """foreachBatch writer for the streaming trainer: latest model per
    key in the batch (highest n_obs) is published."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        cols = batch_df.columns
        latest = batch_df
        if "n_obs" in cols:
            w = Window.partitionBy(key_col).orderBy(F.desc("n_obs"))
            latest = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        publish_models(latest, kv, key_prefix, key_col)

    return write


def fetch_models(
    spark,
    kv,
    product_ids: list,
    d: int,
    key_prefix: str = "linucb:",
    lam: float = 1.0,
) -> DataFrame:
    """One MGET for all requested models (bandit_manager.py:109-132);
    cold keys fall back to the λI⁻¹ / zeros prior (:119-121). Returns a
    model DataFrame scoreable by operators.linucb.score_models."""
    keys = [f"{key_prefix}{pid}" for pid in product_ids]
    raw = kv.mget(keys)
    cold_a_inv = [
        [(1.0 / lam if i == j else 0.0) for j in range(d)] for i in range(d)
    ]
    rows = []
    for pid, payload in zip(product_ids, raw):
        if payload is None:
            rows.append((str(pid), cold_a_inv, [0.0] * d))
        else:
            m = json.loads(payload)
            rows.append((str(pid), m["A_inv"], m["b"]))
    return spark.createDataFrame(
        rows,
        "product_id string, a_inv array<array<double>>, b array<double>",
    )
