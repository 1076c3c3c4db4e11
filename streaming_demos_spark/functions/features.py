"""Feature-engineering transforms (SURVEY.md §2.10, preprocessor.py).

Reference parity (product-recommender/recsys-engine/src/preprocessor.py):
- one-hot:      pd.get_dummies (:56, :109)  -> explicit category columns
- min-max:      MinMaxScaler (:60-61, :117-121) -> (x-min)/(max-min) via
                a broadcast 1-row aggregate (no collect, no Spark ML dep)
- flag columns: is_coffee = product_id in [...] (:113-114) -> isin+cast

All pure column expressions over declared category lists — deterministic
and oracle-checkable. (A StringIndexer/OneHotEncoder pipeline would add
a fit stage; the reference's category sets are fixed, so explicit
columns are both faster and exactly reproducible.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def one_hot(df: DataFrame, col: str, categories: list[str], prefix: str | None = None) -> DataFrame:
    """Explicit one-hot columns for a declared category list
    (pd.get_dummies with fixed columns). Unknown values get all-zeros —
    the schema-alignment behavior serving needs (models.py:101-104)."""
    prefix = prefix or col
    out = df
    for cat in categories:
        safe = cat.lower().replace(" ", "_")
        out = out.withColumn(
            f"{prefix}_{safe}", (F.col(col) == cat).cast("int")
        )
    return out


def min_max_scale(df: DataFrame, cols: list[str], suffix: str = "_scaled") -> DataFrame:
    """(x - min) / (max - min) per column, min/max from a broadcast
    1-row global aggregate cross-joined into the plan — one extra
    (cheap, column-pruned) pass, no driver collect. Constant columns
    scale to 0.0 (sklearn MinMaxScaler maps them to 0)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(rng != 0, (F.col(c) - F.col(f"_min_{c}")) / rng).otherwise(0.0),
        )
    return out.drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])


def flag_in(df: DataFrame, col: str, values: list, flag_name: str) -> DataFrame:
    """Membership flag column (is_coffee pattern, preprocessor.py:113-114)."""
    return df.withColumn(flag_name, F.col(col).isin(values).cast("int"))
