"""Streaming time-series smoothing: the stateful form of
``relational.ewma_smooth``.

Batch ≡ stream duality contract: the batch operator computes, per key,
a bounded-lookback normalized EWMA over the last K values in (ts, id)
order; this module maintains exactly that K-value tail in keyed state
(``applyInPandasWithState``) and emits the identical smoothed value per
row. ``tests/test_streaming_ewma.py`` asserts row-level equality when
the same rows arrive across arbitrary micro-batch splits IN ORDER.

State per key is K doubles — bounded regardless of stream length, the
same property the batch window frame has per row. Rows inside a batch
are sorted by (ts, id) before applying; cross-batch ordering is the
caller's contract (route through a watermark + sorted replay for
out-of-order feeds — the late-record machinery in supplier_stats tags
what that path must exclude).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_ewma(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.3,
    lookback: int = 16,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key streaming EWMA with the SAME semantics as the batch
    ``ewma_smooth``: weights ``(1-alpha)^d`` over the most recent
    ``lookback`` values, normalized over the rows actually present.

    Emits one row per input row (append mode): (key, id, ts, value,
    ewma). NULL values are dropped, mirroring the batch contract.
    """
    q = 1.0 - alpha
    # id_col may coincide with ts_col (a per-key-unique timestamp is a
    # valid row id) — dedupe so the pandas frame has unique labels.
    cols = list(dict.fromkeys([key_col, id_col, ts_col, value_col]))
    keyed = stream.select(*[F.col(c) for c in cols]).filter(
        F.col(value_col).isNotNull()
    )
    fields = {f.name: f.dataType for f in keyed.schema.fields}
    out_schema = T.StructType(
        [T.StructField(c, fields[c]) for c in cols]
        + [T.StructField("ewma", T.DoubleType())]
    )

    def run(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        tail: list[float] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(list(dict.fromkeys([ts_col, id_col])))
            out = []
            for v in pdf[value_col]:
                tail.append(float(v))
                if len(tail) > lookback:
                    tail.pop(0)
                n = len(tail)
                num = sum(x * q ** (n - 1 - i) for i, x in enumerate(tail))
                den = (1.0 - q**n) / alpha
                out.append(round(num / den, round_dp))
            pdf = pdf.copy()
            pdf["ewma"] = out
            yield pdf[cols + ["ewma"]]
        state.update((tail,))

    return keyed.groupBy(key_col).applyInPandasWithState(
        run,
        outputStructType=out_schema,
        stateStructType="tail array<double>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_decayed_engagement(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_sec: float = 86400.0,
    round_dp: int = 6,
) -> DataFrame:
    """Streaming frecency: per-key half-life-decayed count/value
    maintained in keyed state and re-emitted each micro-batch, decayed
    AS OF the key's latest seen event time.

    Duality contract with the batch ``curation.decayed_engagement``:
    after processing rows in event-time order, the emitted row equals
    the batch operator evaluated at ``reference_ts = max(ts seen)`` for
    that key (asserted in ``tests/test_streaming_ewma.py``). State per
    key is three numbers — (decayed_count, decayed_value, last_ts_us) —
    regardless of stream length: each arrival decays the accumulators
    by ``0.5^(Δt/half_life)`` and adds itself, which telescopes to the
    batch sum exactly (the exponential's group property).
    """
    keyed = stream.select(
        F.col(key_col), F.col(ts_col), F.col(value_col)
    ).filter(F.col(ts_col).isNotNull())
    fields = {f.name: f.dataType for f in keyed.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(key_col, fields[key_col]),
            T.StructField("n_events", T.LongType()),
            T.StructField("decayed_count", T.DoubleType()),
            T.StructField("decayed_value", T.DoubleType()),
        ]
    )

    def run(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, dc, dv, last_us = state.get
        else:
            n, dc, dv, last_us = 0, 0.0, 0.0, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                t_us = int(pd.Timestamp(ts).value // 1000)
                if last_us is not None:
                    decay = 0.5 ** (
                        (t_us - last_us) / 1e6 / half_life_sec
                    )
                    dc *= decay
                    dv *= decay
                dc += 1.0
                dv += float(v) if v is not None and not pd.isna(v) else 0.0
                last_us = t_us
                n += 1
        state.update((n, dc, dv, last_us))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "decayed_count": [round(dc, round_dp)],
                "decayed_value": [round(dv, round_dp)],
            }
        )

    return keyed.groupBy(key_col).applyInPandasWithState(
        run,
        outputStructType=out_schema,
        stateStructType=(
            "n long, dc double, dv double, last_us long"
        ),
        outputMode="update",
        timeoutConf="NoTimeout",
    )
