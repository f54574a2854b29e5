"""Streaming per-source document caps (arrival-order admission).

The streaming face of ``corpus.cap_per_stratum``: a live crawl must stop
admitting documents from a domain once its budget is spent, WITHOUT a
global batch pass. Stateful per-stratum counting via
``applyInPandasWithState`` — state is one integer per stratum, so the
state store stays tiny no matter how large the stream.

Policy difference, stated up front: the batch operator selects the cap
lowest ``(sample_key, id)`` rows (pseudo-uniform), while a stream cannot
see the future and admits FIRST-ARRIVED rows up to the cap. The two
agree on counts (min(cap, stratum size) per stratum — pinned in tests),
not on membership; use the batch operator for reproducible offline
selection and this one for live admission control.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_CAP_STATE_SCHEMA = StructType([StructField("admitted", LongType())])


def _make_cap_fn(cap: int):
    def admit(key, pdf_iter, state: GroupState):
        (stratum,) = key
        (admitted,) = state.get if state.exists else (0,)
        out = []
        for pdf in pdf_iter:
            if admitted >= cap:
                continue
            take = pdf.iloc[: max(0, cap - admitted)]
            admitted += len(take)
            if len(take):
                out.append(
                    pd.DataFrame(
                        {"source": stratum, "doc_id": take["doc_id"].values}
                    )
                )
        state.update((admitted,))
        yield from out or [pd.DataFrame({"source": [], "doc_id": []})]

    return admit


def streaming_source_cap(
    stream: DataFrame,
    cap: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit at most ``cap`` rows per stratum, first-arrived-first:
    emits ``(source, doc_id)`` of admitted rows. State per stratum is a
    single counter, so memory is O(#strata) forever.
    """
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(stratum_col).alias("source"), F.col(id_col).alias("doc_id")
    )
    # schema follows the INPUT column types (string urls, int strata, ...)
    # instead of hardcoding string/long — the signature's generality is
    # only real if the Arrow round-trip agrees with the declared types
    out_schema = StructType(
        [
            StructField("source", keyed.schema["source"].dataType),
            StructField("doc_id", keyed.schema["doc_id"].dataType),
        ]
    )
    return keyed.groupBy("source").applyInPandasWithState(
        _make_cap_fn(cap),
        outputStructType=out_schema,
        stateStructType=_CAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
