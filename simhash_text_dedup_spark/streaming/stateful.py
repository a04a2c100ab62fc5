"""Stateful streaming dedup: per-entity fingerprint tracking with
applyInPandasWithState.

The reference's incremental mechanism is a driver loop comparing each
re-crawled page's fingerprint against its stored previous fingerprint
(unchanged -> "unload", DeDupMapper.java:147-153) and its load flags in
HBase. This module is the continuous-ingestion version of that
per-entity state machine: a stream of fingerprinted document versions,
grouped by entity_id, with the last fingerprint kept in Spark state.

Emitted per arriving version:
  decision = 'new'       first version of the entity ever seen
             'unchanged' fingerprint equals the stored one (unload)
             'modified'  fingerprint differs (re-index)
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
        T.StructField("decision", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_fingerprint", T.LongType()),
        T.StructField("n_versions", T.LongType()),
    ]
)


def _track_entity(
    key: Tuple[Any], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (entity_id,) = key
    if state.exists:
        last_fp, n_seen = state.get
    else:
        last_fp, n_seen = None, 0

    out_rows = []
    for pdf in pdfs:
        # deterministic order within the micro-batch
        pdf = pdf.sort_values("doc_id")
        for r in pdf.itertuples(index=False):
            if n_seen == 0:
                decision = "new"
            elif int(r.fingerprint) == int(last_fp):
                decision = "unchanged"
            else:
                decision = "modified"
            out_rows.append(
                (entity_id, int(r.doc_id), int(r.fingerprint), decision)
            )
            last_fp = int(r.fingerprint)
            n_seen += 1

    state.update((last_fp, n_seen))
    yield pd.DataFrame(
        out_rows, columns=["entity_id", "doc_id", "fingerprint", "decision"]
    )


def track_entity_versions(fingerprint_stream: DataFrame) -> DataFrame:
    """fingerprint_stream(entity_id long, doc_id long, fingerprint long)
    [streaming] -> append stream of per-version decisions."""
    return (
        fingerprint_stream.groupBy("entity_id")
        .applyInPandasWithState(
            _track_entity,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
