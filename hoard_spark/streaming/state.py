"""Custom stateful streaming operator: per-(metric, bucket) LWW changelog.

The engine's LWW contract is at-read (append everything, newest ``seq``
wins — hoard_spark/ingest.py); this operator is its push-side twin: a
stream of raw upserts compacts into a CHANGELOG that emits one row per
(metric, bucket_ts) per micro-batch ONLY when the bucket's winner
changed. Downstream consumers (alerting, caches, sinks that charge per
write) see state transitions, not every duplicate/stale write.

Implemented with ``applyInPandasWithState`` (SURVEY.md §2C tail: custom
stateful operators are the one streaming shape windows can't express):
state per key = the winning ``(seq, value)``, Arrow-batched like every
other Python stage in this repo. State size is O(live buckets); a real
deployment bounds it with a processing-time timeout evicting buckets
past retention (the same bound the reference's ring imposes physically).

No reference analog (src/hoard.coffee has no streaming runtime); this is
part of the declared streaming extension (SURVEY.md §2B/§7).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pandas only needed executor-side
    import pandas as pd

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("bucket_ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("seq", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def lww_changelog(stream_df: DataFrame) -> DataFrame:
    """(metric, bucket_ts, value, seq) stream → LWW-compacted changelog.

    Emits a row for a key exactly when this micro-batch raised the key's
    winning ``seq`` — i.e. when the bucket's visible value changed. Ties
    and stale (lower-seq) arrivals emit nothing, so replays of
    already-applied writes are absorbed silently (idempotent changelog).
    """

    def update(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        best_seq, best_val = state.get if state.exists else (None, None)
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            i = pdf["seq"].idxmax()
            seq, val = int(pdf["seq"][i]), float(pdf["value"][i])
            if best_seq is None or seq > best_seq:
                best_seq, best_val, changed = seq, val, True
        if changed:
            state.update((best_seq, best_val))
            yield pd.DataFrame(
                {
                    "metric": [key[0]],
                    "bucket_ts": [key[1]],
                    "value": [best_val],
                    "seq": [best_seq],
                }
            )

    return stream_df.groupBy("metric", "bucket_ts").applyInPandasWithState(
        update,
        CHANGELOG_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
