"""Stateful streaming dedup: keep the first occurrence of each content
hash across micro-batches (`applyInPandasWithState`).

The batch pipeline dedups via the cache table (K1); on a stream of WARC
drops the same semantics need keyed state: group by content_hash, emit a
page only when its hash has not been seen in any earlier micro-batch.
State per key is a single boolean - O(distinct hashes) state, the
canonical keyed-dedup shape.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_hash string, url string, n_occurrences int"
STATE_SCHEMA = "seen boolean, n long"


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (content_hash,) = key
    batch = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        seen, n = state.get
    else:
        seen, n = False, 0
    n += len(batch)
    state.update((True, n))
    if not seen:
        first = batch.iloc[:1]
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "url": [first["url"].iloc[0]],
                "n_occurrences": [int(n)],
            }
        )


def stream_dedup_first_seen(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> first-seen rows per content hash (append mode)."""
    hashed = pages_stream.withColumn("content_hash", F.sha2(F.col("html"), 256))
    return (
        hashed.select("content_hash", "url")
        .groupBy("content_hash")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
