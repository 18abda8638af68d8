"""S9 — REST source: distributed fetch of JSON records for an id list.

Reference shape: utils/download_bacdive.py pages an authenticated REST API
id-by-id and accumulates JSON records. Spark-first re-expression: the id/
URL list is a DataFrame; an Arrow-batched ``mapInPandas`` performs the
fetches with bounded retry/backoff and per-row error capture (one failed
endpoint cannot kill the scan — it becomes an error row, mirroring the
multimodal decode contract). Downstream parsing is ordinary ``from_json``.

The transport is INJECTED (``fetcher: url -> str``): this sandbox has no
network, so tests use stub fetchers; production passes a urllib/requests
closure (serialized to executors). Politeness at scale: repartition the
endpoint list to bound per-host concurrency (`max_partitions`), and keep
batch sizes modest — the operator is I/O-bound, not CPU-bound.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Iterator, Optional

from pyspark.sql import DataFrame

FETCH_SCHEMA = "id string, url string, body string, error string, attempts int"


def fetch_json_records(
    endpoints: DataFrame,
    fetcher: Callable[[str], str],
    id_col: str = "id",
    url_col: str = "url",
    max_attempts: int = 3,
    backoff_sec: float = 0.5,
    max_partitions: Optional[int] = None,
    sleeper: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """endpoints(id, url, …) → (id, url, body|NULL, error|NULL, attempts).

    ``max_attempts`` is the TOTAL number of tries (first call + retries)
    and must be >= 1 — with 0 the attempt loop would never run and emit a
    body=NULL/error=NULL row indistinguishable from a legitimate null-body
    success. Retries back off exponentially; a row that exhausts attempts
    carries the final error string instead of raising (fail-open error
    channel, like the reference logging-and-continuing on bad ids)."""
    if max_attempts < 1:
        raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
    df = endpoints.select(id_col, url_col)
    if max_partitions is not None:
        df = df.coalesce(max_partitions)

    import pandas as pd

    def _fetch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, urls, bodies, errors, attempts = [], [], [], [], []
            for rid, url in zip(pdf[id_col], pdf[url_col]):
                body, err, tries = None, None, 0
                for attempt in range(1, max_attempts + 1):
                    tries = attempt
                    try:
                        body = fetcher(url)
                        err = None
                        break
                    except Exception as e:  # noqa: BLE001 — error channel by contract
                        err = f"{type(e).__name__}: {e}"
                        if attempt < max_attempts:
                            sleeper(backoff_sec * (2 ** (attempt - 1)))
                ids.append(rid)
                urls.append(url)
                bodies.append(body)
                errors.append(err)
                attempts.append(tries)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="object"),
                    "url": pd.Series(urls, dtype="object"),
                    "body": pd.Series(bodies, dtype="object"),
                    "error": pd.Series(errors, dtype="object"),
                    "attempts": pd.Series(attempts, dtype="int32"),
                }
            )

    return df.mapInPandas(_fetch, FETCH_SCHEMA)
