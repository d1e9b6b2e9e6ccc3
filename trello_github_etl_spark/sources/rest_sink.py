"""Rate-limited, idempotent REST/GraphQL sink connector (SURVEY.md
§2.1 S7–S11, §2.7 ST3–ST5).

The reference serializes every network write with a 3 s sleep
(etl.js:6, 148–151) and exponential backoff on secondary rate limits
(lib/gh.js:16, 32–44: 60 s → ×2 → cap 3660 s, reset on success). Here
the connector runs inside ``foreachPartition`` so upstream transforms
stay parallel; the sink stage controls its own parallelism:

- ``coalesce(1)`` for strict reference-equivalent serialization (ST5);
- N partitions with a per-partition token bucket for services that
  allow N concurrent writers.

Transport is injected (a callable), so tests run hermetically against
a recorder and the GitHub HTTP client is just one implementation.
No real network code lives in this repo — `http_transport` documents
the contract and raises unless a session factory is supplied.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row


@dataclass
class SinkConfig:
    """Throttle/backoff knobs, reference defaults."""

    sleep_s: float = 3.0  # etl.js:6 SLEEP=3000ms between changed upserts
    backoff_start_s: float = 60.0  # lib/gh.js:16
    backoff_cap_s: float = 3660.0  # lib/gh.js:37
    backoff_factor: float = 2.0  # lib/gh.js:36
    max_retries: int = 10
    serialize: bool = True  # ST5 strict sequential load


class RateLimited(Exception):
    """Transport signals a secondary rate limit (HTTP 403/429)."""


@dataclass
class _Backoff:
    """Reset-on-success exponential backoff (lib/gh.js:32–44)."""

    cfg: SinkConfig
    current_s: float = field(init=False)

    def __post_init__(self) -> None:
        self.current_s = self.cfg.backoff_start_s

    def on_rate_limit(self, sleep: Callable[[float], None]) -> None:
        sleep(self.current_s)
        self.current_s = min(
            self.current_s * self.cfg.backoff_factor, self.cfg.backoff_cap_s
        )

    def on_success(self) -> None:
        self.current_s = self.cfg.backoff_start_s


def run_sink(
    df: DataFrame,
    transport: Callable[[dict], None],
    cfg: SinkConfig | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Execute the plan rows through ``transport`` with ST3–ST5 semantics.

    ``transport`` receives one dict per row and either returns (success),
    raises ``RateLimited`` (retry with backoff), or raises anything else
    (fatal → task retry/job abort, preserving at-least-once + idempotent
    keys = effectively-once against an idempotent API).
    """
    cfg = cfg or SinkConfig()
    sink_df = df.coalesce(1) if cfg.serialize else df

    def handle_partition(rows: Iterator[Row]) -> None:
        backoff = _Backoff(cfg)
        first = True
        for row in rows:
            if not first:
                sleep(cfg.sleep_s)  # ST3 inter-upsert throttle
            first = False
            payload = row.asDict(recursive=True)
            for attempt in range(cfg.max_retries):
                try:
                    transport(payload)
                    backoff.on_success()
                    break
                except RateLimited:
                    if attempt == cfg.max_retries - 1:
                        raise
                    backoff.on_rate_limit(sleep)  # ST4

    sink_df.foreachPartition(handle_partition)


def http_transport(*_args, **_kwargs) -> Callable[[dict], None]:
    """Placeholder for a real REST/GraphQL transport (S7–S11).

    A production implementation posts issue creates/updates and
    project-field mutations per payload['op']; this container has no
    network, so construction fails loudly rather than pretending.
    """
    raise NotImplementedError(
        "supply a transport callable (e.g. requests.Session-based) to run_sink;"
        " tests inject a recorder"
    )
