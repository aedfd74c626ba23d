"""Spark 4 Python DataSource for the OpenSky /states/all REST API —
`spark.read.format("opensky")` (SURVEY T1.1's native mapping).

The thin driver-side client (opensky_api.py) matches the reference's
one-bbox-per-10-minutes cadence (extract_script.py:106-123). This
DataSource is the scale path the reference cannot express: the bbox
SPLITS INTO LATITUDE-STRIP TILES, one InputPartition per tile, so the
fetch fans out across executors — N independent, smaller API reads
instead of one giant driver-side payload. Decode semantics are
identical to `states_to_dataframe` (positional array-of-arrays,
missing tail columns back-filled NULL, every value stringified).

The OAuth2 token is obtained ONCE on the driver (in `partitions()`)
and shipped inside each partition value — executors never hold client
credentials, only the short-lived bearer token.

Streaming: `spark.readStream.format("opensky")` maps the reference's
10-minute cron loop (extract_script.py:106-123) onto a
SimpleDataSourceStreamReader — each micro-batch is ONE API poll, the
offset is the poll counter, and `readBetweenOffsets` replays a
committed batch deterministically (test-injected payloads; a real
re-poll cannot replay, which is exactly why the FILE landing zone +
checkpoint (streaming/ingest.py) remains the exactly-once production
path — the live poll stream is for latency-tolerant monitoring marts,
and the docstring of each names the trade).

Deliberately NOT implemented:
* `pushFilters` — the raw contract is all-string columns (SURVEY
  §1.2), so Catalyst pushes STRING comparisons; mapping those onto the
  numeric bbox parameters would silently change semantics (lexical vs
  numeric order). Bbox narrowing belongs in the read options, typed.

Tests inject `fake_payloads` (a JSON list of /states/all payloads, one
per tile) so no network is touched; the real transport is stdlib
urllib, executor-side.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import RAW_COLUMNS, RAW_SCHEMA

FORMAT_NAME = "opensky"


class _TilePartition(InputPartition):
    def __init__(
        self, index: int, bbox: tuple[float, float, float, float], token: str | None
    ):
        self.index = index
        self.bbox = bbox
        self.token = token


def _decode_states(payload: dict) -> Iterator[tuple]:
    """Positional states decode — exact `states_to_dataframe` semantics
    (extract_script.py:191-238): absent/empty states → no rows."""
    for s in payload.get("states") or []:
        vals = list(s[: len(RAW_COLUMNS)]) + [None] * (len(RAW_COLUMNS) - len(s))
        yield tuple(None if v is None else str(v) for v in vals)


class OpenSkyReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def _bbox(self) -> tuple[float, float, float, float]:
        o = self.options
        return (
            float(o.get("lamin", "-90")),
            float(o.get("lomin", "-180")),
            float(o.get("lamax", "90")),
            float(o.get("lomax", "180")),
        )

    def partitions(self) -> Sequence[InputPartition]:
        lamin, lomin, lamax, lomax = self._bbox()
        tiles = max(1, int(self.options.get("tiles", "1")))
        token = None
        if self.options.get("token_url"):
            from .opensky_api import JobConfig, get_access_token

            token = get_access_token(
                JobConfig(
                    job_name="datasource",
                    base_url=self.options.get("base_url", ""),
                    endpoint=self.options.get("endpoint", "/states/all"),
                    lamin=lamin,
                    lomin=lomin,
                    lamax=lamax,
                    lomax=lomax,
                    output_path="",
                    client_id=self.options.get("client_id", ""),
                    client_secret=self.options.get("client_secret", ""),
                    token_url=self.options.get("token_url", ""),
                )
            )
        step = (lamax - lamin) / tiles
        return [
            _TilePartition(
                i,
                (lamin + i * step, lomin, lamin + (i + 1) * step, lomax),
                token,
            )
            for i in range(tiles)
        ]

    def read(self, partition: _TilePartition) -> Iterator[tuple]:
        fakes = self.options.get("fake_payloads")
        if fakes is not None:
            payloads = json.loads(fakes)
            payload = (
                payloads[partition.index]
                if partition.index < len(payloads)
                else {"states": []}
            )
            yield from _decode_states(payload)
            return

        import urllib.parse
        import urllib.request

        lamin, lomin, lamax, lomax = partition.bbox
        params = urllib.parse.urlencode(
            {"lamin": lamin, "lomin": lomin, "lamax": lamax, "lomax": lomax}
        )
        url = (
            f"{self.options.get('base_url', '')}"
            f"{self.options.get('endpoint', '/states/all')}?{params}"
        )
        headers = (
            {"Authorization": f"Bearer {partition.token}"} if partition.token else {}
        )
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            payload = json.loads(resp.read())
        yield from _decode_states(payload)


class OpenSkyStreamReader(SimpleDataSourceStreamReader):
    """Live-poll micro-batch reader: one /states/all poll per batch.

    Offset = {"poll": n} (monotone counter). With test-injected
    `fake_stream_payloads`, poll i deterministically yields payload i
    (and nothing past the list) so `readBetweenOffsets` replays a
    committed range bit-for-bit; against the live API a replay would
    re-poll NOW and see different aircraft — the documented reason
    the file landing zone stays the exactly-once path.
    """

    def __init__(self, options: dict):
        self.options = options

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _payload(self, n: int) -> dict:
        fakes = self.options.get("fake_stream_payloads")
        if fakes is not None:
            payloads = json.loads(fakes)
            return payloads[n] if n < len(payloads) else {"states": []}
        import urllib.parse
        import urllib.request

        params = urllib.parse.urlencode(
            {
                "lamin": self.options.get("lamin", "-90"),
                "lomin": self.options.get("lomin", "-180"),
                "lamax": self.options.get("lamax", "90"),
                "lomax": self.options.get("lomax", "180"),
            }
        )
        url = (
            f"{self.options.get('base_url', '')}"
            f"{self.options.get('endpoint', '/states/all')}?{params}"
        )
        with urllib.request.urlopen(  # noqa: S310
            urllib.request.Request(url), timeout=30
        ) as resp:
            return json.loads(resp.read())

    def read(self, start: dict):
        n = start["poll"]
        rows = list(_decode_states(self._payload(n)))
        return rows, {"poll": n + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for n in range(start["poll"], end["poll"]):
            rows.extend(_decode_states(self._payload(n)))
        return rows


class OpenSkyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return RAW_SCHEMA

    def reader(self, schema) -> OpenSkyReader:
        return OpenSkyReader(self.options)

    def simpleStreamReader(self, schema) -> OpenSkyStreamReader:
        return OpenSkyStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the format with a session:
    `spark.read.format("opensky")...load()` afterwards."""
    spark.dataSource.register(OpenSkyDataSource)
