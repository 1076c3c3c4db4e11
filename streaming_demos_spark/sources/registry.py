"""Confluent Schema Registry REST client (S5 companion).

The reference fetches writer schemas from a live registry at runtime
(kotlin-examples/orders-stats-flink/src/main/kotlin/me/jaehyeon/kafka/
Utils.kt:48-70: ``CachedSchemaRegistryClient`` -> ``
getLatestSchemaMetadata(subject)`` -> parse; same pattern in
orders-avro-clients and orders-stats-streams). The engine's Avro
surface (``avro_codec``/``kafka``) handles the 5-byte Confluent wire
format and binary decode/encode but previously required the caller to
SUPPLY the schema JSON — the first thing a real user on a live
Confluent stack hits. This module closes that gap with the three REST
calls those clients actually issue:

- ``GET  /schemas/ids/{id}``                    (consumer by-id path)
- ``GET  /subjects/{subject}/versions/latest``  (reference's path)
- ``POST /subjects/{subject}/versions``         (producer register)

Design constraints honored here:

- **stdlib only** (urllib) — no confluent/requests dependency exists
  in this container; the transport is INJECTABLE so tests (and any
  air-gapped run) use canned responses without a live registry.
- **driver-side resolution**: schemas resolve ONCE on the driver and
  the parsed JSON string rides into the executors' Arrow-batched
  decode (``avro_codec.decode_confluent_avro``). Executors never talk
  to the registry — at 1000 executors a per-task fetch is a
  self-inflicted DDoS and a hidden hot dependency; the reference's
  CachedSchemaRegistryClient makes the same choice per-JVM.
- **bounded cache** mirroring ``CachedSchemaRegistryClient(url, 100)``:
  by-ID memoization only (schema ids are immutable bindings), with
  least-recently-inserted eviction; subject "latest" is deliberately
  NOT cached — it is a mutable pointer that a register moves.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from collections.abc import Callable


class SchemaRegistryError(RuntimeError):
    """Raised when the registry cannot serve a schema — message keeps
    the subject/id like the reference's wrapped RuntimeException
    (Utils.kt:66-69)."""


class SchemaRegistryClient:
    """Minimal Confluent REST client with an injectable transport.

    ``transport(method, url, body) -> (status, response_bytes)``; the
    default uses urllib. ``cache_capacity`` bounds both memo maps
    (default 100, the reference's CachedSchemaRegistryClient size).
    """

    def __init__(
        self,
        base_url: str,
        transport: Callable[[str, str, bytes | None], tuple[int, bytes]] | None = None,
        cache_capacity: int = 100,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self._transport = transport or _urllib_transport
        self._capacity = cache_capacity
        self._by_id: OrderedDict[int, str] = OrderedDict()

    # -- REST surface ------------------------------------------------------

    def get_schema_by_id(self, schema_id: int) -> str:
        """Writer schema JSON for a wire-format schema id
        (``GET /schemas/ids/{id}``)."""
        cached = self._by_id.get(schema_id)
        if cached is not None:
            # true LRU: refresh recency on hit, otherwise eviction is
            # insertion-order and the hottest (oldest-registered) id
            # is evicted first once the map fills.
            self._by_id.move_to_end(schema_id)
            return cached
        body = self._get(f"/schemas/ids/{int(schema_id)}", what=f"id {schema_id}")
        schema = body["schema"]
        self._remember(self._by_id, schema_id, schema)
        return schema

    def get_latest(self, subject: str) -> tuple[int, int, str]:
        """(schema_id, version, schema_json) for a subject's latest
        version — the reference's ``getLatestSchemaMetadata`` call
        (``GET /subjects/{subject}/versions/latest``).

        NOT cached: "latest" is a mutable pointer — a register (by
        this process or any other) moves it, and a memoized value
        would keep decoding new-schema frames with the old writer
        schema. The immutable by-id lookup carries the caching; this
        call is one driver-side round-trip per query
        (``resolve_reader_schema``), not per task."""
        body = self._get(
            f"/subjects/{subject}/versions/latest", what=f"subject '{subject}'"
        )
        meta = (int(body["id"]), int(body["version"]), body["schema"])
        # the id->schema binding IS immutable: seed the by-id cache
        self._remember(self._by_id, meta[0], meta[2])
        return meta

    def register(self, subject: str, schema_json: str) -> int:
        """Register a schema under a subject, returning its id
        (``POST /subjects/{subject}/versions``). Producer path; not
        cached (the registry is the source of truth for assignment)."""
        payload = json.dumps({"schema": schema_json}).encode()
        try:
            status, raw = self._transport(
                "POST", f"{self.base_url}/subjects/{subject}/versions", payload
            )
        except Exception as e:  # network layer — same contract as _get
            raise SchemaRegistryError(
                f"Failed to register schema for subject '{subject}' "
                f"at registry {self.base_url}: {e}"
            ) from e
        if status != 200:
            raise SchemaRegistryError(
                f"Failed to register schema for subject '{subject}' "
                f"(HTTP {status})"
            )
        return int(json.loads(raw)["id"])

    # -- internals ---------------------------------------------------------

    def _get(self, path: str, what: str) -> dict:
        try:
            status, raw = self._transport("GET", self.base_url + path, None)
        except Exception as e:  # network layer
            raise SchemaRegistryError(
                f"Failed to retrieve schema for {what} from registry "
                f"{self.base_url}: {e}"
            ) from e
        if status != 200:
            raise SchemaRegistryError(
                f"Failed to retrieve schema for {what} from registry "
                f"{self.base_url} (HTTP {status})"
            )
        return json.loads(raw)

    def _remember(self, cache: OrderedDict, key, value) -> None:
        cache[key] = value
        # re-inserting an existing key does not move it in an
        # OrderedDict — refresh recency so eviction below is LRU.
        cache.move_to_end(key)
        while len(cache) > self._capacity:
            cache.popitem(last=False)


def _urllib_transport(
    method: str, url: str, body: bytes | None
) -> tuple[int, bytes]:
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    req = Request(
        url,
        data=body,
        method=method,
        headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
    )
    try:
        with urlopen(req, timeout=10) as resp:
            return resp.status, resp.read()
    except HTTPError as e:
        return e.code, e.read()


def resolve_reader_schema(
    client: SchemaRegistryClient, subject: str
) -> tuple[int, str]:
    """Driver-side schema resolution for a Kafka-Avro read: latest
    (id, schema_json) for the subject, ready to pass to
    ``avro_codec.decode_confluent_avro`` / ``kafka`` readers. One
    registry round-trip per query, zero per executor."""
    schema_id, _version, schema = client.get_latest(subject)
    return schema_id, schema
