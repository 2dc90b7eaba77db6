"""HTTP client for a toshi-ray server — the analogue of the reference's
`toshi-client` crate (AsyncClient trait, `toshi-client/src/lib.rs:31-58`):
index() banner, list, index_summary(include_sizes), create_index,
add_document(+options), search, all_docs, plus the bulk/flush/delete
routes the server exposes. Stdlib urllib; raises ToshiClientError with
the server's reference-format `{"message": ...}` body on 4xx/5xx.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any


class ToshiClientError(Exception):
    """Carries the server's error message (str(exc)) and HTTP status."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


class ToshiClient:
    """Synchronous client, one method per route (lib.rs:62-82's sync
    surface; the async variant is the same table)."""

    def __init__(self, host: str, timeout: float = 30.0):
        self.host = host.rstrip("/")
        self.timeout = timeout

    def _request(self, method: str, path: str, body: Any = None,
                 raw_body: str | None = None):
        data = None
        if raw_body is not None:
            data = raw_body.encode()
        elif body is not None:
            data = json.dumps(body).encode()
        req = urllib.request.Request(self.host + path, data=data, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read()
        except urllib.error.HTTPError as e:
            payload = e.read()
            try:
                msg = json.loads(payload).get("message", payload.decode())
            except (ValueError, AttributeError):
                msg = payload.decode(errors="replace")
            raise ToshiClientError(e.code, msg) from None
        return json.loads(payload) if payload else None

    # ---- AsyncClient surface (lib.rs:31-58) ----
    def index(self) -> dict:
        """GET / — service banner."""
        return self._request("GET", "/")

    def list(self) -> list[str]:
        return self._request("GET", "/_list")

    def index_summary(self, index: str, include_sizes: bool = False) -> dict:
        qs = "?include_sizes=true" if include_sizes else ""
        return self._request("GET", f"/{index}/_summary{qs}")

    def create_index(self, name: str, schema: list[dict]) -> dict:
        return self._request("PUT", f"/{name}/_create", body=schema)

    def add_document(self, index: str, document: dict,
                     options: dict | None = None) -> dict:
        body = {"document": document}
        if options is not None:
            body["options"] = options
        return self._request("PUT", f"/{index}", body=body)

    def search(self, index: str, search: dict) -> dict:
        return self._request("POST", f"/{index}", body=search)

    def all_docs(self, index: str) -> dict:
        return self._request("GET", f"/{index}")

    # ---- server routes beyond the client trait ----
    def bulk_insert(self, index: str, ndjson: str) -> dict:
        return self._request("POST", f"/{index}/_bulk", raw_body=ndjson)

    def flush(self, index: str) -> dict:
        return self._request("GET", f"/{index}/_flush")

    def delete_term(self, index: str, terms: dict) -> dict:
        return self._request("DELETE", f"/{index}", body=terms)
