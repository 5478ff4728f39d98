"""Iceberg REST-catalog client (public REST Catalog OpenAPI spec).

Real lakehouses resolve tables through a catalog (REST / Hive / Glue),
not filesystem ``version-hint.text`` pointers: Trino, Snowflake and
Spark's own Iceberg runtime all ``loadTable`` by name and commit
through the optimistic-requirements protocol.  This client speaks the
published REST endpoints with nothing but stdlib HTTP:

- ``GET  /v1/config``                                   (prefix discovery)
- ``POST /v1/{prefix}/namespaces``                      (createNamespace)
- ``GET  /v1/{prefix}/namespaces/{ns}/tables/{t}``      (loadTable)
- ``POST /v1/{prefix}/namespaces/{ns}/register``        (registerTable —
  adopt an existing metadata JSON, the first-export path)
- ``POST /v1/{prefix}/namespaces/{ns}/tables/{t}``      (commitTable —
  assert-* requirements + update actions; 409 = optimistic conflict)

:func:`register_iceberg_export` chains the engine's filesystem export
(operators/iceberg_interop.export_manifest_as_iceberg) with catalog
registration: first export registers the metadata location, later
exports commit ``add-snapshot`` + ``set-snapshot-ref`` updates guarded
by ``assert-ref-snapshot-id``, so a concurrent exporter CONFLICTS
instead of clobbering — the same optimistic model as the ManifestTable
commit backend, now spanning engines.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request


class RestCatalogError(RuntimeError):
    def __init__(self, status: int, error_type: str, message: str):
        super().__init__(f"{status} {error_type}: {message}")
        self.status = status
        self.error_type = error_type


class CatalogCommitConflict(RestCatalogError):
    """A requirement failed (HTTP 409) — reload and retry."""


class IcebergRestCatalog:
    def __init__(self, base_url: str, token: str | None = None, timeout: float = 30.0):
        self.base = base_url.rstrip("/")
        self.token = token
        self.timeout = timeout
        cfg = self._req("GET", "/v1/config")
        self.prefix = (cfg.get("overrides") or {}).get("prefix") or (
            cfg.get("defaults") or {}
        ).get("prefix") or ""

    # ------------------------------------------------------------- transport
    def _req(self, method: str, path: str, body: dict | None = None) -> dict:
        url = self.base + path
        data = None if body is None else json.dumps(body).encode()
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else {}
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                err = (json.loads(raw).get("error") or {}) if raw else {}
            except ValueError:
                err = {}
            cls = CatalogCommitConflict if e.code == 409 else RestCatalogError
            raise cls(
                e.code, err.get("type", "unknown"), err.get("message", raw[:200])
            ) from e

    @staticmethod
    def _ns_enc(namespace: str) -> str:
        # multi-level namespaces join with the unit separator %1F per the
        # REST spec ("a.b.c" → "a%1Fb%1Fc")
        return urllib.parse.quote("\x1f".join(namespace.split(".")), safe="")

    def _tpath(self, namespace: str, name: str | None = None) -> str:
        p = f"/v1/{self.prefix}/namespaces" if self.prefix else "/v1/namespaces"
        ns = self._ns_enc(namespace)
        if name is None:
            return p if namespace == "" else f"{p}/{ns}"
        return f"{p}/{ns}/tables/{urllib.parse.quote(name, safe='')}"

    # --------------------------------------------------------------- catalog
    def create_namespace(self, namespace: str) -> None:
        try:
            self._req(
                "POST",
                self._tpath(""),
                {"namespace": namespace.split("."), "properties": {}},
            )
        except RestCatalogError as e:
            if e.status != 409:  # AlreadyExists is fine (idempotent setup)
                raise

    def table_exists(self, namespace: str, name: str) -> bool:
        try:
            self.load_table(namespace, name)
            return True
        except RestCatalogError as e:
            if e.status == 404:
                return False
            raise

    def load_table(self, namespace: str, name: str) -> dict:
        """LoadTableResult: {"metadata-location": str, "metadata": dict}."""
        return self._req("GET", self._tpath(namespace, name))

    def register_table(self, namespace: str, name: str, metadata_location: str) -> dict:
        base = f"/v1/{self.prefix}/namespaces" if self.prefix else "/v1/namespaces"
        return self._req(
            "POST",
            f"{base}/{self._ns_enc(namespace)}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def commit_table(
        self,
        namespace: str,
        name: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """CommitTableRequest; raises :class:`CatalogCommitConflict` on a
        failed requirement (the optimistic-retry signal)."""
        return self._req(
            "POST",
            self._tpath(namespace, name),
            {
                "identifier": {"namespace": namespace.split("."), "name": name},
                "requirements": requirements,
                "updates": updates,
            },
        )


def register_iceberg_export(
    catalog: IcebergRestCatalog,
    namespace: str,
    name: str,
    table,
    version: int | None = None,
) -> str:
    """Export *table* (a ManifestTable) as an Iceberg snapshot AND make
    it resolvable through the catalog; returns the metadata location the
    catalog now serves.

    First export: ``registerTable`` adopts the written metadata JSON.
    Later exports: ``commitTable`` with ``assert-table-uuid`` +
    ``assert-ref-snapshot-id`` on ``main`` guarding ``add-snapshot`` /
    ``set-snapshot-ref`` — a racing exporter gets
    :class:`CatalogCommitConflict`, never a clobbered snapshot.
    """
    from verified_sources_spark.operators.iceberg_interop import (
        export_manifest_as_iceberg,
    )

    metadata_path = export_manifest_as_iceberg(table, version)
    meta = json.loads(table.fs.read_text(metadata_path))
    new_snapshot = meta["snapshots"][-1]

    if not catalog.table_exists(namespace, name):
        catalog.register_table(namespace, name, metadata_path)
        return metadata_path

    current = catalog.load_table(namespace, name)
    cur_meta = current.get("metadata") or {}
    requirements = [
        {"type": "assert-table-uuid", "uuid": cur_meta.get("table-uuid")},
        {
            "type": "assert-ref-snapshot-id",
            "ref": "main",
            "snapshot-id": cur_meta.get("current-snapshot-id"),
        },
    ]
    updates = [
        {"action": "add-snapshot", "snapshot": new_snapshot},
        {
            "action": "set-snapshot-ref",
            "ref-name": "main",
            "type": "branch",
            "snapshot-id": new_snapshot["snapshot-id"],
        },
    ]
    out = catalog.commit_table(namespace, name, requirements, updates)
    return out.get("metadata-location", metadata_path)
