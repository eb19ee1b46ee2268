"""PipelineConfig — the reference's MongoDB config documents as plain
dataclasses (SURVEY.md §3 EP1 steps 2-4; etl_ui.py:130-145).

The reference persists four Mongo collections (ConfigAdvanced, ConfigRenCol,
ConfigColMap, ConfigMapEnt) keyed by survey year. They are KB-sized pipeline
*metadata*, not data — so the engine models them as a dataclass loaded from
JSON (``PipelineConfig.from_json``), broadcast implicitly as literals inside
column expressions.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from fefal_etl_spark.functions.text import py_normalize_text

# etl_ui.py:79 — values (post-normalize) that mark a garbage entity name.
BAD_NAME_SET = ("", "nd", "nan", "n/a", "na", "nao definido", "sem dados")


@dataclass(frozen=True)
class GroupSpec:
    """1-based inclusive column range (etl_ui.py:146-150)."""

    start: int
    end: int


@dataclass
class PipelineConfig:
    year: int
    # group name -> positional range over the raw wide frame
    groups: dict[str, GroupSpec] = field(default_factory=dict)
    # normalized original header -> canonical column name (ConfigRenCol;
    # matching is on *normalized* names, etl_ui.py:41-51)
    rename_map: dict[str, str] = field(default_factory=dict)
    # normalized survey entity-type -> canonical registry type (ConfigMapEnt)
    entity_type_map: dict[str, str] = field(default_factory=dict)
    # interests column classifiers (etl_ui.py:253-261)
    comment_keys: list[str] = field(default_factory=lambda: ["comentario"])
    formando_keys: list[str] = field(default_factory=lambda: ["formandos"])
    # etl_ui.py:81-84: surveys without a type column default to municipalities
    default_entity_type: str = "Municípios"
    bad_names: tuple[str, ...] = BAD_NAME_SET

    def __post_init__(self) -> None:
        self.rename_map = {py_normalize_text(k): v for k, v in self.rename_map.items()}
        self.entity_type_map = {
            py_normalize_text(k): v for k, v in self.entity_type_map.items()
        }

    def validate(self, n_cols: int) -> list[str]:
        """Group sanity checks (etl_ui.py:1189-1209): in-bounds, start<=end,
        no overlaps. Returns a list of problems (empty = ok)."""
        problems = []
        spans: list[tuple[int, int, str]] = []
        for name, g in self.groups.items():
            if g.start < 1 or g.end > n_cols or g.start > g.end:
                problems.append(f"group '{name}' range [{g.start},{g.end}] invalid for {n_cols} cols")
            spans.append((g.start, g.end, name))
        spans.sort()
        for (s1, e1, n1), (s2, e2, n2) in zip(spans, spans[1:]):
            if s2 <= e1:
                problems.append(f"groups '{n1}' and '{n2}' overlap")
        return problems

    def resolve_groups(self, columns: list[str]) -> dict[str, list[str]]:
        """Positional ranges -> explicit column-name lists, resolved ONCE at
        ingest (SURVEY.md §1.1: positions are fragile at scale; names are
        stable plan references)."""
        return {
            name: list(columns[g.start - 1 : g.end]) for name, g in self.groups.items()
        }

    @classmethod
    def from_mongo_docs(
        cls,
        collections: dict,
        year: int,
    ) -> "PipelineConfig":
        """Importer for the reference's ACTUAL Mongo document shapes
        (etl_ui.py:131-146 ``load_mongo_configs``) — closes SURVEY §2.1
        S4: a migrating user dumps the four collections (e.g. with
        ``mongoexport``) and feeds them here unmodified.

        ``collections`` maps collection name -> list of documents:

        - ``ConfigAdvanced``: single doc
          ``{"keys": {"comment_keys": [...], "formando_keys": [...]},
          "default_type": "interesse"}`` (the reference fetches one by
          ObjectId; here the first doc wins). Missing keys default to
          ``[]`` / ``"interesse"`` exactly as the reference's
          ``.get(...)`` fallbacks do.
        - ``ConfigRenCol``: docs ``{"original_name", "new_name"}``
          (reference: ``create_map(ren_col, "original_name",
          "new_name")``).
        - ``ConfigColMap``: docs ``{"year": int, "groups": {name:
          {"start": int, "end": int}}}`` — the doc matching ``year`` is
          selected (reference: ``find_one({"year": year})``); a missing
          year raises, like the reference's None subscript would.
        - ``ConfigMapEnt``: docs ``{"tipo_entidade_inq",
          "tipo_entidade_norm"}``.

        ``_id`` fields (ObjectId strings in an export) are ignored."""
        adv_docs = collections.get("ConfigAdvanced") or []
        adv = adv_docs[0] if adv_docs else {}
        col_map = next(
            (
                d
                for d in collections.get("ConfigColMap") or []
                if d.get("year") == year
            ),
            None,
        )
        if col_map is None:
            raise KeyError(f"no ConfigColMap document for year {year}")
        groups = {
            name: GroupSpec(start=int(lims["start"]), end=int(lims["end"]))
            for name, lims in (col_map.get("groups") or {}).items()
        }
        keys = adv.get("keys") or {}
        return cls(
            year=year,
            groups=groups,
            rename_map={
                d["original_name"]: d["new_name"]
                for d in collections.get("ConfigRenCol") or []
            },
            entity_type_map={
                d["tipo_entidade_inq"]: d["tipo_entidade_norm"]
                for d in collections.get("ConfigMapEnt") or []
            },
            comment_keys=list(keys.get("comment_keys") or []),
            formando_keys=list(keys.get("formando_keys") or []),
        )

    @classmethod
    def from_json(cls, path: str) -> "PipelineConfig":
        with open(path) as f:
            raw = json.load(f)
        groups = {k: GroupSpec(**v) for k, v in raw.get("groups", {}).items()}
        ren = {
            d["original_name"]: d["new_name"] for d in raw.get("ren_col", [])
        }
        ent = {
            d["tipo_entidade_inq"]: d["tipo_entidade_norm"]
            for d in raw.get("map_ent", [])
        }
        keys = raw.get("interests_keys", {})
        return cls(
            year=raw.get("year", 0),
            groups=groups,
            rename_map=ren,
            entity_type_map=ent,
            comment_keys=keys.get("comment_keys", ["comentario"]),
            formando_keys=keys.get("formando_keys", ["formandos"]),
        )
