"""Independent pure-Python oracle for the reference pipeline semantics.

This is a from-scratch reimplementation of the *observable behavior* of
/root/reference/src/senzing_pipeline.py (per SURVEY.md §5 strategy #2),
including its two documented type-inference bugs:

- entities path: type is always "ORG" (enum-vs-str key mismatch makes
  every membership test false; the truthy-string ``or`` then yields ORG)
- alias path: RECORD_TYPE comparison is against an array, never equal,
  so PER iff DOB/GROUP_ASSOCIATION key present, else ORG

Used only by tests to golden-check the Spark pipeline.
"""

from __future__ import annotations

import json
import re
from collections import Counter

from erkg_tutorials_spark.functions.bearer import BEARER_PATTERNS

ALIAS_MATCH_LEVELS = {"POSSIBLY_SAME", "RESOLVED", "DISCLOSED"}


def _keep_name(name: str) -> bool:
    low = name.lower()
    return not any(re.search(p, low) for p in BEARER_PATTERNS)


def read_report(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def read_countries(path: str) -> dict[str, str]:
    out = {}
    with open(path) as f:
        next(f)
        for line in f:
            code, name = line.rstrip("\n").split("\t")
            out[code] = name
    return out


def read_suspicions(path: str) -> list[str]:
    with open(path) as f:
        return [line.rstrip() for line in f]


def first_features(row: dict) -> dict[str, str]:
    return {
        k: v[0]["FEAT_DESC"] for k, v in row["RESOLVED_ENTITY"]["FEATURES"].items()
    }


def alias_type(features: dict) -> str:
    return "PER" if ("DOB" in features or "GROUP_ASSOCIATION" in features) else "ORG"


def oracle_entities(rows: list[dict], countries: dict, id_filter: set[str] | None = None) -> dict:
    out = {}
    for row in rows:
        ent_id = str(row["RESOLVED_ENTITY"]["ENTITY_ID"])
        if id_filter is not None and ent_id not in id_filter:
            continue
        feats = first_features(row)
        name = feats.get("NAME")
        if not name:
            continue
        if not _keep_name(name.strip()):
            continue
        text = name
        if desc := feats.get("ADDRESS"):
            text += ", located at " + desc
        if desc := feats.get("DUNS_NUMBER"):
            text += ", DUNS " + desc
        if desc := feats.get("PHONE"):
            text += ", phone " + desc
        if desc := feats.get("COUNTRY_OF_ASSOCIATION"):
            if country := countries.get(desc.strip()):
                text += ", in " + country
        if desc := feats.get("WEBSITE"):
            text += ", website " + desc
        out[ent_id] = {"entity_id": ent_id, "type": "ORG", "name": name, "description": text}
    return out


def oracle_alias_rows(rows: list[dict]) -> list[dict]:
    out = []
    for row in rows:
        ent = row["RESOLVED_ENTITY"]
        if not ent["ENTITY_NAME"]:
            continue
        typ = alias_type(ent["FEATURES"])
        for rec in ent["RECORDS"]:
            out.append({"alias": rec["ENTITY_DESC"], "entity": rec["INTERNAL_ID"], "type": typ})
        for rel in row["RELATED_ENTITIES"]:
            if rel["MATCH_LEVEL_CODE"] in ALIAS_MATCH_LEVELS:
                out.append({"alias": ent["ENTITY_NAME"], "entity": rel["ENTITY_ID"], "type": typ})
    return out


def oracle_alias_distributions(alias_rows: list[dict]) -> dict:
    """alias → (entities in first-occurrence order, probabilities)."""
    groups: dict[str, Counter] = {}
    for r in alias_rows:
        groups.setdefault(r["alias"], Counter())[str(r["entity"])] += 1
    return {
        alias: {
            "entities": list(c),
            "probabilities": [n / c.total() for n in c.values()],
        }
        for alias, c in groups.items()
    }


def oracle_graph(rows: list[dict]) -> dict[int, dict]:
    graph: dict[int, dict] = {}
    for row in rows:
        uid = row["RESOLVED_ENTITY"]["ENTITY_ID"]
        name, records = "", {}
        for rec in row["RESOLVED_ENTITY"]["RECORDS"]:
            record_uid = rec["DATA_SOURCE"].upper() + "." + str(rec["RECORD_ID"])
            mk = rec["MATCH_KEY"]
            records[record_uid] = "INITIAL" if mk.strip() == "" else mk
            if name == "" and rec["ENTITY_DESC"] != "":
                name = rec["ENTITY_DESC"]
        if name == "":
            name = str(uid)
        graph[uid] = {
            "name": name,
            "records": records,
            "num_recs": len(records),
            "related": {r["ENTITY_ID"]: r for r in row["RELATED_ENTITIES"]},
            "has_ref": False,
        }
    for uid, e in graph.items():
        if e["num_recs"] > 0:
            e["has_ref"] = True
        for rid in e["related"]:
            graph[rid]["has_ref"] = True
    return graph


def oracle_filter(suspicions: list[str], graph: dict[int, dict]) -> set[str]:
    rank0 = {uid for uid, e in graph.items() if e["name"] in set(suspicions)}
    rank1 = {rid for uid in rank0 for rid in graph[uid]["related"]}
    rank2 = {rid for seed in rank0 | rank1 for rid in graph[seed]["related"]}
    return {str(i) for i in rank0 | rank1 | rank2}


def oracle_pipeline(report_path: str, suspicious_path: str, countries_path: str):
    """Full main() semantics (senzing_pipeline.py:400-421)."""
    rows = read_report(report_path)
    countries = read_countries(countries_path)
    suspicions = read_suspicions(suspicious_path)
    graph = oracle_graph(rows)
    ids = oracle_filter(suspicions, graph)
    entities = oracle_entities(rows, countries, id_filter=ids)
    alias_rows = [a for a in oracle_alias_rows(rows) if str(a["entity"]) in ids]
    aliases = oracle_alias_distributions(alias_rows)
    return {"ids": ids, "entities": entities, "aliases": aliases, "graph": graph}
