"""Deterministic Senzing-report fixture generator (FIXTURES.md §1-3).

Seed 42. Exercises: F1 bearer names, F2 empty names, C8 type-inference
branches (RECORD_TYPE PERSON/ORGANIZATION/absent, DOB/GROUP_ASSOCIATION
vs DUNS/WEBSITE), C9 blank match keys, A6 empty ENTITY_DESCs, F3 all
four MATCH_LEVEL_CODEs, and a graph where 2-hop ⊋ 1-hop ⊋ seeds.
"""

from __future__ import annotations

import json
import os
import random

N_ENTITIES = 80

COUNTRY_CODES = [("USA", "United States"), ("DEU", "Germany"), ("FRA", "France"),
                 ("VGB", "British Virgin Islands"), ("PAN", "Panama"), ("CHE", "Switzerland")]

BEARER_NAMES = ["THE BEARER", "bearer shares", "nan", "???", "EL PORTADOR", "Bearer 123"]

FIRST = ["Maria", "John", "Wei", "Fatima", "Igor", "Ana", "Luis", "Kira"]
LAST = ["Silva", "Smith", "Chen", "Khan", "Petrov", "Costa", "Diaz", "Novak"]
ORG_A = ["Global", "Pacific", "Summit", "Apex", "Delta", "Orion", "Vertex", "Nova"]
ORG_B = ["Holdings", "Trading", "Partners", "Ventures", "Capital", "Group", "Trust", "Services"]


def make_report(rng: random.Random, n_entities: int = N_ENTITIES) -> list[dict]:
    rows = []
    for uid in range(1, n_entities + 1):
        is_person = rng.random() < 0.4
        if rng.random() < 0.06:
            name = rng.choice(BEARER_NAMES)
        elif is_person:
            name = f"{rng.choice(FIRST)} {rng.choice(LAST)} {uid}"
        else:
            name = f"{rng.choice(ORG_A)} {rng.choice(ORG_B)} {uid} S.A."

        entity_name = "" if rng.random() < 0.05 else name

        features: dict[str, list[dict]] = {"NAME": [{"FEAT_DESC": name}]}
        if rng.random() < 0.7:
            features["RECORD_TYPE"] = [{"FEAT_DESC": "PERSON" if is_person else "ORGANIZATION"}]
        if is_person:
            if rng.random() < 0.6:
                features["DOB"] = [{"FEAT_DESC": f"19{rng.randint(40, 99)}-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}"}]
            if rng.random() < 0.3:
                features["GROUP_ASSOCIATION"] = [{"FEAT_DESC": f"{rng.choice(ORG_A)} {rng.choice(ORG_B)}"}]
        else:
            if rng.random() < 0.5:
                features["DUNS_NUMBER"] = [{"FEAT_DESC": str(rng.randint(10**8, 10**9 - 1))}]
            if rng.random() < 0.4:
                features["WEBSITE"] = [{"FEAT_DESC": f"www.example{uid}.com"}]
        if rng.random() < 0.5:
            features["ADDRESS"] = [{"FEAT_DESC": f"{rng.randint(1, 999)} Main St, City {rng.randint(1, 50)}"}]
        if rng.random() < 0.3:
            features["PHONE"] = [{"FEAT_DESC": f"+{rng.randint(1, 99)} {rng.randint(100, 999)} {rng.randint(1000, 9999)}"}]
        if rng.random() < 0.6:
            code = rng.choice(COUNTRY_CODES + [("XXX", None)])[0]
            if rng.random() < 0.2:
                code = f" {code} "  # padded code exercises strip() in J1
            features["COUNTRY_OF_ASSOCIATION"] = [{"FEAT_DESC": code}]
        # second element in a feature array is never read (S1 semantics)
        if rng.random() < 0.2:
            features["NAME"].append({"FEAT_DESC": "IGNORED SECOND NAME"})

        records = []
        for r in range(rng.randint(0, 3)):
            records.append(
                {
                    "DATA_SOURCE": rng.choice(["icij", "Icij", "OPEN-SANCTIONS"]),
                    "RECORD_ID": f"r{uid}-{r}",
                    "MATCH_KEY": "" if rng.random() < 0.1 else f"+NAME+DOB{r}",
                    "ENTITY_DESC": "" if rng.random() < 0.1 else name,
                    "INTERNAL_ID": rng.randint(1, n_entities),
                }
            )

        rows.append(
            {
                "RESOLVED_ENTITY": {
                    "ENTITY_ID": uid,
                    "ENTITY_NAME": entity_name,
                    "FEATURES": features,
                    "RECORDS": records,
                },
                "RELATED_ENTITIES": [],
            }
        )

    # wire a connected-enough graph: ring + random chords, all 4 levels
    levels = ["POSSIBLY_SAME", "POSSIBLY_RELATED", "RESOLVED", "DISCLOSED"]
    for i, row in enumerate(rows):
        uid = row["RESOLVED_ENTITY"]["ENTITY_ID"]
        neighbors = {(uid % n_entities) + 1}
        for _ in range(rng.randint(0, 3)):
            neighbors.add(rng.randint(1, n_entities))
        neighbors.discard(uid)
        row["RELATED_ENTITIES"] = [
            {"ENTITY_ID": n, "MATCH_LEVEL_CODE": rng.choice(levels)} for n in sorted(neighbors)
        ]
    return rows


def write_fixture(dirpath: str, n_entities: int = N_ENTITIES) -> dict[str, str]:
    """Write report/suspicious/countries files; returns paths.

    ``n_entities`` scales the report (seed stays 42, so any size is
    deterministic); suspicious seeds are picked by stride so the 2-hop
    reach stays a similar fraction of the graph at every scale."""
    rng = random.Random(42)
    rows = make_report(rng, n_entities)
    os.makedirs(dirpath, exist_ok=True)
    report = os.path.join(dirpath, "senzing_report.jsonl")
    with open(report, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    # suspicions: graph names (= first non-empty ENTITY_DESC) that hit,
    # plus misses. Entity "name" in the graph is ENTITY_DESC-based, so
    # pick from records.
    graph_names = []
    for r in rows:
        descs = [rec["ENTITY_DESC"] for rec in r["RESOLVED_ENTITY"]["RECORDS"] if rec["ENTITY_DESC"]]
        if descs:
            graph_names.append(descs[0])
    stride = max(1, len(graph_names) // 16)
    hits = graph_names[::stride][:16]
    suspicious = os.path.join(dirpath, "suspicious.txt")
    with open(suspicious, "w") as f:
        for n in hits + ["No Such Person", "Ghost Corp LLC", "Missing Name 999"]:
            f.write(n + "\n")

    countries = os.path.join(dirpath, "country.tsv")
    with open(countries, "w") as f:
        f.write("code\tname\n")
        for code, cname in COUNTRY_CODES:
            f.write(f"{code}\t{cname}\n")
        f.write("ZZZ\tUnused Land\n")
    return {"report": report, "suspicious": suspicious, "countries": countries}
