"""C8 — entity type inference, bug-for-bug with the reference.

The reference's ``get_entity_type``
(/root/reference/src/senzing_pipeline.py:122-135) has two call-site-
dependent behaviors caused by two latent bugs, both preserved here for
golden parity (SURVEY.md §7 "replicate, document"):

1. **Alias path** (called with the raw JSON ``FEATURES`` dict,
   senzing_pipeline.py:237): keys are strings so the membership tests
   work, but ``features["RECORD_TYPE"]`` is an *array* of feature
   structs — never equal to the string "PERSON"/"ORGANIZATION", so the
   RECORD_TYPE branch never returns. Then DOB/GROUP_ASSOCIATION →
   "PER"; otherwise the third test reads ``EntityFeature.DUNS_NUMBER
   .value or ...`` — a truthy string — so it always returns "ORG".
   Net: PER iff DOB or GROUP_ASSOCIATION present, else ORG; never MISC.

2. **Entities path** (called with the enum-keyed feature map,
   senzing_pipeline.py:158): every ``"KEY" in entity_features``
   membership test compares a *string* against *enum* keys → always
   False, and the truthy-``or`` again returns "ORG". Net: always ORG
   (the PER description branch at :178-193 is dead code).

:func:`entity_type_intended` implements what the code plainly meant,
for parity-plus use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def entity_type_alias_path(features: Column) -> Column:
    """Type as computed in load_aliases (features: map over arrays)."""
    has = lambda k: F.map_contains_key(features, F.lit(k))
    return F.when(has("DOB") | has("GROUP_ASSOCIATION"), "PER").otherwise("ORG")


def entity_type_entities_path() -> Column:
    """Type as computed in generate_entities: constant ORG (see above)."""
    return F.lit("ORG")


def entity_type_intended(features: Column) -> Column:
    """The rule the reference intended (first FEAT_DESC per key):
    RECORD_TYPE PERSON→PER / ORGANIZATION→ORG; DOB|GROUP_ASSOCIATION→PER;
    DUNS_NUMBER|WEBSITE→ORG; else MISC."""
    first = lambda k: F.element_at(F.element_at(features, F.lit(k)), 1)["FEAT_DESC"]
    has = lambda k: F.map_contains_key(features, F.lit(k))
    return (
        F.when(has("RECORD_TYPE") & (first("RECORD_TYPE") == "PERSON"), "PER")
        .when(has("RECORD_TYPE") & (first("RECORD_TYPE") == "ORGANIZATION"), "ORG")
        .when(has("DOB") | has("GROUP_ASSOCIATION"), "PER")
        .when(has("DUNS_NUMBER") | has("WEBSITE"), "ORG")
        .otherwise("MISC")
    )
