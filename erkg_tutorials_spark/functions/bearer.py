"""F1 — anonymous-"bearer" name blocklist filter.

Semantics of the reference's ``filter_bearer``
(/root/reference/src/senzing_pipeline.py:83-112): lowercase the name,
``re.search`` it against 17 patterns, reject on any hit. The pattern
list below is the same *data* (it defines the operator's semantics);
the execution is one Catalyst ``rlike`` over an alternation, evaluated
JVM-side inside whole-stage codegen — no per-row Python.

Call sites test the *stripped* name (``filter_bearer(name.strip())``,
senzing_pipeline.py:157), which :func:`keep_name` reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BEARER_PATTERNS: tuple[str, ...] = (
    r"^\-?(to\s+)?([the]+\s+)?bearer\.?\s?(\d+)?(\w)?$",
    r"^.*bearer.*shares?$",
    r"^the\s+bearer\s+\([\d\,]+\)$",
    r"^[ae]l\s+portador$",
    r"^the\s?bearer$",
    r"^bearer\s?warrant$",
    r"^bearer\s?shareholder$",
    r"^the\,\s+bearer$",
    r"^bearer\s+\(reedeem\s+shares\)$",
    r"^the\s+bearer\s+\(lost\)$",
    r"^bearer\s+\-\s+[\w]$",
    r"^bearer\s+\"\w\"$",
    r"^bearer\s+[\d\-]+$",
    r"^bearer\s+no\.\s+\d+$",
    r"^the\s+bearer\s+at\s+[\d\,]+$",
    r"^nan$",
    r"^[\?]+$",
)

# One alternation of non-capturing groups: a single regex evaluation per
# row instead of 17.
BEARER_MEGA_PATTERN = "|".join(f"(?:{p})" for p in BEARER_PATTERNS)


def is_bearer(name: Column) -> Column:
    """True when the (already stripped) name matches the blocklist."""
    return F.lower(name).rlike(BEARER_MEGA_PATTERN)


def keep_name(name: Column) -> Column:
    """Reference call-site semantics: strip, lowercase, keep on no match."""
    return ~is_bearer(F.trim(name))
