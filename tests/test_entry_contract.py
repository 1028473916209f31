"""Registry hygiene for the driver contract (``__spark_entry__``):

- the driver's correctness gate evaluates only the FIRST 50 ``queries()``
  entries, so the registry must never exceed 50 — round 4 silently lost
  driver rows for 5 operators when it grew to 55;
- every oracle key must point at a registry entry (no orphan SQL);
- the committed ``CORRECTNESS_SELFCHECK.json`` (written by
  ``scripts/check_oracle.py`` each round) must cover every registry key
  with a passing status, so a future driver cap or ordering change can
  never silently drop oracle coverage again.
"""

import json
import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50

# rows-only BY DESIGN (documented in oracle_sql()'s comments): binary
# probing / Python-orchestrated ops that ANSI SQL cannot express.
NO_ORACLE_OK = {"media_features", "llm_extract_blocks"}


def test_registry_within_driver_cap():
    assert len(entrymod.queries()) <= DRIVER_CAP


def test_every_oracle_key_is_a_registry_key():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"orphan oracle keys: {sorted(o - q)}"
    assert q - o == NO_ORACLE_OK, (
        f"queries without an oracle beyond the declared set: {sorted(q - o - NO_ORACLE_OK)}"
    )


def test_selfcheck_artifact_covers_registry():
    path = os.path.join(REPO, "CORRECTNESS_SELFCHECK.json")
    assert os.path.exists(path), (
        "run `python scripts/check_oracle.py` to regenerate the self-check artifact"
    )
    with open(path) as fh:
        selfcheck = json.load(fh)["results"]
    q = set(entrymod.queries())
    missing = q - set(selfcheck)
    assert not missing, f"registry keys absent from CORRECTNESS_SELFCHECK.json: {sorted(missing)}"
    bad = {k: v for k, v in selfcheck.items() if k in q and v["status"] not in ("match", "rows_only")}
    assert not bad, f"non-passing self-check rows: {bad}"
    weak = {k for k, v in selfcheck.items() if k in q and v["status"] == "rows_only"}
    assert weak <= NO_ORACLE_OK, f"undeclared rows-only queries: {sorted(weak - NO_ORACLE_OK)}"
