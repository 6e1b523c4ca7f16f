"""Certification-ledger guard (VERDICT r4 #3): a registry query whose
code (transitive function sources + constants + oracle SQL) drifted
since its last driver certification must sit inside the driver's
certified prefix — the first BUDGET entries of queries() — so the next
CORRECTNESS artifact re-certifies it instead of a stale r1 certificate
silently covering regressed code.

The ledger was bootstrapped at r5 HEAD (historical hashes are
unrecoverable); each round starts with `python tools/cert_ledger.py
sync r0N` BEFORE code changes so recorded hashes match the certified
HEAD.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import cert_ledger  # noqa: E402


def test_ledger_exists_and_covers_registry():
    import __spark_entry__ as entrymod

    ledger = cert_ledger.load_ledger()
    assert ledger, "tools/cert_ledger.json missing — run cert_ledger.py init"
    reg = set(entrymod.queries().keys())
    # every registry query has a ledger row (new queries are added by
    # init/sync; a missing row is treated as drifted by the guard below,
    # but the ledger file should still be regenerated when queries land)
    missing = reg - set(ledger)
    assert not missing, f"ledger missing rows for {sorted(missing)}"


def test_drifted_queries_sit_in_certified_prefix():
    violations, covered = cert_ledger.drifted()
    assert not violations, (
        "queries drifted since their last certification but sit OUTSIDE "
        f"the driver's certified prefix (first {cert_ledger.BUDGET} "
        f"registry entries): {violations}. Move them into the front "
        "block of __spark_entry__.queries() or re-run cert_ledger sync.")


def test_never_certified_queries_sit_in_certified_prefix():
    """Judge-only or never-certified queries must be queued for driver
    certification (VERDICT r4 #1)."""
    import __spark_entry__ as entrymod

    ledger = cert_ledger.load_ledger()
    reg = list(entrymod.queries().keys())
    front = set(reg[:cert_ledger.BUDGET])
    stale = [n for n in reg
             if (rec := ledger.get(n)) is not None
             and (rec.get("round") is None
                  or str(rec.get("round", "")).endswith("-judge"))
             and n not in front]
    assert not stale, (
        f"never-driver-certified queries outside the prefix: {stale}")
