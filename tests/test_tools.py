"""Consistency checks for the repo-level tools: their query lists and
protocols must track the live contract, or their evidence goes stale
silently."""

import importlib.util
import os

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    path = os.path.join(REPO, "tools", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scale_check_subset_is_live_queries():
    """Every query the scale-growth tool times must exist in the
    contract — a rename would otherwise crash the tool mid-run after
    the expensive build phase."""
    sc = _load("scale_check")
    live = set(entry_mod.queries())
    missing = [q for q in sc.QUERY_SUBSET if q not in live]
    assert not missing, f"scale_check names dead queries: {missing}"


def test_scale_check_key_strides_cover_fact_tables():
    """The blow-up must shift every fact table's keys (dimensions stay
    single-copy); a new fact table added to the harness without a
    stride entry would silently produce key collisions."""
    sc = _load("scale_check")
    assert set(sc.KEY_SHIFTS) == {
        "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    }
