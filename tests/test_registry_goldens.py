"""Golden-table bookkeeping invariants (ADVICE r3: registry.py used
to infer golden producers by substring-matching ``/{name}.parquet``
inside oracle SQL — a self-pinned query spelled any other way silently
dropped out of regeneration). Now: exact-golden_oracle shapes auto-pin,
every other spelling declares its producer via golden_table(), and this
test closes the loop — any oracle-referenced golden without a
registered producer fails here."""

from __future__ import annotations

import os

from amante_s_supabase_full_cloud_etl_pipeline_spark import registry
from amante_s_supabase_full_cloud_etl_pipeline_spark.registry import (
    GOLDEN_DIR,
    golden_oracle,
)

registry.load_all_queries()


def test_every_referenced_golden_has_a_producer():
    refs = registry.referenced_goldens()
    assert refs, "expected at least one golden-referencing oracle"
    missing = refs - set(registry.GOLDEN_TABLES)
    assert not missing, (
        f"oracles reference golden tables with no registered producer "
        f"(generate.py would stop regenerating them): {sorted(missing)}"
    )


def test_every_registered_golden_is_committed():
    for name in registry.GOLDEN_TABLES:
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        assert os.path.exists(path), f"golden {name} not committed at {path}"


def test_self_pinned_queries_auto_register():
    """The exact golden_oracle(name) shape must auto-pin its producer."""
    for name, sql in registry.ORACLES.items():
        if sql == golden_oracle(name):
            assert name in registry.GOLDEN_TABLES, name


def test_unreferenced_producers_are_leg_goldens_of_golden_sf_rows():
    """Every GOLDEN_TABLES entry is either referenced by some oracle or
    would be an orphan parquet regenerated for nothing."""
    refs = registry.referenced_goldens()
    orphans = set(registry.GOLDEN_TABLES) - refs
    assert not orphans, f"golden producers no oracle reads: {sorted(orphans)}"
