"""ReplayConfig construction invariants (plans/replay.py) — driver-side
only, no Spark session."""

from __future__ import annotations

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig


def test_check_constraints_auto_enable_validate():
    """Declared CHECK constraints must never silently not run: a
    programmatic caller setting only check_constraints gets validate
    flipped on (ADVICE r04 — the CLI already guarded this, the dataclass
    didn't)."""
    cfg = ReplayConfig(check_constraints={"pos": "ordinal >= 0"})
    assert cfg.validate is True


def test_validate_stays_off_without_constraints():
    assert ReplayConfig().validate is False
    assert ReplayConfig(check_constraints={}).validate is False
