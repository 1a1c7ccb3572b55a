"""Unit tests for the switchable lineage-truncation helpers
(quackio_jl_spark/lineage.py) — the audit-transparency machinery from
round-7 VERDICT #2."""

from __future__ import annotations

from quackio_jl_spark import lineage


def test_audit_rounds_caps_only_in_audit_mode(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_AUDIT_NO_CHECKPOINT", raising=False)
    assert lineage.audit_rounds(10) == 10
    monkeypatch.setenv("SPARK_GRAFT_AUDIT_NO_CHECKPOINT", "1")
    assert lineage.audit_rounds(10) == 2
    assert lineage.audit_rounds(1) == 1  # never raises a count
    assert lineage.audit_rounds(10, floor=3) == 3


def test_truncate_is_identity_under_audit_flag(spark, monkeypatch):
    df = spark.range(5)
    monkeypatch.setenv("SPARK_GRAFT_AUDIT_NO_CHECKPOINT", "1")
    assert lineage.truncate(df) is df
    monkeypatch.delenv("SPARK_GRAFT_AUDIT_NO_CHECKPOINT", raising=False)
    out = lineage.truncate(df)
    assert out is not df and out.count() == 5


def test_truncate_boundary_materializes_even_in_audit_mode(spark, monkeypatch):
    """Chain boundaries must materialize under the flag too — identity
    here is what hung Catalyst analysis on part_spectral_4way."""
    monkeypatch.setenv("SPARK_GRAFT_AUDIT_NO_CHECKPOINT", "1")
    df = spark.range(7)
    out = lineage.truncate_boundary(df)
    assert out is not df and out.count() == 7


def test_fragment_cache_reuses_and_clears(spark):
    """fragcache returns the same persisted frame per (session, dataset,
    name) and rebuilds after clear()."""
    from quackio_jl_spark import fragcache

    calls = []

    def build():
        calls.append(1)
        return spark.range(3)

    a = fragcache.fragment(spark, "/tmp/ds", "t", build)
    b = fragcache.fragment(spark, "/tmp/ds", "t", build)
    assert a is b and len(calls) == 1
    c = fragcache.fragment(spark, "/tmp/other", "t", build)
    assert c is not a and len(calls) == 2
    fragcache.clear()
    d = fragcache.fragment(spark, "/tmp/ds", "t", build)
    assert d is not a and len(calls) == 3
    fragcache.clear()
