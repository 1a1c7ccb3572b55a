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


def test_fragment_cache_key_is_stable_and_stopped_contexts_evict(spark):
    """The cache key must be (applicationId, startTime, sf_dir, name) —
    stable identifiers a recycled id() can never collide with — and
    entries owned by a stopped context must be evicted on the next call
    (would have caught the id()-reuse hazard: a dead context's address
    reused by a fresh one served the dead session's persisted frames)."""
    from quackio_jl_spark import fragcache

    fragcache.clear()
    fragcache.fragment(spark, "/tmp/ds", "t", lambda: spark.range(3))
    sc = spark.sparkContext
    assert (sc.applicationId, sc.startTime, "/tmp/ds", "t") in fragcache._CACHE

    class _DeadContext:
        _jsc = None

    dead_key = ("app-dead", 0, "/tmp/ds", "t")
    fragcache._CACHE[dead_key] = (_DeadContext(), spark.range(1))
    fragcache.fragment(spark, "/tmp/ds", "t2", lambda: spark.range(2))
    assert dead_key not in fragcache._CACHE
    fragcache.clear()


def test_fragment_cache_bounds_distinct_sf_dirs(spark, monkeypatch):
    """Round-9 VERDICT "next" #7: a long-lived multi-dataset service must
    not accumulate persisted fragments without limit — only the
    MAX_SF_DIRS most-recently-used sf_dirs keep entries; older datasets'
    fragments are unpersisted and evicted, and re-touching an sf_dir
    refreshes its recency."""
    from quackio_jl_spark import fragcache

    fragcache.clear()
    monkeypatch.setattr(fragcache, "MAX_SF_DIRS", 2)
    a = fragcache.fragment(spark, "/tmp/ds_a", "t", lambda: spark.range(1))
    fragcache.fragment(spark, "/tmp/ds_b", "t", lambda: spark.range(2))
    # touch a again: it becomes most-recent, so adding c must evict b
    assert fragcache.fragment(spark, "/tmp/ds_a", "t", lambda: 0) is a
    fragcache.fragment(spark, "/tmp/ds_c", "t", lambda: spark.range(3))
    dirs = {k[2] for k in fragcache._CACHE}
    assert dirs == {"/tmp/ds_a", "/tmp/ds_c"}
    assert a.is_cached  # survivor keeps its persisted storage
    # the evicted dataset rebuilds (fresh frame, not the stale one)
    calls = []

    def build_b():
        calls.append(1)
        return spark.range(2)

    fragcache.fragment(spark, "/tmp/ds_b", "t", build_b)
    assert calls == [1]
    fragcache.clear()


def test_fragment_cache_bypassed_in_audit_mode(spark, monkeypatch):
    """Under the audit flag the cache is neither read nor written: a
    capped-round audit build must not poison later non-audit consumers,
    and the audit must grade the real build plan, not a cached
    InMemoryRelation."""
    from quackio_jl_spark import fragcache

    fragcache.clear()
    calls = []

    def build():
        calls.append(1)
        return spark.range(3)

    primed = fragcache.fragment(spark, "/tmp/ds", "t", build)
    assert len(calls) == 1
    monkeypatch.setenv("SPARK_GRAFT_AUDIT_NO_CHECKPOINT", "1")
    audit1 = fragcache.fragment(spark, "/tmp/ds", "t", build)
    audit2 = fragcache.fragment(spark, "/tmp/ds", "t", build)
    assert audit1 is not primed and audit2 is not audit1
    assert len(calls) == 3  # fresh build each audit call, cache untouched
    monkeypatch.delenv("SPARK_GRAFT_AUDIT_NO_CHECKPOINT")
    assert fragcache.fragment(spark, "/tmp/ds", "t", build) is primed
    assert len(calls) == 3
    fragcache.clear()


def test_fragment_cache_thread_safe_single_build(spark):
    """Round-10 VERDICT "what's wrong" #3: two driver threads issuing
    the same first query concurrently (a normal notebook pattern) must
    produce exactly ONE build — the unlocked cache used to double-build
    and orphan one persisted frame."""
    import threading
    import time

    from quackio_jl_spark import fragcache

    fragcache.clear()
    calls = []
    results = []
    barrier = threading.Barrier(4)

    def build():
        calls.append(1)
        time.sleep(0.2)  # widen the race window the lock must close
        return spark.range(5)

    def worker():
        barrier.wait()  # all threads hit the cache at the same instant
        results.append(
            fragcache.fragment(spark, "/tmp/race_ds", "frag", build)
        )

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    try:
        assert len(calls) == 1  # exactly one build
        assert all(r is results[0] for r in results)  # same frame served
    finally:
        fragcache.clear()


def test_fragment_cache_reentrant_nested_build(spark):
    """Fragments COMPOSE: lsh_ingest_index's build() consumes the
    corpus-signature fragment, so the same thread re-enters the cache
    mid-build. A non-reentrant lock deadlocks here (measured: hung the
    oracle gate); this pins the reentrancy."""
    from quackio_jl_spark import fragcache

    fragcache.clear()
    calls = []

    def inner():
        calls.append("inner")
        return spark.range(2)

    def outer():
        calls.append("outer")
        base = fragcache.fragment(spark, "/tmp/nest_ds", "inner", inner)
        return base.selectExpr("id * 2 AS id2")

    try:
        out = fragcache.fragment(spark, "/tmp/nest_ds", "outer", outer)
        assert out.count() == 2
        assert calls == ["outer", "inner"]
        # the inner fragment is independently cached
        again = fragcache.fragment(spark, "/tmp/nest_ds", "inner", inner)
        assert calls == ["outer", "inner"] and again.count() == 2
    finally:
        fragcache.clear()
