"""release_foreign_storage: the harness-side "unpersist when done" hook
(round 11). The bench and the oracle gate run hundreds of builders in one
session; in-query persist()/localCheckpoint() storage can never be freed
by the builder, so the harness releases everything no live fragment owns
between queries. These tests pin the ownership contract: foreign storage
goes, fragment storage stays, and released frames still compute correctly.
"""

from quackio_jl_spark import fragcache


def _persistent_ids(spark):
    ids = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def test_release_frees_foreign_persist_and_checkpoint(spark):
    fragcache.clear()
    fragcache.release_foreign_storage(spark)
    base = _persistent_ids(spark)

    orphan = spark.range(1000).selectExpr("id", "id * 2 AS v").persist()
    assert orphan.count() == 1000
    ckpt = spark.range(500).localCheckpoint(eager=True)
    assert ckpt.count() == 500
    assert len(_persistent_ids(spark) - base) >= 2

    released = fragcache.release_foreign_storage(spark)
    assert released >= 2
    assert _persistent_ids(spark) <= base
    # released frames still compute (recompute from lineage, no cache)
    assert orphan.count() == 1000
    orphan.unpersist()


def test_release_keeps_fragment_storage(spark):
    fragcache.clear()
    frag = fragcache.fragment(
        spark,
        "/tmp/release-test",
        "release_probe",
        lambda: spark.range(100).selectExpr("id", "id % 7 AS m"),
    )
    assert frag.count() == 100  # materialize the fragment's buffers
    fragcache.release_foreign_storage(spark)
    # the fragment's column-buffer RDD survived the sweep
    owned = fragcache._buffer_rdd_ids(frag)
    assert owned, "fragment must be registered in the SQL cache"
    assert owned <= _persistent_ids(spark)
    # and a second sweep is a no-op for it
    fragcache.release_foreign_storage(spark)
    assert owned <= _persistent_ids(spark)
    assert frag.count() == 100
    fragcache.clear()


def test_buffer_ids_resolves_on_materialized_fragment(spark):
    """_buffer_rdd_ids must see a persisted-but-unmaterialized fragment
    too: CachedRDDBuilder registers the buffer RDD at lookup time, so the
    sweep can never mistake a lazily-built fragment for foreign storage."""
    fragcache.clear()
    frag = fragcache.fragment(
        spark,
        "/tmp/release-test",
        "lazy_probe",
        lambda: spark.range(10),
    )
    owned = fragcache._buffer_rdd_ids(frag)  # before any action
    assert owned
    fragcache.release_foreign_storage(spark)
    assert frag.count() == 10
    assert owned <= _persistent_ids(spark)
    fragcache.clear()
