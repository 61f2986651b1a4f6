"""The JVM pow(x,2)==x*x identity guard behind the seqfold Arrow
kernels (ann._assert_pow_square_identity)."""

from __future__ import annotations

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann


def test_pow_square_identity_holds_and_caches(spark):
    ann._assert_pow_square_identity(spark)  # must not raise on this JVM
    key = id(spark.sparkContext)
    assert ann._SEQFOLD_GUARD_OK.get(key) is True
    # cached second call is job-free: drop the flag guard would need
    ann._assert_pow_square_identity(spark)


def test_pow_square_guard_conf_off(spark):
    try:
        spark.conf.set("spark.spark_graft.seqfold_guard", "off")
        saved = dict(ann._SEQFOLD_GUARD_OK)
        ann._SEQFOLD_GUARD_OK.clear()
        ann._assert_pow_square_identity(spark)  # skipped: no memo entry
        assert not ann._SEQFOLD_GUARD_OK
        ann._SEQFOLD_GUARD_OK.update(saved)
    finally:
        spark.conf.unset("spark.spark_graft.seqfold_guard")
