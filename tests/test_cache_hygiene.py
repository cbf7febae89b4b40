"""Cache-lifecycle contract: operators may persist fan-out subplans
(common.materialize) and ship broadcasts that must outlive their lazy
results (pq_encode), but a session that calls release_caches() after
consuming each result must end with ZERO persisted RDDs — a long
service/pipeline session must not accrete corpus-scale caches.
"""

from __future__ import annotations

import time

from tests.conftest import SF_SMOKE

from python_stream_processing_framework_spark.operators.common import (
    release_caches,
)
from python_stream_processing_framework_spark.queries import QUERY_REGISTRY

#: catalog queries covering every cache-creating path: minhash
#: signature caches (self-join + two-table join + components),
#: inverted-index caches, LSH signature cache, and the pq_encode
#: codebook broadcast.
#: (name, persists_rdds): pq pins a codebook BROADCAST, not an RDD
#: cache, so only the released-count applies to it.
_CACHING_QUERIES = (
    ("dedup_minhash_lsh", True),
    ("corpus_decontaminate", True),
    ("cosine_lsh_pairs", True),
    ("pq_adc_topk", False),
)


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_no_persisted_rdds_after_release(spark):
    spark.catalog.clearCache()
    release_caches()
    for name, persists_rdds in _CACHING_QUERIES:
        QUERY_REGISTRY[name].fn(spark, SF_SMOKE).collect()
        if persists_rdds:
            assert _n_persistent(spark) > 0, f"{name}: expected operator caches"
        released = release_caches()
        assert released > 0, f"{name}: tracker registered nothing"
        # unpersist is synchronous on the persistentRdds map, but give
        # the JVM a short grace window to be robust
        for _ in range(50):
            if _n_persistent(spark) == 0:
                break
            time.sleep(0.1)
        assert _n_persistent(spark) == 0, f"{name}: caches left behind"


def test_cosine_pairs_cache_released(spark):
    # the documented quadratic baseline used to bare-persist and leak
    from python_stream_processing_framework_spark.catalog import load
    from python_stream_processing_framework_spark.operators.similarity import (
        cosine_pairs,
    )

    spark.catalog.clearCache()
    release_caches()
    (embeddings,) = load(spark, SF_SMOKE, "embeddings")
    cosine_pairs(embeddings, threshold=0.9).count()
    assert _n_persistent(spark) > 0
    assert release_caches() > 0
    for _ in range(50):
        if _n_persistent(spark) == 0:
            break
        time.sleep(0.1)
    assert _n_persistent(spark) == 0
