"""Cuckoo-filter seen-set tier (operators/cuckoo.py): membership contract,
determinism, deletion (the recrawl primitive), and drop-in equality with the
bloom tier inside the two-tier unseen check."""

import numpy as np
import pandas as pd
import pytest

from cs3103_gocrawler_spark.functions.urlfuncs import sha1_64
from cs3103_gocrawler_spark.operators.cuckoo import CuckooFilter
from cs3103_gocrawler_spark.operators.seen import Bloom, filter_unseen


def _keys(n, seed=7):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(-2**62, 2**62, n * 2, dtype=np.int64))[:n]


def test_no_false_negatives_and_low_fpr():
    keys = _keys(50_000)
    cf = CuckooFilter(capacity=80_000)
    cf.add(keys)
    assert cf.might_contain(keys).all()
    non = np.setdiff1d(_keys(80_000, seed=11), keys)
    assert cf.might_contain(non).mean() < 0.005  # 16-bit fp: ~1.2e-4 expected


def test_deterministic_table():
    keys = _keys(30_000)
    a, b = CuckooFilter(capacity=50_000), CuckooFilter(capacity=50_000)
    a.add(keys)
    b.add(keys)
    assert np.array_equal(a.table, b.table)


def test_no_false_negatives_at_high_load():
    cf = CuckooFilter(capacity=30_000)
    keys = _keys(int(cf.m * cf.b * 0.93), seed=3)
    cf.add(keys)
    assert cf.might_contain(keys).all()


def test_overflow_raises():
    cf = CuckooFilter(capacity=1_000)
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.add(_keys(cf.m * cf.b + 500, seed=5))


def test_overflow_poisons_instance():
    """ADVICE r4: after an eviction-chain overflow a resident fingerprint is
    lost, so a caller that catches the error and keeps probing could get
    silent false negatives — every subsequent call must raise instead."""
    cf = CuckooFilter(capacity=1_000)
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.add(_keys(cf.m * cf.b + 500, seed=5))
    assert cf.poisoned
    probe = _keys(10, seed=6)
    with pytest.raises(RuntimeError, match="poisoned"):
        cf.might_contain(probe)
    with pytest.raises(RuntimeError, match="poisoned"):
        cf.add(probe)
    with pytest.raises(RuntimeError, match="poisoned"):
        cf.remove(probe)


def test_remove_then_reinsert_roundtrip():
    """Deletion — what the bloom tiers cannot do: evicted keys drop out of
    the membership set and re-enter cleanly (the recrawl primitive)."""
    keys = _keys(20_000)
    cf = CuckooFilter(capacity=40_000)
    cf.add(keys)
    evict, keep = keys[:4_000], keys[4_000:]
    assert cf.remove(evict).all()
    assert cf.might_contain(keep).all()          # no collateral false negatives
    assert cf.might_contain(evict).mean() < 0.005  # only fp-collision residue
    cf.add(evict)
    assert cf.might_contain(evict).all()


def test_empty_filter_contains_nothing():
    cf = CuckooFilter(capacity=100)
    assert not cf.might_contain(_keys(50)).any()


def _candidate_frames(spark, n_seen=300, n_new=200):
    urls = [f"http://h{i % 17}.test/p/{i}" for i in range(n_seen + n_new)]
    cand = pd.DataFrame({"url": urls})
    cand["url_sha1"] = [sha1_64(u) for u in urls]
    seen = pd.DataFrame({"url": urls[:n_seen]})
    return spark.createDataFrame(cand), spark.createDataFrame(seen), urls


def test_filter_unseen_cuckoo_equals_bloom_equals_exact(spark):
    """The two-tier check is pre-filter-agnostic: cuckoo tier ≡ bloom tier ≡
    plain exact anti-join (J1's invariant — tier 1 only prunes, never
    decides)."""
    cand, seen, urls = _candidate_frames(spark)
    seen_hashes = np.array([sha1_64(u) for u in urls[:300]], dtype=np.int64)

    bloom = Bloom(capacity=10_000, n_segments=4)
    bloom.add(seen_hashes)
    cf = CuckooFilter(capacity=10_000)
    cf.add(seen_hashes)

    exact, _ = filter_unseen(spark, cand, seen, None)
    via_bloom, _ = filter_unseen(spark, cand, seen, bloom)
    via_cuckoo, fp_rows = filter_unseen(spark, cand, seen, cf)

    want = sorted(r["url"] for r in exact.collect())
    assert sorted(r["url"] for r in via_bloom.collect()) == want
    assert sorted(r["url"] for r in via_cuckoo.collect()) == want
    assert want == sorted(urls[300:])
    assert fp_rows.count() <= 2  # 16-bit fingerprints: ~0 false positives


def test_filter_unseen_cuckoo_after_eviction_readmits(spark):
    """End-to-end recrawl shape: evicting a fetched URL from the cuckoo
    tier AND the exact seen table lets it re-enter the frontier."""
    cand, seen, urls = _candidate_frames(spark, n_seen=100, n_new=50)
    seen_hashes = np.array([sha1_64(u) for u in urls[:100]], dtype=np.int64)
    cf = CuckooFilter(capacity=5_000)
    cf.add(seen_hashes)

    recrawl = urls[:10]
    cf.remove(np.array([sha1_64(u) for u in recrawl], dtype=np.int64))
    seen_after = spark.createDataFrame(pd.DataFrame({"url": urls[10:100]}))

    unseen, _ = filter_unseen(spark, cand, seen_after, cf)
    got = sorted(r["url"] for r in unseen.collect())
    assert got == sorted(recrawl + urls[100:])
