"""Cuckoo-filter seen-set tier (J1's deletable pre-filter; SURVEY.md §2.3).

The north-rule names a "bloom/cuckoo URL-seen" set: the bloom tiers
(operators/seen.py) are the append-only paths; this is the third tier — a
cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public) whose distinguishing capability is DELETION: a crawl
that schedules recrawls can evict a URL's fingerprint and have it flow
through the standard two-tier unseen check again, which no bloom can do
without a full rebuild. Reference parity: the semantics being approximated
is still the exact membership map `c.VisitedPageInfo[link]`
(crawler.go:74-79, 97-102) — any pre-filter tier only prunes; the exact
anti-join decides.

Standard construction: ``bucket_size`` slots per bucket, ``fp_bits``-bit
fingerprints, partial-key cuckoo hashing — a key's two candidate buckets are
``i1 = h(x) mod m`` and ``i2 = i1 XOR h(fp) mod m`` (an involution, so the
alternate of EITHER bucket is computable from the resident fingerprint
alone, which is what makes eviction chains work without the original key).

Determinism (§4.2.4 discipline): the reference implementation kicks a RANDOM
resident on insert collision; this one kicks slot ``kicks % bucket_size`` —
two builds over the same insert order produce bit-identical tables, so the
filter participates in the engine's identical-output-at-any-parallelism
guarantee (driver-side build, like the broadcast bloom tier).

Scale posture: lookups vectorize over numpy (the broadcast-probe hot path);
inserts take a vectorized empty-slot fast path and fall back to the
per-item eviction walk only for the residue that actually collides. Like
the broadcast bloom, this tier ships the whole table per probing round —
right up to ~10^8-URL crawls with deletion needs; past that the partitioned
bloom remains the scale path (deletion then belongs to the exact visited
table, which is authoritative anyway).
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche (public domain finalizer)."""
    h = h.astype(np.uint64)
    h ^= h >> np.uint64(33)
    h *= _MIX1
    h ^= h >> np.uint64(33)
    h *= _MIX2
    h ^= h >> np.uint64(33)
    return h


class CuckooFilter:
    """Deletable approximate-membership filter over int64 url_sha1 keys.

    No false negatives for resident keys; FPR ≈ 2·bucket_size / 2^fp_bits
    (~0.012% at the 16-bit default). ``might_contain``/``n_added`` match the
    ``Bloom`` probe protocol, so ``seen.filter_unseen`` accepts either
    filter unchanged (duck-typed broadcast tier).
    """

    MAX_KICKS = 500

    def __init__(self, capacity: int, fp_bits: int = 16, bucket_size: int = 4):
        if not 1 <= fp_bits <= 16:
            raise ValueError("fp_bits must be in 1..16 (uint16 table)")
        self.b = int(bucket_size)
        self.fp_mask = np.uint64((1 << fp_bits) - 1)
        # power-of-two buckets so i2 = i1 ^ h(fp) stays in range, sized for
        # ~95% max load
        m = 1
        while m * self.b * 0.95 < capacity:
            m <<= 1
        self.m = m
        self.table = np.zeros((m, self.b), dtype=np.uint16)
        self.n_added = 0
        # set when an eviction chain overflows: the displaced resident is
        # lost, so the no-false-negative contract no longer holds — every
        # subsequent probe/mutation raises instead of silently lying
        # (ADVICE r4: a caller that caught the overflow and kept probing
        # used to get silent false negatives)
        self.poisoned = False

    # -- key → (fingerprint, bucket1, bucket2), all vectorized ------------

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = _mix(h) & self.fp_mask
        return np.where(fp == 0, np.uint64(1), fp)  # 0 is the empty sentinel

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (_mix(h ^ _MIX2) % np.uint64(self.m)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (
            (i.astype(np.uint64) ^ _mix(fp.astype(np.uint64)))
            % np.uint64(self.m)
        ).astype(np.int64)

    def add(self, hashes: np.ndarray) -> None:
        """Insert; raises when an eviction chain exceeds MAX_KICKS (table
        effectively full). The raise is fatal for the instance: the failed
        chain's displaced resident is in-hand, not in the table, so a
        previously-added key could turn false-negative — the instance is
        POISONED (every later call raises); size ``capacity`` for the
        crawl's URL budget instead of catching this."""
        self._check_poisoned()
        h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        # vectorized fast path: batch-claim empty slots in each key's
        # PRIMARY bucket (the vast majority below ~80% load); the residue —
        # keys whose primary bucket is full — falls to the per-item
        # try-both-buckets / eviction-walk path. Everything is processed in
        # batch order, so the final table is deterministic.
        placed = self._claim_primary(i1, fp)
        for j in np.nonzero(~placed)[0]:
            if not self._try_place(int(i1[j]), int(i2[j]), np.uint16(fp[j])):
                self._insert_with_kicks(int(i1[j]), np.uint16(fp[j]))
        self.n_added += len(h)

    def _claim_primary(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized: the k-th key hashing to a bucket (in batch order)
        claims that bucket's k-th empty slot, if one exists. Returns the
        placed mask. Unique (bucket, slot) targets by construction — the
        scatter write never collides."""
        if len(i1) == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(i1, kind="stable")
        sorted_i1 = i1[order]
        first = np.ones(len(i1), dtype=bool)
        first[1:] = sorted_i1[1:] != sorted_i1[:-1]
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(i1)), 0))
        cumcount = np.arange(len(i1)) - group_start  # k within bucket group
        bucket_rows = self.table[sorted_i1]
        empty_mask = bucket_rows == 0
        n_empty = empty_mask.sum(axis=1)
        # slots ordered empty-first (stable) → the k-th empty slot's index
        slot_order = np.argsort(~empty_mask, axis=1, kind="stable")
        can_place = cumcount < n_empty
        rows = sorted_i1[can_place]
        slots = slot_order[can_place, cumcount[can_place]]
        self.table[rows, slots] = fp[order][can_place].astype(np.uint16)
        placed = np.zeros(len(i1), dtype=bool)
        placed[order[can_place]] = True
        return placed

    def _try_place(self, i1: int, i2: int, fp: np.uint16) -> bool:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False

    def _check_poisoned(self) -> None:
        # getattr, not attribute access: unpickling (broadcast to executors,
        # checkpoint reload) restores __dict__ without __init__, so a table
        # serialized by an older build must probe as healthy, not crash
        if getattr(self, "poisoned", False):
            raise RuntimeError(
                "cuckoo filter is poisoned: a previous insert overflowed its "
                "eviction chain and lost a resident fingerprint, so probes "
                "could return false negatives — rebuild with a larger "
                "capacity"
            )

    def _insert_with_kicks(self, i: int, fp: np.uint16) -> None:
        for kicks in range(self.MAX_KICKS):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
            slot = kicks % self.b  # deterministic victim (see module doc)
            fp, row[slot] = row[slot], fp
            i = int(self._alt(np.array([i]), np.array([fp], dtype=np.uint64))[0])
        self.poisoned = True
        raise RuntimeError(
            f"cuckoo filter over capacity (load {self.n_added}/{self.m * self.b}); "
            "size `capacity` for the crawl's URL budget"
        )

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        self._check_poisoned()
        h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        if self.n_added == 0:
            return np.zeros(len(h), dtype=bool)
        fp = self._fp(h).astype(np.uint16)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def remove(self, hashes: np.ndarray) -> np.ndarray:
        """Evict one resident fingerprint per key (the recrawl primitive).
        Returns which keys were present. Only ever call with keys that were
        added: deleting a never-added key can strip a colliding resident —
        the standard cuckoo-filter contract."""
        self._check_poisoned()
        h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        fp = self._fp(h).astype(np.uint16)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        removed = np.zeros(len(h), dtype=bool)
        for j in range(len(h)):
            for i in (int(i1[j]), int(i2[j])):
                row = self.table[i]
                hit = np.nonzero(row == fp[j])[0]
                if len(hit):
                    row[hit[0]] = 0
                    removed[j] = True
                    self.n_added -= 1
                    break
        return removed
