"""Bucketized two-choice cuckoo k-mer table: HBM-resident, gather-probed.

TPU-native replacement for the khash classify DB
(/root/reference/klib khash via include/bonsai/util.h:159-163).  khash's
scalar quadratic probing has unbounded, data-dependent probe chains — poison
for a vectorized probe that must execute its worst case for every lane.
Instead, every key lives in one of two candidate buckets of SLOTS=8
contiguous u64 slots (one 64-byte row each), so a probe is *exactly two*
row gathers + vectorized lane compares, regardless of load:

    bucket1 = high bits of splitmix64(key)
    bucket2 = high bits of splitmix64(key ^ SALT)

Build is host-side numpy: greedy two-round placement handles ~99% of keys
at load 0.65; the rest place by vectorized random-walk cuckoo eviction
rounds (conflicts resolved by first-claimant-wins, evictees re-enter the
pool with their alternate bucket).  Fails over to a bigger table if a build
doesn't converge.  Deterministic: all "randomness" is hashed off key bits.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core import hashes

SLOTS = 8
SALT = np.uint64(0xA24BAED4963EE407)
DEFAULT_LOAD = 0.65


def _next_pow2(x: int) -> int:
    return 1 << max(int(x - 1).bit_length(), 0)


class KmerTable:
    """keys (nb, SLOTS) u64, vals (nb, SLOTS) u32/u64, counts (nb,) u8.

    ``keys_sorted`` / ``vals_sorted`` are the canonical content (sorted by
    key); the bucket layout is a derived probe structure."""

    def __init__(self, keys_sorted: np.ndarray, vals_sorted: np.ndarray,
                 load_factor: float = DEFAULT_LOAD):
        keys_sorted = np.asarray(keys_sorted, dtype=np.uint64)
        vals_sorted = np.asarray(vals_sorted)
        if keys_sorted.ndim != 1 or keys_sorted.shape != vals_sorted.shape:
            raise ValueError("keys/vals must be matching 1-D arrays")
        if keys_sorted.size > 1 and not np.all(keys_sorted[1:] > keys_sorted[:-1]):
            raise ValueError("keys must be sorted and unique")
        self.keys_sorted = keys_sorted
        self.vals_sorted = vals_sorted
        self.n = int(keys_sorted.size)
        nb = _next_pow2(max(int(np.ceil(self.n / (SLOTS * load_factor))), 1))
        while not self._try_build(nb):
            nb <<= 1
        self._jax_cache = None

    # -- bucket candidates -------------------------------------------------
    @staticmethod
    def _buckets_of(keys, shift: int, xp=np):
        h1 = hashes.splitmix64(keys)
        h2 = hashes.splitmix64(keys ^ SALT if xp is np else keys ^ xp.uint64(SALT))
        if shift >= 64:
            z = (keys * xp.uint64(0)).astype(xp.int64)
            return z, z
        b1 = (h1 >> xp.uint64(shift)).astype(xp.int64)
        b2 = (h2 >> xp.uint64(shift)).astype(xp.int64)
        return b1, b2

    # -- build --------------------------------------------------------------
    def _try_build(self, nb: int, max_rounds: int = 500) -> bool:
        n = self.n
        self.nb = nb
        self.shift = 64 - int(np.log2(nb)) if nb > 1 else 64
        keys, vals = self.keys_sorted, self.vals_sorted
        owner = np.full(nb * SLOTS, -1, dtype=np.int64)  # sorted-key index
        if n == 0:
            self._finalize(owner)
            return True
        b1, b2 = self._buckets_of(keys, self.shift)

        counts = np.zeros(nb, dtype=np.int64)
        homeless = np.arange(n)

        def greedy(idx, b):
            """Place idx into buckets b where space remains; return losers."""
            nonlocal counts
            if idx.size == 0:
                return idx
            srt = np.argsort(b[idx], kind="stable")
            si = idx[srt]
            sb = b[si]
            run_start = np.searchsorted(sb, sb, side="left")
            rank = np.arange(sb.size) - run_start
            free = SLOTS - counts[sb]
            win = rank < free
            wi = si[win]
            lane = counts[sb[win]] + rank[win]
            owner[sb[win] * SLOTS + lane] = wi
            counts = counts + np.bincount(sb[win], minlength=nb)
            return si[~win]

        homeless = greedy(homeless, b1)
        homeless = greedy(homeless, b2)

        # vectorized random-walk eviction
        for rnd in range(max_rounds):
            if homeless.size == 0:
                break
            k = keys[homeless]
            r = hashes.splitmix64(k + np.uint64(0x9E37 + rnd))
            use_b2 = (r & np.uint64(1)).astype(bool)
            tb = np.where(use_b2, b2[homeless], b1[homeless])
            lane = ((r >> np.uint64(1)) % np.uint64(SLOTS)).astype(np.int64)
            slot = tb * SLOTS + lane
            # first claimant per slot wins
            uniq, first = np.unique(slot, return_index=True)
            winners = homeless[first]
            evicted = owner[uniq]
            owner[uniq] = winners
            keep = np.ones(homeless.size, dtype=bool)
            keep[first] = False
            homeless = np.concatenate([homeless[keep], evicted[evicted >= 0]])
        if homeless.size:
            return False
        self._finalize(owner)
        return True

    def _finalize(self, owner: np.ndarray):
        nb = self.nb
        keys, vals = self.keys_sorted, self.vals_sorted
        occ = owner >= 0
        tk = np.zeros(nb * SLOTS, dtype=np.uint64)
        tv = np.zeros(nb * SLOTS, dtype=vals.dtype if self.n else np.uint32)
        if self.n:
            tk[occ] = keys[owner[occ]]
            tv[occ] = vals[owner[occ]]
        self.table_keys = tk.reshape(nb, SLOTS)
        self.table_vals = tv.reshape(nb, SLOTS)
        self.table_occ = occ.reshape(nb, SLOTS)
        # counts: occupied-lane bitmask folded to u8 (lane i occupied bit)
        lanebits = (occ.reshape(nb, SLOTS) << np.arange(SLOTS)).sum(-1)
        self.table_occbits = lanebits.astype(np.uint8)
        slot_of = np.full(self.n, -1, dtype=np.int64)
        if self.n:
            slot_of[owner[occ]] = np.nonzero(occ)[0]
        self.slot_of = slot_of
        self.max_scan = 2  # by construction

    # -- host probe (numpy) ----------------------------------------------
    def probe_np(self, queries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.uint64)
        b1, b2 = self._buckets_of(q, self.shift)
        lane = np.arange(SLOTS)
        found = np.zeros(q.shape, dtype=bool)
        val = np.zeros(q.shape, dtype=self.vals_sorted.dtype)
        for b in (b1, b2):
            occ = (self.table_occbits[b][..., None] >> lane) & 1
            eq = (self.table_keys[b] == q[..., None]) & (occ > 0)
            hit = eq.any(-1)
            v = (self.table_vals[b] * eq).sum(-1).astype(val.dtype)
            val = np.where(hit & ~found, v, val)
            found |= hit
        return val, found

    # -- device probe (jnp; exactly two row gathers) -----------------------
    def device_arrays(self):
        if self._jax_cache is None:
            import jax.numpy as jnp

            self._jax_cache = dict(
                keys=jnp.asarray(self.table_keys),
                vals=jnp.asarray(self.table_vals),
                occbits=jnp.asarray(self.table_occbits),
            )
        return self._jax_cache

    def probe_device(self, queries, arrays=None, vals=None):
        """queries: (...,) uint64 jnp array -> (vals, found)."""
        import jax.numpy as jnp

        a = arrays or self.device_arrays()
        tk, tv, toc = a["keys"], a["vals"] if vals is None else vals, a["occbits"]
        b1, b2 = self._buckets_of(queries, self.shift, xp=jnp)
        lane = jnp.arange(SLOTS, dtype=jnp.int32)
        found = jnp.zeros(queries.shape, dtype=bool)
        val = jnp.zeros(queries.shape, dtype=tv.dtype)
        for b in (b1, b2):
            b = b.astype(jnp.int32)
            krow = tk[b]
            orow = toc[b]
            occ = ((orow[..., None] >> lane) & 1) > 0
            eq = (krow == queries[..., None]) & occ
            hit = jnp.any(eq, axis=-1)
            v = jnp.sum(jnp.where(eq, tv[b], 0), axis=-1).astype(tv.dtype)
            val = jnp.where(hit & ~found, v, val)
            found = found | hit
        return val, found

    def relabel(self, new_vals_sorted: np.ndarray) -> np.ndarray:
        """Re-encode values (aligned to keys_sorted) into the bucket layout,
        e.g. compact taxonomy indices for on-device resolution."""
        new_vals_sorted = np.asarray(new_vals_sorted)
        flat = np.zeros(self.nb * SLOTS, dtype=new_vals_sorted.dtype)
        flat[self.slot_of] = new_vals_sorted
        return flat.reshape(self.nb, SLOTS)

    # -- dict-style host access (tests / small tools) ---------------------
    def lookup(self, key: int):
        i = int(np.searchsorted(self.keys_sorted, np.uint64(key)))
        if i < self.n and self.keys_sorted[i] == np.uint64(key):
            return self.vals_sorted[i]
        return None

    def __len__(self):
        return self.n


class ScoreMap:
    """score::Hash adapter: phase-1 (kmer -> packed u64 score) map used as a
    minimizer ordering (encoder.h:61-74, implemented as intended — see
    core/encoder.py docstring)."""

    def __init__(self, table: KmerTable):
        self.table = table

    def lookup_scores(self, kmers):
        if isinstance(kmers, np.ndarray):
            xp = np
            val, found = self.table.probe_np(kmers)
        else:
            import jax.numpy as xp

            val, found = self.table.probe_device(kmers)
        # missing kmers should not occur (phase-1 covers phase-2 input);
        # give them the worst score so they never win a window.
        return xp.where(found, val.astype(xp.uint64), xp.uint64((1 << 64) - 1))
