"""Bucketized two-choice cuckoo k-mer table: HBM-resident, gather-probed.

TPU-native replacement for the khash classify DB
(/root/reference/klib khash via include/bonsai/util.h:159-163).  khash's
scalar quadratic probing has unbounded, data-dependent probe chains —
poison for a vectorized probe that must execute its worst case for every
lane.  Here every key lives in one of two candidate buckets, and a bucket
is ONE fused 64-byte row

    [k0 k1 k2 k3 | v0 v1 v2 v3]   (8 x u64 lanes)

so a probe is exactly two 64B row gathers + vectorized lane compares.
Microbenchmarks on the target chip (tools/probe_microbench2.py) show 64B
u64x8 rows are the gather sweet spot (11.6 ns/row; two pipeline to 21.6
ns), while wider rows, slice-gathers, and searchsorted are 2-100x worse —
this layout is chosen from that evidence.

Empty slots hold POISON keys constructed so neither of their candidate
buckets is the row they sit in: a query q only ever inspects rows b1(q) /
b2(q), so poison(x) == q would imply b1(x) == b1(q), a contradiction —
no occupancy bitmap needs to be fetched.

    bucket1 = high bits of splitmix64(key)
    bucket2 = high bits of splitmix64(key ^ SALT)

Build is host-side numpy: greedy two-round placement handles ~99% of keys
at load 0.65; the rest place by vectorized random-walk cuckoo eviction
rounds (first-claimant-wins, evictees re-enter with their alternate
bucket).  Fails over to a bigger table if a build doesn't converge.
Deterministic: all "randomness" is hashed off key bits.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core import hashes

SLOTS = 4
LANES = 2 * SLOTS  # fused row: SLOTS keys + SLOTS vals
SALT = np.uint64(0xA24BAED4963EE407)
POISON_SALT = np.uint64(0xD6E8FEB86659FD93)
DEFAULT_LOAD = 0.65


def _next_pow2(x: int) -> int:
    return 1 << max(int(x - 1).bit_length(), 0)


class KmerTable:
    """``keys_sorted`` / ``vals_sorted`` are the canonical content (sorted
    by key); the fused bucket layout ``rows`` (nb, 8) u64 is a derived
    probe structure."""

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
        # nb >= 4 so poison keys (both candidate buckets != home bucket)
        # always exist
        nb = max(
            _next_pow2(max(int(np.ceil(self.n / (SLOTS * load_factor))), 1)), 4
        )
        while not self._try_build(nb):
            nb <<= 1
        self._jax_rows = None

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
        keys = self.keys_sorted
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

    def _poison_keys(self, slots: np.ndarray) -> np.ndarray:
        """A key per flat slot index whose candidate buckets both differ
        from the bucket the slot sits in (so it can never match a query
        probing that row)."""
        bucket = slots // SLOTS
        cand = hashes.splitmix64(slots.astype(np.uint64) + POISON_SALT)
        for rnd in range(64):
            b1, b2 = self._buckets_of(cand, self.shift)
            bad = (b1 == bucket) | (b2 == bucket)
            if not bad.any():
                return cand
            cand = np.where(
                bad,
                hashes.splitmix64(cand + np.uint64(rnd + 1)),
                cand,
            )
        raise RuntimeError("poison search did not converge")

    def _finalize(self, owner: np.ndarray):
        nb = self.nb
        keys, vals = self.keys_sorted, self.vals_sorted
        occ = owner >= 0
        tk = np.empty(nb * SLOTS, dtype=np.uint64)
        tv = np.zeros(nb * SLOTS, dtype=np.uint64)
        empty = np.nonzero(~occ)[0]
        tk[empty] = self._poison_keys(empty)
        if self.n:
            tk[occ] = keys[owner[occ]]
            tv[occ] = vals[owner[occ]].astype(np.uint64)
        self.rows = np.concatenate(
            [tk.reshape(nb, SLOTS), tv.reshape(nb, SLOTS)], axis=1
        )  # (nb, 8): [keys | vals]
        slot_of = np.full(self.n, -1, dtype=np.int64)
        if self.n:
            slot_of[owner[occ]] = np.nonzero(occ)[0]
        self.slot_of = slot_of
        self.max_scan = 2  # by construction

    # -- derived layouts ----------------------------------------------------
    def fused_rows(self, new_vals_sorted: np.ndarray = None) -> np.ndarray:
        """(nb, 8) u64 fused rows; optionally with re-encoded values
        (aligned to keys_sorted), e.g. packed taxid|compact-index."""
        if new_vals_sorted is None:
            return self.rows
        nv = np.asarray(new_vals_sorted).astype(np.uint64)
        flat = np.zeros(self.nb * SLOTS, dtype=np.uint64)
        flat[self.slot_of] = nv
        out = self.rows.copy()
        out[:, SLOTS:] = flat.reshape(self.nb, SLOTS)
        return out

    def device_rows(self):
        if self._jax_rows is None:
            import jax.numpy as jnp

            self._jax_rows = jnp.asarray(self.rows)
        return self._jax_rows

    # -- probes -------------------------------------------------------------
    def probe_np(self, queries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.uint64)
        b1, b2 = self._buckets_of(q, self.shift)
        found = np.zeros(q.shape, dtype=bool)
        val = np.zeros(q.shape, dtype=np.uint64)
        for b in (b1, b2):
            row = self.rows[b]
            eq = row[..., :SLOTS] == q[..., None]
            hit = eq.any(-1)
            v = (row[..., SLOTS:] * eq).sum(-1)
            val = np.where(hit & ~found, v, val)
            found |= hit
        if self.vals_sorted.dtype != np.uint64:
            val = val.astype(self.vals_sorted.dtype)
        return val, found

    def probe_device(self, queries, rows=None) -> Tuple:
        """queries: (...,) uint64 jnp array -> (vals u64, found).  Exactly
        two fused 64B row gathers."""
        import jax.numpy as jnp

        t = self.device_rows() if rows is None else rows
        b1, b2 = self._buckets_of(queries, self.shift, xp=jnp)
        found = jnp.zeros(queries.shape, dtype=bool)
        val = jnp.zeros(queries.shape, dtype=jnp.uint64)
        for b in (b1, b2):
            row = t[b.astype(jnp.int32)]
            eq = row[..., :SLOTS] == queries[..., None]
            hit = jnp.any(eq, axis=-1)
            v = jnp.sum(jnp.where(eq, row[..., SLOTS:], 0), axis=-1)
            val = jnp.where(hit & ~found, v, val)
            found = found | hit
        return val, found

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
