"""Simulation of htslib khash.h bucket layout.

Some reference outputs iterate khash tables in bucket order (e.g.
cram_describe_encodings' tag map, bedidx region lists).  This simulator
reproduces khash's exact insert/resize behaviour — identity hash for
int keys, X31 for strings, quadratic-increment probing
(__ac_inc(k,m) = ((k>>3 ^ k<<3) | 1) & m) and the in-place kick-out
rehash — so iteration order matches the reference byte-for-byte.
"""

from __future__ import annotations

M32 = 0xFFFFFFFF


def x31(s: bytes) -> int:
    h = s[0] if s else 0
    for ch in s[1:]:
        h = ((h << 5) - h + ch) & M32
    return h


def _inc(k: int, mask: int) -> int:
    return ((((k >> 3) ^ (k << 3)) | 1) & mask) & M32


def _roundup32(x: int) -> int:
    x -= 1
    for s in (1, 2, 4, 8, 16):
        x |= x >> s
    return x + 1


class KHash:
    """Insert-only khash simulation; values optional."""

    def __init__(self, hash_func=None):
        self.n_buckets = 0
        self.size = 0
        self.upper = 0
        self.keys: list = []
        self.used: list = []
        self.hash = hash_func or (lambda k: k & M32)

    def _resize(self, new_n: int):
        new_n = _roundup32(new_n)
        if new_n < 4:
            new_n = 4
        if self.size >= int(new_n * 0.77 + 0.5):
            return
        old_n = self.n_buckets
        old_used = self.used
        mask = new_n - 1
        # extend arrays; old slots keep contents, flagged for rehash
        keys = self.keys + [None] * (new_n - old_n)
        new_used = [False] * new_n
        for j in range(old_n):
            if not old_used[j]:
                continue
            key = keys[j]
            old_used[j] = False
            while True:
                k = self.hash(key)
                i = k & mask
                inc = _inc(k, mask)
                while new_used[i]:
                    i = (i + inc) & mask
                new_used[i] = True
                if i < old_n and old_used[i]:
                    keys[i], key = key, keys[i]
                    old_used[i] = False
                else:
                    keys[i] = key
                    break
        self.keys = keys
        self.used = new_used
        self.n_buckets = new_n
        self.upper = int(new_n * 0.77 + 0.5)

    def put(self, key):
        if self.size >= self.upper:
            if self.n_buckets > (self.size << 1):
                self._resize(self.n_buckets - 1)
            else:
                self._resize(self.n_buckets + 1)
        mask = self.n_buckets - 1
        k = self.hash(key)
        i = k & mask
        if self.used[i] and self.keys[i] != key:
            inc = _inc(k, mask)
            while self.used[i] and self.keys[i] != key:
                i = (i + inc) & mask
        if not self.used[i]:
            self.keys[i] = key
            self.used[i] = True
            self.size += 1
        return i

    def iter_keys(self):
        """kh_begin..kh_end order."""
        for i in range(self.n_buckets):
            if self.used[i]:
                yield self.keys[i]


def khash_order(keys, hash_func=None):
    """Order the given keys as a khash built by inserting them in order
    would iterate them."""
    h = KHash(hash_func)
    for k in keys:
        h.put(k)
    return list(h.iter_keys())
