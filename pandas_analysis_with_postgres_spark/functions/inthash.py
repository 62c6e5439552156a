"""Engine-exact integer hashing — the ONE home for the
multiplicative-hash construction used by the seeded corpus shuffle
(``operators.sharding``), the manifest Bloom filters
(``sources.snapshot``), and (with smaller constants) the a79
deterministic sampler.

Construction: ``((value pmod MOD) * MULT + c) pmod MOD`` with
``MOD = 2^31 - 1`` (Mersenne prime) and odd multipliers from the
Knuth/xxhash prime family. Because ``value pmod MOD < 2^31`` and
``MULT < 2^32``, every intermediate stays below ``2^63`` — no
overflow in Spark, DuckDB, Postgres, or Python, so the hash value is
bit-identical everywhere.

Sign caveat, centralized: Spark's ``pmod`` and Python's ``%`` return
NON-NEGATIVE residues for negative inputs, while SQL ``%`` in most
dialects (DuckDB, Postgres) follows the dividend's sign. An oracle
replaying these hashes over values that can be negative must use the
pmod-equivalent ``((v % MOD) + MOD) % MOD``; for non-negative values
plain ``%`` suffices (what the z05/z06 oracles rely on).
"""

from __future__ import annotations

#: Mersenne prime 2^31 - 1.
HASH_MOD = (1 << 31) - 1

#: Distinct odd multipliers (Knuth / xxhash / Murmur primes). Index 0
#: is the default (the shuffle's multiplier); the Bloom filter uses
#: all four as its k hash functions.
HASH_MULTS = (2654435761, 2246822519, 3266489917, 668265263)


def int_hash(value: int, mult: int = HASH_MULTS[0], c: int = 0) -> int:
    """Pure-Python reference: pmod semantics (non-negative), matching
    Spark's ``pmod`` expression bit-for-bit for any bigint input."""
    return ((value % HASH_MOD) * mult + c) % HASH_MOD
