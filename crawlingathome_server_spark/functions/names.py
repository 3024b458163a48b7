"""F7: deterministic two-word display names (SURVEY.md §2.9 F7).

The reference generates worker display names as two random dictionary
words plus a random 0-999 suffix (reference: name.py:7-11, sampling
words.json with ``random.choice``). Randomness is replaced by seeded
hashing (same inversion as the claim operator): the name is a pure
function of the worker key, so it is stable across restarts and
identical at any parallelism. The word list is our own (32 short
adjectives + 32 nouns), not the reference's words.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urls import oracle_hash, oracle_hash_sql

ADJECTIVES = [
    "amber", "bold", "brisk", "calm", "civic", "clear", "crisp", "deft",
    "eager", "fleet", "fond", "glad", "grand", "happy", "keen", "kind",
    "lively", "lucid", "merry", "neat", "noble", "prime", "quick", "quiet",
    "rapid", "sharp", "solid", "stout", "swift", "tidy", "vivid", "warm",
]
NOUNS = [
    "anchor", "badger", "beacon", "canyon", "cedar", "comet", "condor", "coral",
    "crane", "delta", "ember", "falcon", "fjord", "gannet", "glacier", "harbor",
    "heron", "lagoon", "lantern", "maple", "meadow", "nebula", "osprey", "otter",
    "pebble", "pine", "quartz", "raven", "ridge", "river", "summit", "willow",
]


def display_name(key: Column, seed: int = 0) -> Column:
    """``adjective-noun-NNN`` from three seeded hashes of ``key``."""
    a = F.pmod(oracle_hash(key, seed + 1), F.lit(len(ADJECTIVES)))
    n = F.pmod(oracle_hash(key, seed + 2), F.lit(len(NOUNS)))
    suffix = F.pmod(oracle_hash(key, seed + 3), F.lit(1000))
    adj = F.element_at(F.array(*[F.lit(w) for w in ADJECTIVES]), a.cast("int") + 1)
    noun = F.element_at(F.array(*[F.lit(w) for w in NOUNS]), n.cast("int") + 1)
    return F.concat_ws("-", adj, noun, suffix.cast("string"))


def display_name_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`display_name`."""
    adj_list = "[" + ", ".join(f"'{w}'" for w in ADJECTIVES) + "]"
    noun_list = "[" + ", ".join(f"'{w}'" for w in NOUNS) + "]"
    a = f"(({oracle_hash_sql(expr, seed + 1)}) % {len(ADJECTIVES)})"
    n = f"(({oracle_hash_sql(expr, seed + 2)}) % {len(NOUNS)})"
    suffix = f"(({oracle_hash_sql(expr, seed + 3)}) % 1000)"
    return (
        f"concat({adj_list}[CAST({a} AS BIGINT) + 1], '-', "
        f"{noun_list}[CAST({n} AS BIGINT) + 1], '-', "
        f"CAST({suffix} AS VARCHAR))"
    )
