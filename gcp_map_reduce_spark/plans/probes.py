"""Session-scoped cache for sampled plan-choice probes.

The cost-based choosers (``choose_edge_source``,
``choose_embedding_payload``, ``prefix_filter="auto"``) each run one
small sampled Spark job over the corpus. The probe is cheap next to the
plan choice it informs (~1.3 s vs ~15 s saved at stress scale) but NOT
free at bench scale (+0.3-0.5 s — the reason the r8 auto-default was
reverted). Within a session the corpus under an ``sf_dir`` is immutable,
and several operators ask the SAME question about it (dedup_clusters and
curated_corpus share the candidate-pair-density probe; a bench warm-up
pass asks once more than the timed runs), so the estimate is cached per
(probe, sf_dir, params): the first caller pays the sampled job, every
later caller — including every timed bench run after the warm-up — gets
the number back for a dict lookup.

Deliberately NOT an LRU with eviction: the value space is a handful of
floats per corpus, and silent eviction would turn "probe fires once" —
the property pytest pins — into a load-dependent maybe. ``clear()``
exists for tests and for callers that mutate a corpus dir in place.
"""

from __future__ import annotations

import logging
from typing import Callable

log = logging.getLogger(__name__)

_CACHE: dict[tuple, float] = {}
# monotone counters, exposed for the pytest gate ("the cached probe
# fires once") and for audit logging
STATS = {"hits": 0, "misses": 0}


def cached_probe(key: tuple, compute: Callable[[], float]) -> float:
    """Return the cached probe value for ``key``, computing it once.

    ``key`` must fully determine the estimate: probe name, sf_dir, and
    every sampling parameter (sample_target, seed). Callers probing a
    caller-supplied relation (not an sf_dir) must bypass the cache —
    there is no stable key for an arbitrary DataFrame.
    """
    if key in _CACHE:
        STATS["hits"] += 1
        return _CACHE[key]
    STATS["misses"] += 1
    value = compute()
    _CACHE[key] = value
    log.info("probe %s -> %.3f (cached for session)", key, value)
    return value


def clear() -> None:
    """Drop every cached probe (tests; in-place corpus mutation)."""
    _CACHE.clear()
