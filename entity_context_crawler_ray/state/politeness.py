"""Per-host politeness token buckets + robots budgets (north_rule;
no reference counterpart — the reference reads a local dump and needs
no politeness, SURVEY.md §2.3 ST6).

One ``HostPolicy`` per host: a token bucket (``capacity`` tokens,
``refill`` tokens added per crawl round — rounds stand in for wall
time in the dump-driven sandbox) plus a robots model (deny-prefixes
and an optional per-host ``crawl_budget`` = lifetime fetch cap).

Buckets live in ``PolitenessShard`` actors keyed by
``hash(host) % num_shards`` — actor count scales with the number of
distinct hosts, not with URL volume.  The pure class is reused by the
crawl-parity simulator.

Determinism / idempotence: ``admit`` is called exactly once per
(round, host) because the crawl loop groups candidates by host before
admission; a retried call with the same (round, host) key returns the
cached decision instead of double-charging the bucket.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import ray

from ..functions.hashing import stable_hash64


class HostPolicy:
    """Token bucket with two refill modes:

    - round mode (default): ``refill`` tokens per crawl round — rounds
      stand in for wall time in the dump-driven sandbox.
    - wall-clock mode (``refill_per_sec`` set): tokens accrue with
      elapsed ``clock()`` seconds — the live-fetch deployment mode.
      ``clock`` defaults to ``time.time`` (comparable across process
      restarts, so snapshots resume correctly); tests inject a fake.
    """

    def __init__(
        self,
        capacity: int,
        refill: int,
        deny_prefixes: Tuple[str, ...] = (),
        crawl_budget: int | None = None,
        refill_per_sec: Optional[float] = None,
        clock: Optional[Callable[[], float]] = None,
    ):
        self.capacity = capacity
        self.refill = refill
        self.refill_per_sec = refill_per_sec
        self.clock = clock or time.time
        self.deny_prefixes = tuple(deny_prefixes)
        self.crawl_budget = crawl_budget
        self.tokens: float = capacity
        self.fetched_total = 0
        self.last_round = -1
        self.last_time: Optional[float] = None

    def _refill_now(self, round_id: int) -> None:
        if self.refill_per_sec is not None:
            now = self.clock()
            if self.last_time is not None:
                elapsed = max(0.0, now - self.last_time)
                self.tokens = min(
                    self.capacity, self.tokens + elapsed * self.refill_per_sec
                )
            self.last_time = now
            self.last_round = max(self.last_round, round_id)
        elif round_id > self.last_round:
            rounds = round_id - self.last_round if self.last_round >= 0 else 0
            self.tokens = min(self.capacity, self.tokens + rounds * self.refill)
            self.last_round = round_id

    def admit(self, round_id: int, urls_by_priority: Sequence[str]) -> Tuple[List[str], List[str], List[str]]:
        """-> (admitted, deferred, robots_denied). urls must arrive
        sorted by descending priority (tie-broken by url)."""
        self._refill_now(round_id)
        allowed, denied = [], []
        for url in urls_by_priority:
            if any(url.startswith(p) for p in self.deny_prefixes):
                denied.append(url)
            else:
                allowed.append(url)
        if self.crawl_budget is not None:
            room = max(0, self.crawl_budget - self.fetched_total)
            denied.extend(allowed[room:])
            allowed = allowed[:room]
        take = min(int(self.tokens), len(allowed))
        admitted, deferred = allowed[:take], allowed[take:]
        self.tokens -= take
        self.fetched_total += take
        return admitted, deferred, denied

    def refund(self, n: int) -> None:
        """Return ``n`` admission charges: URLs admitted here but then
        cut by the crawl loop's GLOBAL round budget are deferred, not
        fetched — without a refund their tokens and (worse) their
        lifetime ``crawl_budget`` charge would be consumed by fetches
        that never happened, and re-charged on re-admission next round,
        eventually denying the host's remaining budget permanently."""
        if n <= 0:
            return
        self.tokens = min(self.capacity, self.tokens + n)
        self.fetched_total = max(0, self.fetched_total - n)


class PolitenessShard:
    """Holds HostPolicy state for every host hashing to this shard."""

    def __init__(self, config: Dict, clock: Optional[Callable[[], float]] = None):
        # config: {"capacity": int, "refill": int,
        #          "refill_per_sec": float | None (wall-clock mode),
        #          "deny": {host: [prefix,...]}, "budget": {host: int}}
        self.config = config
        self.clock = clock
        self.hosts: Dict[str, HostPolicy] = {}
        self._cache: Dict[tuple, tuple] = {}

    def _host(self, host: str) -> HostPolicy:
        if host not in self.hosts:
            self.hosts[host] = HostPolicy(
                capacity=self.config.get("capacity", 1 << 30),
                refill=self.config.get("refill", 1 << 30),
                deny_prefixes=tuple(self.config.get("deny", {}).get(host, ())),
                crawl_budget=self.config.get("budget", {}).get(host),
                refill_per_sec=self.config.get("refill_per_sec"),
                clock=self.clock,
            )
        return self.hosts[host]

    def admit(self, round_id: int, host: str, urls_by_priority: List[str]):
        """Idempotent per (round, host).  The cache stores a COMPACT
        record — (n_urls, n_room, n_take) — not the URL lists: a
        retried call arrives with the identical (deterministically
        ordered) url list, so the full decision is replayed from the
        two boundary counts + the static deny prefixes.  Without this,
        a bucketed round over millions of hosts would retain every
        URL string of the round in actor memory."""
        key = ("admit", round_id, host)
        hit = self._cache.get(key)
        # cheap content fingerprint: replaying cached boundary counts
        # onto a DIFFERENT or reordered url list would silently admit
        # the wrong urls; the invariant is checked, not assumed
        fp = stable_hash64("\x1f".join(urls_by_priority))
        if hit is None:
            adm, dfr, den = self._host(host).admit(round_id, urls_by_priority)
            self._cache[key] = (
                len(urls_by_priority),
                len(adm) + len(dfr),
                len(adm),
                fp,
            )
            self._evict_cache(round_id)
            return adm, dfr, den
        n_urls, n_room, n_take, cached_fp = hit
        if n_urls != len(urls_by_priority) or cached_fp != fp:
            raise ValueError(
                f"politeness replay mismatch for {(round_id, host)}: "
                f"cached n_urls={n_urls} fp={cached_fp}, got "
                f"{len(urls_by_priority)} fp={fp}"
            )
        return self._replay_admit(host, urls_by_priority, n_room, n_take)

    def _replay_admit(
        self, host: str, urls: List[str], n_room: int, n_take: int
    ) -> Tuple[List[str], List[str], List[str]]:
        """Reconstruct an earlier admit decision from its boundary
        counts: the original walk denies prefix matches, cuts
        ``allowed`` at the lifetime-budget ``room``, then admits the
        first ``take`` — all order-preserving, so counts suffice."""
        prefixes = self._host(host).deny_prefixes
        allowed: List[str] = []
        denied: List[str] = []
        for url in urls:
            if any(url.startswith(p) for p in prefixes):
                denied.append(url)
            else:
                allowed.append(url)
        denied.extend(allowed[n_room:])
        allowed = allowed[:n_room]
        return allowed[:n_take], allowed[n_take:], denied

    def admit_many(
        self, round_id: int, hosts: List[str], url_lists: List[List[str]]
    ) -> List[List[str]]:
        """ONE actor call per (frontier bucket, round): admit every host
        in the bucket at once, returning per-host status lists aligned
        with the input url order ('admit' | 'defer' | 'deny').  Each
        url list must arrive sorted by (priority desc, url asc); the
        per-host decisions go through the same idempotent cache as
        ``admit``, so a retried bucket task replays identical results."""
        out: List[List[str]] = []
        for host, urls in zip(hosts, url_lists):
            adm, dfr, den = self.admit(round_id, host, urls)
            status: Dict[str, str] = {}
            for u in adm:
                status[u] = "admit"
            for u in dfr:
                status[u] = "defer"
            for u in den:
                status[u] = "deny"
            out.append([status[u] for u in urls])
        return out

    def refund(self, round_id: int, host: str, n: int, source: str = "global") -> None:
        """Idempotent per (round, host, source): return ``n``
        over-round-budget admission charges (see HostPolicy.refund).
        ``source`` distinguishes independent refund origins in the same
        round (each frontier bucket's local truncation + the driver's
        global cut) — same-source retries are swallowed, distinct
        sources accumulate."""
        key = ("refund", round_id, host, source)
        if key not in self._cache:
            self._host(host).refund(n)
            self._cache[key] = n
            self._evict_cache(round_id)

    def refund_many(
        self, round_id: int, host_counts: Dict[str, int], source: str = "global"
    ) -> None:
        """One call per shard per round: refund every host at once."""
        for host, n in host_counts.items():
            self.refund(round_id, host, n, source)

    def _evict_cache(self, current_round: int) -> None:
        # Only decisions from PAST rounds are safe to drop: the crawl
        # loop never re-issues a (round, host) call once the round has
        # completed, so a Ray retry can only target the current round.
        # Clearing indiscriminately (the old behavior) let a retried
        # current-round call re-execute admit and double-charge tokens.
        if len(self._cache) > 4096:
            self._cache = {
                k: v for k, v in self._cache.items() if k[1] >= current_round
            }

    def snapshot(self) -> Dict:
        return {
            "config": self.config,
            "hosts": {
                h: {
                    "tokens": p.tokens,
                    "fetched_total": p.fetched_total,
                    "last_round": p.last_round,
                    "last_time": p.last_time,
                }
                for h, p in self.hosts.items()
            },
        }

    def restore(self, snap: Dict) -> None:
        self.config = snap["config"]
        self.hosts = {}
        self._cache = {}
        for h, st in snap["hosts"].items():
            pol = self._host(h)
            pol.tokens = st["tokens"]
            pol.fetched_total = st["fetched_total"]
            pol.last_round = st["last_round"]
            pol.last_time = st.get("last_time")


PolitenessShardActor = ray.remote(num_cpus=0)(PolitenessShard)


def politeness_shard_of(host: str, num_shards: int) -> int:
    return stable_hash64("politeness-shard", host) % num_shards
