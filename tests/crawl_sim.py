"""Pure-Python reference simulation of the crawl round semantics
(SURVEY.md §5 test plan item 3): exact seen-set, same HostPolicy
class, driver-only.  The distributed crawl must reproduce this
simulator's fetch ordering and final URL-seen set given the same
seeds + politeness budget."""

from __future__ import annotations

from typing import Dict, List, Tuple

from entity_context_crawler_ray.pipelines.crawl import CrawlConfig
from entity_context_crawler_ray.sources.docs import host_of
from entity_context_crawler_ray.state.politeness import HostPolicy


def simulate_crawl(
    docs: Dict[str, list],
    seeds: List[Tuple[str, float]],
    title_to_eid: Dict[str, str],
    config: CrawlConfig,
) -> Dict:
    seen: set = set()
    policies: Dict[str, HostPolicy] = {}
    fetch_log: List[Tuple[int, int, str]] = []  # (round, rank, url)
    frontier: List[Tuple[str, float, int]] = [
        (u, p, 0) for u, p in seeds
    ]  # (url, priority, depth)
    rounds = []

    for round_id in range(config.max_rounds):
        if not frontier:
            break
        # 1. dedup by url: max priority, min depth
        best: Dict[str, Tuple[float, int]] = {}
        for url, prio, depth in frontier:
            if url not in best:
                best[url] = (prio, depth)
            else:
                p0, d0 = best[url]
                best[url] = (max(p0, prio), min(d0, depth))
        # 2. drop seen
        cand = {u: pd for u, pd in best.items() if u not in seen}
        # 3. per-host admission
        by_host: Dict[str, List[str]] = {}
        for u in cand:
            by_host.setdefault(host_of(u), []).append(u)
        admitted: List[Tuple[str, float, int]] = []
        deferred: List[Tuple[str, float, int]] = []
        for host, urls in by_host.items():
            urls.sort(key=lambda u: (-cand[u][0], u))
            if host not in policies:
                policies[host] = HostPolicy(
                    capacity=config.capacity,
                    refill=config.refill,
                    deny_prefixes=tuple(config.deny.get(host, ())),
                    crawl_budget=config.host_budget.get(host),
                )
            adm, dfr, _denied = policies[host].admit(round_id, urls)
            admitted.extend((u, cand[u][0], cand[u][1]) for u in adm)
            deferred.extend((u, cand[u][0], cand[u][1]) for u in dfr)
        # 4. global budget; over-budget rows are deferred AND refunded
        # (host tokens / lifetime budget charge only for actual fetches)
        admitted.sort(key=lambda t: (-t[1], t[0]))
        fetch = admitted[: config.round_budget]
        cut = admitted[config.round_budget :]
        deferred.extend(cut)
        for url, _p, _d in cut:
            policies[host_of(url)].refund(1)
        # 5. mark + fetch + extract
        new_links: Dict[str, List[int]] = {}  # target -> [count, is_entity, min_src_depth]
        n_fetched = 0
        for rank, (url, prio, depth) in enumerate(fetch):
            seen.add(url)
            fetch_log.append((round_id, rank, url))
            spans = docs.get(url)
            if spans is None:
                continue
            n_fetched += 1
            if depth < config.max_depth:
                for s in spans:
                    if s["kind"] == "link" and s["media_ref"]:
                        t = s["media_ref"]
                        rec = new_links.setdefault(t, [0, 0, depth])
                        rec[0] += 1
                        rec[1] = max(rec[1], int(t in title_to_eid))
                        rec[2] = min(rec[2], depth)
        # 6. next frontier
        frontier = deferred + [
            (t, cnt + config.entity_bonus * is_ent, d + 1)
            for t, (cnt, is_ent, d) in new_links.items()
        ]
        rounds.append(
            {"round": round_id, "fetched": len(fetch), "extracted": n_fetched}
        )

    return {"fetch_log": fetch_log, "seen": seen, "rounds": rounds}
