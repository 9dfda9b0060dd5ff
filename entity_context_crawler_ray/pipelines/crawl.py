"""Frontier-driven crawl over the doc store (north_rule core).

The reference approximates a crawl by a single pass over a dump in
file order (SURVEY.md §2.9); its "frontier" is implicitly the 1-hop
link neighborhood of the seed entity pages (reference README.md:5).
The rebuild makes that explicit: a priority URL frontier drained in
rounds, with

- a sharded **bloom seen-filter** (state/bloom.py) probed and marked
  from distributed ``map_batches`` stages,
- per-host **politeness token buckets + robots budgets**
  (state/politeness.py) applied in a ``groupby(host)`` admission
  stage (optionally pre-truncated per salted sub-bucket for hot
  hosts — the exact-top-K combiner trick, SURVEY.md §7.4),
- a global **priority sort + round budget** split
  (``sort.split_at_indices``), deterministic via (priority desc, url
  asc) ordering,
- **fetch+extract** as an actor-pool ``map_batches`` over the
  hash-partitioned doc store, running the stage-1 matcher per fetched
  page (stages/match.py) and emitting out-links for the next round,
- per-round **checkpoints** (frontier parquet + bloom/politeness
  snapshots + manifest, state/checkpoint.py) making the crawl
  resumable, and per-round partitioned parquet output
  (``out_dir/round=r/``) with a ``round`` lineage column.

Round semantics (the conformance definition the parity simulator in
tests/crawl_sim reproduces):

1. frontier dedup by url (max priority, min depth);
2. drop urls the bloom filter has seen;
3. per-host admission: robots-denied dropped, then up to
   ``tokens(host)`` admitted in (priority desc, url) order, rest
   deferred to the next round;
4. global round budget: top ``round_budget`` by (priority desc, url)
   fetched, rest deferred;
5. fetched urls marked seen; pages extracted; out-links of pages at
   depth < max_depth become next-round candidates with
   priority = in-degree + entity_bonus·[target is entity page];
6. next frontier = deferred ∪ new candidates; stop when empty.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import stable_hash64
from ..sources.doc_store import DocStoreReader, PlasmaDocStoreReader, preload_doc_store
from ..sources.docs import host_of
from ..stages.match import COMBINED_SCHEMA, process_doc
from ..state.bloom import BloomShardActor, ShardedSeenFilter
from ..state.politeness import PolitenessShardActor, politeness_shard_of

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.float64()),
        ("depth", pa.int32()),
    ]
)

LINK_ITEM = pa.struct([("target", pa.string()), ("is_entity", pa.bool_())])


@dataclass
class CrawlConfig:
    max_depth: int = 1
    round_budget: int = 1 << 30
    capacity: int = 1 << 30          # politeness bucket capacity (tokens)
    refill: int = 1 << 30            # tokens refilled per round
    deny: Dict[str, List[str]] = field(default_factory=dict)    # host -> url prefixes
    host_budget: Dict[str, int] = field(default_factory=dict)   # host -> lifetime cap
    num_bloom_shards: int = 4
    bloom_bits: int = 1 << 22
    seen_filter: str = "bloom"       # 'bloom' | 'cuckoo' (deletable)
    num_politeness_shards: int = 2
    hot_host_salt: int = 0           # >0 enables salted pre-truncation
    entity_bonus: float = 10.0
    fetch_batch_size: int = 64
    doc_store_partitions: int = 32
    preload_store: bool = True       # pin partitions in plasma (zero-copy fetch)
    max_rounds: int = 64             # safety backstop
    # Rounds whose frontier fits under this many rows schedule on the
    # driver with pure pyarrow + batched parallel actor calls — the
    # same semantics (tested against the distributed path and the
    # simulator), without paying per-round Dataset task overhead for
    # kilobyte-sized bookkeeping.  Fetch+extract (the heavy stage) is
    # distributed in both regimes; bloom/politeness actors remain the
    # authoritative state in both.  Set to 0 to force the distributed
    # scheduling path (what a 10^10-URL frontier would exercise).
    driver_threshold: int = 1_000_000


# Worker-process-global cache: the crawl loop launches a fresh Dataset
# execution per round, so per-execution actor pools would cold-start
# every round.  Fetch/probe/mark stages are therefore stateless TASKS
# whose heavy state (doc-store partition cache, entity indexes) lives
# in this per-worker-process cache — loaded once per worker, shared
# across rounds (the long-lived-pool equivalent for a round-driven
# driver loop; at cluster scale the same cache amortizes across the
# whole crawl because Ray reuses worker processes).
_WORKER_CACHE: Dict = {}


def _fetch_state(store_dir: str, num_partitions: int, entities_ref, store_refs=None):
    # key includes the broadcast identities: the same store crawled
    # with different entity catalogs must not reuse a stale index
    ref_key = entities_ref.hex() if hasattr(entities_ref, "hex") else id(entities_ref)
    sref_key = store_refs.hex() if hasattr(store_refs, "hex") else id(store_refs)
    key = ("fetch", store_dir, ref_key, sref_key)
    st = _WORKER_CACHE.get(key)
    if st is None:
        idx = (
            ray.get(entities_ref)
            if isinstance(entities_ref, ray.ObjectRef)
            else entities_ref
        )
        if store_refs is not None:
            reader = PlasmaDocStoreReader(ray.get(store_refs), num_partitions)
        else:
            reader = DocStoreReader(store_dir, num_partitions)
        st = (reader, idx["title_to_eid"], idx["eid_to_label"])
        _WORKER_CACHE[key] = st
    return st


class FetchExtract:
    """Fetch stage body: admitted frontier rows -> combined page rows
    (+ out_links for the frontier).  Constructed per task, but all
    state comes from the worker-global cache (see _WORKER_CACHE)."""

    def __init__(self, store_dir: str, num_partitions: int, entities_ref, store_refs=None):
        self.reader, self.title_to_eid, self.eid_to_label = _fetch_state(
            store_dir, num_partitions, entities_ref, store_refs
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        depths = batch["depth"].to_pylist()
        rounds = batch["round"].to_pylist()
        hits, missing = self.reader.lookup(urls)
        missing_set = set(missing)
        rows, out_links, fetched, out_depth, out_round = [], [], [], [], []
        for url, depth, rnd in zip(urls, depths, rounds):
            if url in missing_set:
                row = {k.name: None for k in COMBINED_SCHEMA}
                row.update(
                    title=url, clean_text="", matches=[], mentions=[],
                    error="fetch-miss",
                )
                rows.append(row)
                out_links.append([])
                fetched.append(False)
            else:
                spans = hits[url]
                try:
                    rows.append(
                        process_doc(url, spans, self.title_to_eid, self.eid_to_label)
                    )
                except Exception as exc:  # noqa: BLE001 — poison-row guard
                    row = {k.name: None for k in COMBINED_SCHEMA}
                    row.update(
                        title=url, clean_text="", matches=[], mentions=[],
                        error=f"{type(exc).__name__}: {exc}",
                    )
                    rows.append(row)
                out_links.append(
                    [
                        {
                            "target": s["media_ref"],
                            "is_entity": s["media_ref"] in self.title_to_eid,
                        }
                        for s in spans
                        if s["kind"] == "link" and s["media_ref"]
                    ]
                )
                fetched.append(True)
            out_depth.append(depth)
            out_round.append(rnd)
        t = pa.Table.from_pylist(rows, schema=COMBINED_SCHEMA)
        t = t.append_column("out_links", pa.array(out_links, pa.list_(LINK_ITEM)))
        t = t.append_column("fetched", pa.array(fetched, pa.bool_()))
        t = t.append_column("depth", pa.array(out_depth, pa.int32()))
        t = t.append_column("round", pa.array(out_round, pa.int32()))
        return t


def make_probe_filter(handles):
    """map_batches task fn: drop urls the bloom filter reports seen."""

    def probe_filter(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if not urls:
            return batch
        seen = ShardedSeenFilter(handles).probe(urls)
        return batch.filter(pa.array([not s for s in seen]))

    return probe_filter


def make_mark_seen(handles):
    """map_batches task fn: mark every url seen (idempotent bit-OR)."""

    def mark_seen(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if urls:
            ShardedSeenFilter(handles).set_seen(urls)
        return batch

    return mark_seen


def _frontier_dedup(frontier: ray.data.Dataset) -> ray.data.Dataset:
    """Dedup candidates by url: max priority, min depth (host rederived)."""
    from ray.data.aggregate import Max, Min

    agg = frontier.groupby("url").aggregate(
        Max("priority", alias_name="priority"), Min("depth", alias_name="depth")
    )

    def add_host(t: pa.Table) -> pa.Table:
        hosts = pa.array([host_of(u) for u in t["url"].to_pylist()], pa.string())
        return t.append_column("host", hosts)

    return agg.map_batches(add_host, batch_format="pyarrow")


def _make_admit_fn(handles, round_id: int, salt_truncated: bool):
    def admit(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            g = g.assign(status=pd.Series(dtype=object))
            return g
        host = g["host"].iloc[0]
        g = g.sort_values(["priority", "url"], ascending=[False, True])
        shard = politeness_shard_of(host, len(handles))
        admitted, deferred, denied = ray.get(
            handles[shard].admit.remote(round_id, host, g["url"].tolist())
        )
        status = {}
        for u in admitted:
            status[u] = "admit"
        for u in deferred:
            status[u] = "defer"
        for u in denied:
            status[u] = "deny"
        g = g.assign(status=g["url"].map(status))
        return g

    return admit


def _make_salt_truncate_fn(capacity: int, deny: Dict[str, List[str]]):
    """Per (host, salt) bucket: robots-deny locally, keep top-capacity
    by (priority desc, url); the rest is deferred without touching the
    politeness actor (global top-capacity ⊆ union of bucket top-capacity)."""

    def truncate(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g.assign(status=pd.Series(dtype=object)).drop(columns=["salt"])
        host = g["host"].iloc[0]
        prefixes = tuple(deny.get(host, ()))
        g = g.sort_values(["priority", "url"], ascending=[False, True])
        denied_mask = (
            g["url"].map(lambda u: any(u.startswith(p) for p in prefixes))
            if prefixes
            else pd.Series(False, index=g.index)
        )
        denied = g[denied_mask].assign(status="deny")
        ok = g[~denied_mask]
        kept = ok.head(capacity).assign(status=None)
        deferred = ok.iloc[capacity:].assign(status="defer")
        return pd.concat([kept, deferred, denied]).drop(columns=["salt"])

    return truncate


_EMPTY_FRONTIER = pa.table(
    {
        "url": pa.array([], pa.string()),
        "host": pa.array([], pa.string()),
        "priority": pa.array([], pa.float64()),
        "depth": pa.array([], pa.int32()),
    }
)


def _schedule_round_driver(
    frontier_table: pa.Table, bloom, politeness, config: CrawlConfig, round_id: int
):
    """Driver fast path for round scheduling (dedup → bloom probe →
    per-host admission → global sort + budget split).  Identical
    semantics to the distributed path; actor calls are batched and
    issued in parallel across shards."""
    # dedup by url keeping max priority / min depth; host rides along
    # ("min" of identical values) so it is never recomputed per row
    agg = frontier_table.group_by("url").aggregate(
        [("priority", "max"), ("depth", "min"), ("host", "min")]
    )
    urls = agg["url"].to_pylist()
    prios = agg["priority_max"].to_pylist()
    depths = agg["depth_min"].to_pylist()
    hosts = agg["host_min"].to_pylist()

    seen = ShardedSeenFilter(bloom).probe(urls) if urls else []

    by_host: Dict[str, list] = {}
    info = {}
    for u, p, d, h, s in zip(urls, prios, depths, hosts, seen):
        if not s:
            info[u] = (p, d, h)
            by_host.setdefault(h, []).append((u, p))
    # parallel batched admission: one in-flight call per host
    futs = {}
    for host, rows in by_host.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        shard = politeness_shard_of(host, len(politeness))
        futs[host] = politeness[shard].admit.remote(
            round_id, host, [r[0] for r in rows]
        )
    results = dict(zip(futs.keys(), ray.get(list(futs.values()))))

    admitted, deferred = [], []
    n_denied = 0
    for host, (adm, dfr, den) in results.items():
        admitted.extend((u, *info[u]) for u in adm)
        deferred.extend((u, *info[u]) for u in dfr)
        n_denied += len(den)

    admitted.sort(key=lambda r: (-r[1], r[0]))
    n_admitted = len(admitted)
    fetch_rows = admitted[: config.round_budget]
    deferred.extend(admitted[config.round_budget :])

    def to_table(rows) -> pa.Table:
        if not rows:
            return _EMPTY_FRONTIER
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "host": pa.array([r[3] for r in rows], pa.string()),
                "priority": pa.array([r[1] for r in rows], pa.float64()),
                "depth": pa.array([r[2] for r in rows], pa.int32()),
            }
        )

    fetch_tbl = to_table(fetch_rows)
    if fetch_tbl.num_rows:
        ShardedSeenFilter(bloom).set_seen(fetch_tbl["url"].to_pylist())
    return fetch_tbl, to_table(deferred), n_denied, n_admitted


def _schedule_round_distributed(
    frontier_table: pa.Table, bloom, politeness, config: CrawlConfig, round_id: int
):
    """Distributed round scheduling: Dataset groupby dedup, bloom-probe
    map_batches, groupby(host) admission (with optional salted
    pre-truncation), distributed sort + split_at_indices.  This is the
    10^10-frontier path; rounds under ``driver_threshold`` use the
    driver fast path instead."""
    frontier = ray.data.from_arrow(frontier_table)
    candidates = _frontier_dedup(frontier)
    unseen = candidates.map_batches(make_probe_filter(bloom), batch_format="pyarrow")

    cols = ["url", "host", "priority", "depth", "status"]
    if config.hot_host_salt > 1:

        def add_salt(t: pa.Table) -> pa.Table:
            salts = pa.array(
                [
                    stable_hash64("hostsalt", u) % config.hot_host_salt
                    for u in t["url"].to_pylist()
                ],
                pa.int32(),
            )
            return t.append_column("salt", salts)

        pre = (
            unseen.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["host", "salt"])
            .map_groups(
                _make_salt_truncate_fn(config.capacity, config.deny),
                batch_format="pandas",
            )
        )
        to_admit = pre.map_batches(
            lambda t: t.filter(pc.is_null(t["status"])).drop_columns(["status"]),
            batch_format="pyarrow",
        )
        pre_decided = pre.map_batches(
            lambda t: t.filter(pc.is_valid(t["status"])).select(cols),
            batch_format="pyarrow",
        )
        admitted_all = (
            to_admit.groupby("host")
            .map_groups(_make_admit_fn(politeness, round_id, True), batch_format="pandas")
            .select_columns(cols)
            .union(pre_decided)
        )
    else:
        admitted_all = (
            unseen.groupby("host")
            .map_groups(_make_admit_fn(politeness, round_id, False), batch_format="pandas")
            .select_columns(cols)
        )

    admitted_all = admitted_all.materialize()

    def status_eq(s):
        return lambda t: t.filter(pc.equal(t["status"], s)).drop_columns(["status"])

    admitted = admitted_all.map_batches(status_eq("admit"), batch_format="pyarrow")
    deferred_ds = admitted_all.map_batches(status_eq("defer"), batch_format="pyarrow")
    n_denied = admitted_all.map_batches(
        status_eq("deny"), batch_format="pyarrow"
    ).count()

    admitted_sorted = admitted.sort(
        ["priority", "url"], descending=[True, False]
    ).materialize()
    n_admitted = admitted_sorted.count()
    if n_admitted > config.round_budget:
        fetch_ds, over_budget = admitted_sorted.split_at_indices([config.round_budget])
    else:
        fetch_ds, over_budget = admitted_sorted, None

    fetch_tbl = pa.Table.from_pandas(fetch_ds.to_pandas(), preserve_index=False)
    if fetch_tbl.num_rows:
        fetch_tbl = fetch_tbl.cast(FRONTIER_SCHEMA)
        # distributed seen-marking before fetch
        ray.data.from_arrow(fetch_tbl).map_batches(
            make_mark_seen(bloom), batch_format="pyarrow"
        ).materialize()
    else:
        fetch_tbl = _EMPTY_FRONTIER

    deferred_parts = [pa.Table.from_pandas(deferred_ds.to_pandas(), preserve_index=False)]
    if over_budget is not None:
        deferred_parts.append(
            pa.Table.from_pandas(over_budget.to_pandas(), preserve_index=False)
        )
    deferred_parts = [t.cast(FRONTIER_SCHEMA) for t in deferred_parts if t.num_rows]
    deferred_tbl = (
        pa.concat_tables(deferred_parts) if deferred_parts else _EMPTY_FRONTIER
    )
    return fetch_tbl, deferred_tbl, n_denied, n_admitted


def crawl(
    store_dir: str,
    seeds: pa.Table,
    entities_ref,
    out_dir: str,
    config: CrawlConfig,
    *,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    store_refs=None,
) -> Dict:
    """Run the crawl to frontier exhaustion.  Returns metrics.

    ``seeds``: (url, priority).  ``entities_ref``: ray.put of
    sources.docs.entities_index output.  Output: combined page rows
    under ``out_dir/round=r/`` + ``fetch_log`` parquet per round."""
    from ..state.checkpoint import latest_round, load_checkpoint, save_checkpoint

    os.makedirs(out_dir, exist_ok=True)

    if config.seen_filter == "cuckoo":
        from ..state.cuckoo import CuckooShardActor

        bloom = [CuckooShardActor.remote() for _ in range(config.num_bloom_shards)]
    else:
        bloom = [
            BloomShardActor.remote(config.bloom_bits)
            for _ in range(config.num_bloom_shards)
        ]
    pol_cfg = {
        "capacity": config.capacity,
        "refill": config.refill,
        "deny": config.deny,
        "budget": config.host_budget,
    }
    politeness = [
        PolitenessShardActor.remote(pol_cfg)
        for _ in range(config.num_politeness_shards)
    ]

    start_round = 0
    frontier_table: pa.Table
    if resume and ckpt_dir is not None and latest_round(ckpt_dir) is not None:
        state = load_checkpoint(ckpt_dir)
        start_round = state["round"] + 1
        frontier_table = state["frontier"]
        ShardedSeenFilter(bloom).restore(state["bloom"])
        ray.get(
            [h.restore.remote(s) for h, s in zip(politeness, state["politeness"])]
        )
    else:
        urls = seeds["url"].to_pylist()
        frontier_table = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array([host_of(u) for u in urls], pa.string()),
                "priority": seeds["priority"],
                "depth": pa.array([0] * len(urls), pa.int32()),
            }
        )

    # optional plasma preload: one copy of each partition in the
    # object store, mapped zero-copy by every fetch worker (callers may
    # pass prebuilt ``store_refs`` to reuse a warm store across crawls)
    _store_refs_local = None
    if store_refs is None and config.preload_store:
        _store_refs_local = preload_doc_store(store_dir, config.doc_store_partitions)
        store_refs = ray.put(_store_refs_local)

    # spin up the state actors before round 0 (first .remote on a fresh
    # actor pays process startup; do it once, in parallel)
    ray.get(
        [h.probe.remote([]) for h in bloom]
        + [h.admit.remote(-1, "__warm__", []) for h in politeness]
    )

    metrics: Dict = {"rounds": [], "urls_fetched": 0, "pages_extracted": 0}
    t_start = time.time()

    for round_id in range(start_round, config.max_rounds):
        if frontier_table.num_rows == 0:
            break
        t_round = time.time()
        phase_t: Dict[str, float] = {}

        def _mark(name: str, since=[time.time()]):
            now = time.time()
            phase_t[name] = round(now - since[0], 3)
            since[0] = now

        # scheduling: dedup → probe → admission → sort + budget split
        # (driver fast path for small rounds, distributed otherwise),
        # then the fetch set is marked seen
        if frontier_table.num_rows <= config.driver_threshold:
            fetch_tbl, deferred_tbl, n_denied, n_admitted = _schedule_round_driver(
                frontier_table, bloom, politeness, config, round_id
            )
        else:
            fetch_tbl, deferred_tbl, n_denied, n_admitted = (
                _schedule_round_distributed(
                    frontier_table, bloom, politeness, config, round_id
                )
            )
        _mark("schedule")

        # fetch log (crawl-ordering parity artifact)
        log_dir = os.path.join(out_dir, "fetch_log")
        os.makedirs(log_dir, exist_ok=True)
        log_tbl = fetch_tbl.append_column(
            "rank", pa.array(range(fetch_tbl.num_rows), pa.int64())
        ).append_column(
            "round", pa.array([round_id] * fetch_tbl.num_rows, pa.int32())
        )
        pq.write_table(log_tbl, os.path.join(log_dir, f"round_{round_id}.parquet"))
        _mark("log")

        if fetch_tbl.num_rows:
            # one Arrow slice per fetch batch: from_arrow with a single
            # table would yield ONE block → ONE serial map task
            with_round = fetch_tbl.append_column(
                "round", pa.array([round_id] * fetch_tbl.num_rows, pa.int32())
            )
            step = config.fetch_batch_size
            slices = [
                with_round.slice(i, step)
                for i in range(0, with_round.num_rows, step)
            ]
            fetch_in = ray.data.from_arrow(slices)

            # ONE fused execution per round: fetch + extract + write the
            # page parquet from inside the task (deterministic file name
            # per batch → a retried task overwrites its own file, never
            # duplicates) + per-batch link/count partial aggregates as
            # the task's (tiny) return value.  Collapsing the former
            # fetch/write/count/links executions into one map removes
            # ~4 streaming-executor launches of fixed latency per round.
            round_dir = os.path.join(out_dir, f"round={round_id}")
            os.makedirs(round_dir, exist_ok=True)
            max_depth = config.max_depth
            entity_bonus = config.entity_bonus

            def fetch_extract_fused(batch: pa.Table) -> pa.Table:
                out = FetchExtract(
                    store_dir, config.doc_store_partitions, entities_ref, store_refs
                )(batch)
                pages = out.drop_columns(["out_links", "fetched", "depth"])
                fname = hashlib.blake2b(
                    ("\x1f".join(batch["url"].to_pylist())).encode("utf-8"),
                    digest_size=10,
                ).hexdigest()
                pq.write_table(pages, os.path.join(round_dir, f"{fname}.parquet"))

                col = out["out_links"].combine_chunks()
                parent = pc.list_parent_indices(col)
                flat = pc.list_flatten(col)
                depths = pc.take(out["depth"], parent)
                links = pa.table(
                    {
                        "target": pc.struct_field(flat, "target"),
                        "is_entity": pc.cast(pc.struct_field(flat, "is_entity"), pa.int8()),
                        "src_depth": depths,
                    }
                ).filter(pc.less(depths, pa.scalar(max_depth, pa.int32())))
                # partial aggregate within the batch; target host is
                # computed HERE (distributed) so the driver merge never
                # hashes urls
                agg = links.group_by("target").aggregate(
                    [("target", "count"), ("is_entity", "max"), ("src_depth", "min")]
                )
                agg = agg.append_column(
                    "host",
                    pa.array([host_of(u) for u in agg["target"].to_pylist()], pa.string()),
                )
                nf = pc.sum(pc.cast(out["fetched"], pa.int64())).as_py() or 0
                stats = pa.table(
                    {
                        "target": pa.array([None], pa.string()),
                        "target_count": pa.array([nf], pa.int64()),
                        "is_entity_max": pa.array([0], pa.int8()),
                        "src_depth_min": pa.array([0], pa.int32()),
                        "host": pa.array([""], pa.string()),
                    }
                )
                agg = agg.select(
                    ["target", "target_count", "is_entity_max", "src_depth_min", "host"]
                ).cast(stats.schema)
                return pa.concat_tables([agg, stats], promote_options="default")

            fused_parts = ray.get(
                fetch_in.map_batches(
                    fetch_extract_fused,
                    batch_format="pyarrow",
                    batch_size=config.fetch_batch_size,
                    num_cpus=1,
                ).to_arrow_refs()
            )
            fused = pa.concat_tables(fused_parts, promote_options="default")
            _mark("fetch_extract")

            stats_mask = pc.is_null(fused["target"])
            n_fetched = int(
                pc.sum(fused.filter(stats_mask)["target_count"]).as_py() or 0
            )
            n_missing = fetch_tbl.num_rows - n_fetched

            partials = fused.filter(pc.invert(stats_mask))
            _merged = partials.group_by("target").aggregate(
                [
                    ("target_count", "sum"),
                    ("is_entity_max", "max"),
                    ("src_depth_min", "min"),
                    ("host", "min"),
                ]
            )
            links_tbl = pa.table(
                {
                    "target": _merged["target"],
                    "target_count": _merged["target_count_sum"],
                    "is_entity_max": _merged["is_entity_max_max"],
                    "src_depth_min": _merged["src_depth_min_min"],
                    "host": _merged["host_min"],
                }
            )
            if links_tbl.num_rows:
                la = links_tbl
                prio = pc.add(
                    pc.cast(la["target_count"], pa.float64()),
                    pc.multiply(
                        pc.cast(la["is_entity_max"], pa.float64()),
                        pa.scalar(config.entity_bonus, pa.float64()),
                    ),
                )
                new_frontier = pa.table(
                    {
                        "url": la["target"],
                        "host": la["host"],
                        "priority": prio,
                        "depth": pc.cast(
                            pc.add(la["src_depth_min"], pa.scalar(1, pa.int32())),
                            pa.int32(),
                        ),
                    }
                )
            else:
                new_frontier = None
            _mark("links")
        else:
            n_fetched = 0
            n_missing = 0
            new_frontier = None

        # next frontier = deferred (politeness + over-budget) ∪ new links
        parts = [t for t in (deferred_tbl, new_frontier) if t is not None and t.num_rows]
        frontier_candidates = frontier_table.num_rows
        frontier_table = (
            pa.concat_tables(parts).cast(FRONTIER_SCHEMA) if parts else _EMPTY_FRONTIER
        )

        metrics["urls_fetched"] += fetch_tbl.num_rows
        metrics["pages_extracted"] += n_fetched
        metrics["rounds"].append(
            {
                "round": round_id,
                "candidates": frontier_candidates,
                "admitted": n_admitted,
                "fetched": fetch_tbl.num_rows,
                "extracted": n_fetched,
                "fetch_misses": n_missing,
                "robots_denied": n_denied,
                "deferred": deferred_tbl.num_rows,
                "new_frontier": frontier_table.num_rows,
                "sec": round(time.time() - t_round, 3),
                "phases": phase_t,
            }
        )

        if ckpt_dir is not None:
            save_checkpoint(
                ckpt_dir,
                round_id,
                frontier_table,
                ShardedSeenFilter(bloom).snapshot(),
                ray.get([h.snapshot.remote() for h in politeness]),
            )

    metrics["wall_sec"] = round(time.time() - t_start, 3)
    metrics["urls_per_sec"] = round(
        metrics["urls_fetched"] / max(metrics["wall_sec"], 1e-9), 2
    )
    for h in bloom + politeness:
        ray.kill(h)
    return metrics
