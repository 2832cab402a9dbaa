#!/usr/bin/env python
"""Same-box parallel ceiling of the EXACT production fetch kernel (no Ray).

Process p of P owns content-store buckets {b : b % P == p} of the bench
web; its workload is every doc in those buckets run through the exact
FetchWorker.process body (FetchExtract in KERNEL_ROWS chunks +
_merge_candidates + derive_round_tables(enrich=True)). Total work across
processes is the whole web at ANY P, so aggregate urls/s at two widths
is the machine's shared-resource ceiling for THIS workload — the
normalizer for the sandbox N-vs-4N scaling proxy (a real N->4N *node*
comparison runs each node at identical width both times, so this
per-box term does not exist there; see BENCH/BASELINE.md).

Usage: python scripts/kernel_ceiling.py [web_dir] [P,P,...]
Defaults: the 100k-domain span_scale=6 scaling web, widths 4,16.
"""
import glob
import multiprocessing as mp
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WEB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/onionray_bench_web_100000_s6"
N_BUCKETS = 512


def worker(p_idx: int, P: int, barrier, q) -> None:
    from freshonions_torscraper_ray.config import CrawlConfig
    from freshonions_torscraper_ray.stages.fetch import (
        KERNEL_ROWS,
        FetchExtract,
        _merge_candidates,
        derive_round_tables,
    )

    cfg = CrawlConfig(
        per_round_domain_cap=200,
        max_rounds=8,
        max_pages_per_domain=200,
        num_scheduler_shards=8,
        num_cuckoo_shards=8,
        checkpoint_interval=8,
        enrich=True,
    )
    fe = FetchExtract(WEB + "/documents", N_BUCKETS, cfg)
    fe.store.MAX_CACHED_BUCKETS = N_BUCKETS + 1

    my_buckets = [b for b in range(N_BUCKETS) if b % P == p_idx]
    files = [f for b in my_buckets for f in glob.glob(f"{WEB}/documents/bucket={b}/*.parquet")]
    ids = pa.concat_tables([pq.read_table(f, columns=["doc_id"]) for f in files])["doc_id"]
    urls = ids.to_pylist()
    doms = [u.split("/")[2] for u in urls]
    n = len(urls)
    block = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "domain": pa.array(doms, pa.string()),
            "depth": pa.array(np.zeros(n, np.int32)),
            "priority": pa.array(np.zeros(n, np.float32)),
            "discovered_seq": pa.array(np.arange(n, dtype=np.int64)),
            "vtime": pa.array(np.zeros(n, np.float64)),
            "retries": pa.array(np.zeros(n, np.int32)),
            "fetch_order": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    fe(block.slice(0, 64))  # warm: kernel compile paths outside the timed region
    barrier.wait()
    t0w, t0c = time.perf_counter(), time.process_time()
    cand_acc: list = []
    out: dict = {}
    for s in range(0, n, KERNEL_ROWS):
        wide = fe(block.slice(s, KERNEL_ROWS))
        _merge_candidates(wide, cfg, 1, cand_acc)
        for name, t in derive_round_tables(wide, 1, enrich=True, index_text=False).items():
            out.setdefault(name, []).append(t)
    q.put((n, time.perf_counter() - t0w, time.process_time() - t0c))


def run(P: int) -> None:
    q = mp.Queue()
    barrier = mp.Barrier(P)
    procs = [mp.Process(target=worker, args=(i, P, barrier, q)) for i in range(P)]
    for pr in procs:
        pr.start()
    res = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    rows = sum(r[0] for r in res)
    walls = sorted(r[1] for r in res)
    cpu_tot = sum(r[2] for r in res)
    print(
        f"P={P:2d} rows={rows} wall_med={walls[len(walls) // 2]:.1f}s wall_max={walls[-1]:.1f}s "
        f"cpu_tot={cpu_tot:.0f}s cpu_ms_per_url={cpu_tot / rows * 1000:.3f} "
        f"agg_urls_per_s={rows / walls[-1]:.0f}",
        flush=True,
    )


if __name__ == "__main__":
    if not os.path.isdir(WEB):
        sys.exit(f"bench web not found: {WEB} (run bench.py once to build it)")
    for P in [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "4,16").split(",")]:
        run(P)
