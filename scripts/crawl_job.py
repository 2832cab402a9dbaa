"""`ray job submit` entrypoint for the crawl engine — the deployment
surface the north rule names (BASELINE.json :: north_rule: "run via
ray job submit on a fixed-size multi-node Ray cluster").

On a cluster:

    ray job submit --working-dir . -- \
        python scripts/crawl_job.py --web-dir /data/web --store-dir /data/store \
            --max-rounds 64 --enrich --resume

`ray job submit` exports RAY_ADDRESS into the driver process, so the
guarded ray.init below attaches to the submitting cluster; run locally
(no RAY_ADDRESS) it falls back to a single-node session. This script —
like bench.py and the test fixture — OWNS its Ray session; the library
never calls ray.init (driver contract).

Prints exactly one JSON metrics line on stdout (logs go to stderr), so
`ray job logs`/CI can parse the result; exits 0 on success.

Resumability: with --resume and a store_dir holding committed rounds,
the engine restores actor state from the latest checkpoint and replays
deterministically (pipelines/crawl.py::CrawlEngine.resume); without it
the store is fenced and the crawl starts fresh. The resumed run must
pass the IDENTICAL config flags — the engine fingerprints the full
CrawlConfig into every checkpoint manifest and refuses a mismatched
resume loudly (ordering determinism contract), so "resume with more
rounds" is a fresh run, not a resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python scripts/crawl_job.py` puts scripts/ (not the repo root) on
# sys.path; a `ray job submit --working-dir .` driver needs the package
# importable without an external PYTHONPATH
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--web-dir", required=True, help="synthetic web / content-store dir (meta.json + documents/)")
    p.add_argument("--store-dir", required=True, help="round-store output dir (created if missing)")
    p.add_argument("--resume", action="store_true", help="resume from the latest committed checkpoint if one exists")
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--domain-cap", type=int, default=None, help="per-round per-domain fetch cap")
    p.add_argument("--budget", type=int, default=None, help="lifetime page budget per domain")
    p.add_argument("--scheduler-shards", type=int, default=None)
    p.add_argument("--cuckoo-shards", type=int, default=None)
    p.add_argument("--checkpoint-interval", type=int, default=None)
    p.add_argument("--enrich", action="store_true", help="per-page language-ID + quality + simhash enrichment")
    p.add_argument("--index-text", action="store_true", help="incremental search-index sink per round")
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # under `ray job submit`, RAY_ADDRESS points at the cluster; bare
        # local runs get a single-node session
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )

    from freshonions_torscraper_ray.config import CrawlConfig
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    overrides = {
        "max_rounds": args.max_rounds,
        "per_round_domain_cap": args.domain_cap,
        "max_pages_per_domain": args.budget,
        "num_scheduler_shards": args.scheduler_shards,
        "num_cuckoo_shards": args.cuckoo_shards,
        "checkpoint_interval": args.checkpoint_interval,
    }
    cfg_kwargs = {k: v for k, v in overrides.items() if v is not None}
    if args.enrich:
        cfg_kwargs["enrich"] = True
    if args.index_text:
        cfg_kwargs["index_text"] = True
    cfg = CrawlConfig(**cfg_kwargs)

    os.makedirs(args.store_dir, exist_ok=True)
    t0 = time.monotonic()
    eng = CrawlEngine(args.web_dir, args.store_dir, cfg)
    stats = eng.run(resume=args.resume)
    sec = time.monotonic() - t0
    eng.shutdown()

    out = {
        "rounds": stats["rounds"],
        "fetched_total": stats["fetched_total"],
        "fetched_this_run": stats["fetched_this_run"],
        "seconds": round(sec, 3),
        "urls_per_sec": round(stats["fetched_this_run"] / sec, 1) if sec > 0 else 0.0,
        "resumed": stats["resumed"],  # the engine's actual outcome
        "store_dir": args.store_dir,
    }
    print(json.dumps(out))
    if owns_session:
        ray.shutdown()
    return out


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # metrics line goes to stdout only on success; failures surface
        # the traceback on stderr for `ray job logs`
        import traceback

        traceback.print_exc()
        sys.exit(1)
