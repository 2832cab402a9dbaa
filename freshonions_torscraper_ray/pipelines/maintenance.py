"""Maintenance cycle jobs (SURVEY §3.2): portscan, ssh fingerprints,
alive re-check, purge — the reference's cron side-cars re-expressed as
small bounded Dataset jobs over the crawl output.

Probes are deterministic replays against the synthetic universe (the
profile function is the "network"); on a real deployment the probe body
is a socket scan / ssh key exchange, and everything around it — the
broadcast universe handle, per-batch vectorized probing, groupby rollups,
filter-out purge writes — is unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..synth import domain_profile

OPEN_PORTS_SCHEMA = pa.schema([("domain", pa.string()), ("port", pa.int32())])
SSH_FP_SCHEMA = pa.schema([("domain", pa.string()), ("fingerprint", pa.string())])


def build_universe_probe(seed: int, n_domains: int) -> dict[str, dict]:
    """name → probe profile map (broadcast via ray.put at scale; the
    replay analogue of 'the network')."""
    out = {}
    for i in range(n_domains):
        p = domain_profile(seed, i, n_domains)
        out[p["domain"]] = {
            "ports": p["ports"],
            "ssh_fp": p["ssh_fp"],
            "soft404": p["soft404"],
            "server": p["server"],
            "powered_by": p["powered_by"],
        }
    return out


class HeaderProbe:
    """O9 header projections (reference Domain.server / Domain.powered_by,
    parsed from Server / X-Powered-By response headers): probe each
    domain's frontpage banner. Replay: the universe profile answers."""

    def __init__(self, universe_ref):
        import ray

        self.universe = ray.get(universe_ref) if not isinstance(universe_ref, dict) else universe_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        doms = batch["domain"].to_pylist()
        servers, powered = [], []
        for d in doms:
            prof = self.universe.get(d)
            servers.append(prof.get("server", "") if prof else "")
            powered.append(prof.get("powered_by", "") if prof else "")
        return pa.Table.from_arrays(
            [pa.array(doms, pa.string()), pa.array(servers, pa.string()), pa.array(powered, pa.string())],
            names=["domain", "server", "powered_by"],
        )


def header_banners(domains_ds, universe_ref, concurrency: int = 2):
    """O9: known domains → (domain, server, powered_by) projections."""
    return domains_ds.map_batches(
        HeaderProbe, fn_constructor_args=(universe_ref,), batch_format="pyarrow",
        batch_size=2048, concurrency=concurrency,
    )


class PortScanner:
    """Actor-pool stage: probe a batch of domains → open-port rows.

    ``__init__`` pulls the broadcast universe handle once per actor
    (real impl: opens its socket pool / rate limiter once)."""

    def __init__(self, universe_ref):
        import ray

        self.universe = ray.get(universe_ref) if not isinstance(universe_ref, dict) else universe_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        doms_out, ports_out = [], []
        for d in batch["domain"].to_pylist():
            prof = self.universe.get(d)
            for port in (prof["ports"] if prof else []):
                doms_out.append(d)
                ports_out.append(port)
        return pa.Table.from_arrays(
            [pa.array(doms_out, pa.string()), pa.array(ports_out, pa.int32())],
            schema=OPEN_PORTS_SCHEMA,
        )


class SshFingerprinter:
    """Actor-pool stage: domains with port 22 → host-key fingerprint rows."""

    def __init__(self, universe_ref):
        import ray

        self.universe = ray.get(universe_ref) if not isinstance(universe_ref, dict) else universe_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        doms_out, fps_out = [], []
        for d in batch["domain"].to_pylist():
            prof = self.universe.get(d)
            if prof and prof["ssh_fp"]:
                doms_out.append(d)
                fps_out.append(prof["ssh_fp"])
        return pa.Table.from_arrays(
            [pa.array(doms_out, pa.string()), pa.array(fps_out, pa.string())],
            schema=SSH_FP_SCHEMA,
        )


class Soft404Prober:
    """O16 soft-404 probe: request a deliberately nonexistent path per
    domain; a 200 answer marks the domain useful_404 (its 404s look like
    real pages — the reference cached this on Domain.useful_404*).
    Replay: the universe profile answers the probe."""

    def __init__(self, universe_ref):
        import ray

        self.universe = ray.get(universe_ref) if not isinstance(universe_ref, dict) else universe_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        doms = batch["domain"].to_pylist()
        flags = []
        for d in doms:
            prof = self.universe.get(d)
            flags.append(bool(prof and prof.get("soft404")))
        return pa.Table.from_arrays(
            [pa.array(doms, pa.string()), pa.array(flags, pa.bool_())],
            names=["domain", "useful_404"],
        )


def soft404_probe(domains_ds, universe_ref, concurrency: int = 2):
    """O16: per-domain soft-404 probe → useful_404 flags."""
    return domains_ds.map_batches(
        Soft404Prober, fn_constructor_args=(universe_ref,), batch_format="pyarrow",
        batch_size=2048, concurrency=concurrency,
    )


def portscan(domains_ds, universe_ref, concurrency: int = 2):
    """O(scan): known domains → open_ports table (reference OpenPort)."""
    return domains_ds.map_batches(
        PortScanner, fn_constructor_args=(universe_ref,), batch_format="pyarrow",
        batch_size=2048, concurrency=concurrency,
    )


def ssh_fingerprints(domains_ds, universe_ref, concurrency: int = 2):
    """SSH host-key harvest → ssh_fps table (reference SSHFingerprint)."""
    return domains_ds.map_batches(
        SshFingerprinter, fn_constructor_args=(universe_ref,), batch_format="pyarrow",
        batch_size=2048, concurrency=concurrency,
    )


def alive_recheck(pages_ds, content_lookup):
    """O32 alive re-check: re-probe previously dead URLs; emits
    (url, domain, was_status, now_up). Deterministic replay: a dead URL
    stays dead, but the operator (filter → probe → project) is the real
    shape; ``content_lookup(urls, domains) -> list[bool]``."""
    def recheck(t: pa.Table) -> pa.Table:
        dead = t.filter(pc.not_equal(t["status"], 200))
        urls = dead["url"].to_pylist()
        doms = dead["domain"].to_pylist()
        now_up = content_lookup(urls, doms)
        return pa.Table.from_arrays(
            [
                dead["url"].combine_chunks() if isinstance(dead["url"], pa.ChunkedArray) else dead["url"],
                dead["domain"].combine_chunks() if isinstance(dead["domain"], pa.ChunkedArray) else dead["domain"],
                dead["status"].combine_chunks() if isinstance(dead["status"], pa.ChunkedArray) else dead["status"],
                pa.array(now_up, pa.bool_()),
            ],
            names=["url", "domain", "was_status", "now_up"],
        )

    return pages_ds.map_batches(recheck, batch_format="pyarrow")


def purge_dead(domain_stats_ds):
    """O32 purge: drop domains with zero successful fetches (the
    reference's dead-after-N-days cron, with the replay's 'never alive'
    standing in for the age window); the filtered-out write IS the purge."""
    return domain_stats_ds.map_batches(
        lambda t: t.filter(t["is_up"]), batch_format="pyarrow"
    )
