"""freshonions_torscraper_ray — a Ray-Data-native crawl/frontier engine.

A from-scratch rebuild (NOT a port) of the data-processing capabilities of
the public ``dirtyfilthy/freshonions-torscraper`` Tor hidden-service
crawler, re-expressed as Ray Data pipelines:

- URL frontier + fetch scheduler: sharded cuckoo-filter URL-seen set and
  per-domain politeness/priority queues held in Ray actor pools
  (``state/``), feeding ``map_batches`` fetch-and-extract stages over
  zero-copy Arrow batches of interleaved text+media span documents
  (``stages/``).
- Fetching is a deterministic replay over a seeded synthetic onion web
  (``synth.py``) — this sandbox has no network/Tor; the content store IS
  the web.
- Durable state lives in a versioned parquet store with Lance-style
  atomic round commits (``store.py``; flip to real Lance on a cluster
  where the package exists).
- Correctness is pinned by a single-threaded semantic oracle
  (``oracle.py``) plus DuckDB oracle SQL twins for every SQL-expressible
  operator (``pipelines/queries.py``).

See SURVEY.md for the operator inventory this package covers.
"""

__version__ = "0.1.0"
