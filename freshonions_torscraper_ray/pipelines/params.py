"""Shared gate/parameter constants for query kernels AND their SQL twins.

Every constant that appears both in a Ray pipeline (queries.py /
stages/*) and in its DuckDB oracle twin (oracle_sqls.py) lives HERE and
is interpolated into the twin SQL f-strings — never restated as a
literal — so editing one side cannot silently turn an exactness gate
into a false failure (or a vacuous pass if both drift together).
"""

from __future__ import annotations

# corpus_curate gates (queries.q_corpus_curate / twin join)
CURATE_PPL_MAX = 30.5
CURATE_ENT_MIN = 2.7
CURATE_MIN_TOKENS = 10

# fixed-point k-means (kmeans_clusters / semdedup twins' unrolled CTEs)
KMEANS_K = 4
KMEANS_ITERS = 3

# SemDeDup within-cluster dominance threshold
SEMDEDUP_TAU = 0.3

# DSIR Gumbel-top-k resample size
DSIR_SAMPLE_K = 100

# PMI collocation min bigram count
PMI_MIN_COUNT = 5

# embedding near-dup (LSH + exact anchor) cosine threshold / LSH width
EMB_DEDUP_THRESHOLD = 0.3
EMB_LSH_NBITS = 6
EMB_LSH_SEED = 42

# IVF ANN (exact fixed-point variant): lists, probes, result size
IVF_K = 8
IVF_NPROBE = 3
IVF_TOPK = 10

# global shuffled-shard export: rows per training shard + permutation seed
SHARD_ROWS = 64
SHUFFLE_SEED = 42

# Gopher-style quality rule set (gopher_rules kernel + twin)
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MEAN_LEN_MIN = 3.0
GOPHER_MEAN_LEN_MAX = 10.0
GOPHER_UNIQ_MIN = 0.5
GOPHER_MIN_STOPWORDS = 1

# CCNet-style per-language perplexity buckets (head/middle/tail)
CCNET_NBUCKETS = 3

# interleaved multimodal sequence packing: per-modality token costs +
# sequence token budget (spans_pack kernel + twin)
PACK_SEQ_BUDGET = 512
PACK_IMG_TOKENS = 64
PACK_VIDEO_TOKENS = 256
PACK_AUDIO_TOKENS = 128

# corpus self-kNN graph over embeddings
KNN_GRAPH_K = 5
