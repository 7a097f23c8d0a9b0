"""Extension operators for LLM-data pipelines (SURVEY §2.6 X-ops).

No reference implementation exists (the reference only *recognizes*
CORTEX calls and routes them to the cloud, `auto_router.py:78-84`);
these are designed Spark-first for 100 TB scale:

- dedup: exact, MinHash+LSH (+ measured sketch accuracy), SimHash,
  n-gram Jaccard, embedding cosine, connected-components clustering,
  benchmark decontamination, boilerplate common-shingle stats,
  exact duplicate-span removal
- similarity: brute-force cosine top-k + LSH/IVF scale paths,
  SemDeDup semantic dedup (k-means-bounded within-cell pruning)
- text: language-ID, quality scoring + Gopher/C4 rule-tagged corpus
  filtering, token stats, fingerprinting, sequence packing,
  repetition filters, PII/URL scrubbing, document chunking, corpus
  n-gram stats
- temporal: as-of and range joins
- dedup extras: C4 line-level corpus dedup, S-curve LSH tuning
- sampling: deterministic hash samples/splits, domain mixing (row- or
  token-weighted), Efraimidis–Spirakis weighted sampling without
  replacement, DSIR importance resampling, epoch shuffle, scalable
  global row positions
- dataset: hash-balanced sharded export + integrity manifest
  (recompute-and-diff verification)
- profile: per-stratum numeric distribution profiling
- skew: salted joins + hot-key diagnostics
- multimodal: binary columns, media header probing, decode plumbing
- imaging: REAL PNG codec (pure numpy/zlib) — decoded pixel stats,
  dHash perceptual near-dup via hamming-LSH with hot-bucket bounds
- audio: REAL PCM WAV codec — RMS/peak/crossings DSP from actual
  samples, sample-aligned segmentation re-emitting valid WAVs
- llm: CORTEX-shaped model-call columns (pluggable endpoint,
  stubbed), schema-constrained extraction with repair-retry
"""

from . import (
    audio,
    dataset,
    dedup,
    imaging,
    llm,
    multimodal,
    profile,
    sampling,
    similarity,
    skew,
    temporal,
    text,
)

__all__ = [
    "audio",
    "dataset",
    "dedup",
    "imaging",
    "llm",
    "multimodal",
    "profile",
    "sampling",
    "similarity",
    "skew",
    "temporal",
    "text",
]
