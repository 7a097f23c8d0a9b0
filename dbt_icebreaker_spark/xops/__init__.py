"""Extension operators for LLM-data pipelines (SURVEY §2.6 X1–X4).

No reference implementation exists (the reference only *recognizes*
CORTEX calls and routes them to the cloud, `auto_router.py:78-84`);
these are designed Spark-first for 100 TB scale:

- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine
- similarity: brute-force cosine top-k + LSH-bucketed scale path
- text: language-ID, quality scoring, token stats, fingerprinting
- multimodal: binary columns + Pandas-UDF decode plumbing (stubbed)
- llm: CORTEX-shaped model-call columns (pluggable endpoint, stubbed)
"""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
