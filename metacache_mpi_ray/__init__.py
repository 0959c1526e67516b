"""metacache_mpi_ray — a Ray-Data-native near-duplicate detection engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference MetaCache-MPI engine (/root/reference), retargeted per
BASELINE.json at near-duplicate detection + clustering over
Common-Crawl-style web pages:

    pages (url, warc_ts, html, text, lang)
      -> HTML->text extraction + normalization      (map_batches, Arrow)
      -> w-shingling + 128-perm MinHash signatures  (map_batches, NumPy)
      -> LSH band hashing -> candidate buckets      (sort-shuffle by band hash)
      -> candidate pair verification                (signature joins)
      -> union-find connected components            (driver / label propagation)
      -> clusters (doc_id, cluster_id, is_dup)

The reference's structural skeleton (documents -> sketches -> inverted
index -> candidate merge -> classification; see SURVEY.md) maps stage by
stage, but the execution engine is Ray Data streaming execution, not MPI.

IMPORTANT: library code never calls ray.init()/ray.shutdown(); the
driver / bench / test fixture own the Ray session.
"""

from metacache_mpi_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
