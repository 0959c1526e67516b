"""Degenerate inputs: empty corpus, empty/short texts, single doc."""

import pyarrow as pa
import ray.data as rd

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.pipelines.dedup import near_dup_pipeline
from metacache_mpi_ray.stages.ingest import ingest_documents

CFG = DedupConfig()


def _docs(texts):
    return ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
        )
    )


def test_empty_corpus():
    res = near_dup_pipeline(_docs([]), CFG, num_partitions=2)
    assert res.clusters.count() == 0
    assert res.verified_edges.count() == 0


def test_single_doc():
    cl = near_dup_pipeline(_docs(["just one document here"]), CFG, num_partitions=2).clusters.to_pandas()
    assert len(cl) == 1
    assert not cl["is_dup"].iloc[0]
    assert cl["cluster_id"].iloc[0] == cl["doc_id"].iloc[0]


def test_short_and_empty_texts():
    texts = ["", "a", "ab", "x" * 5, "a normal length document " * 10, "", "a"]
    cl = near_dup_pipeline(_docs(texts), CFG, num_partitions=2).clusters.to_pandas()
    assert len(cl) == len(texts)
    m = cl.set_index("doc_id")["cluster_id"]
    # identical short texts (whole-text fallback shingle) cluster together
    assert m[0] == m[5]  # both ""
    assert m[1] == m[6]  # both "a"
    assert m[0] != m[1]


def test_all_identical_docs():
    texts = ["the same exact document body repeated " * 5] * 20
    cl = near_dup_pipeline(_docs(texts), CFG, num_partitions=2).clusters.to_pandas()
    assert cl["cluster_id"].nunique() == 1
    assert cl["is_dup"].all()
