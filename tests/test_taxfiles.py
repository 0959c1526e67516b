"""NCBI-style taxonomy dimension-file readers (sources/taxfiles.py) —
format parity with the reference's taxonomy_io.cpp parsers: nodes.dmp
prefix-of-13-columns reads, scientific-name selection, merger
remapping, root rank reset, accession2taxid header sniffing."""

import numpy as np
import pyarrow as pa
import pytest

from metacache_mpi_ray.sources.taxfiles import (
    load_ncbi_taxonomy,
    read_accession2taxid,
    read_merged_dmp,
    read_names_dmp,
    read_nodes_dmp,
)

# realistic NCBI taxdump shape: 13 fields per nodes row, readers take a prefix
_NODES = (
    "1\t|\t1\t|\tno rank\t|\t\t|\t8\t|\t0\t|\t1\t|\t0\t|\t0\t|\t0\t|\t0\t|\t0\t|\t\t|\n"
    "2\t|\t131567\t|\tsuperkingdom\t|\t\t|\t0\t|\t0\t|\t11\t|\t0\t|\t0\t|\t0\t|\t0\t|\t0\t|\t\t|\n"
    "9\t|\t32199\t|\tspecies\t|\tBA\t|\t0\t|\t1\t|\t11\t|\t1\t|\t0\t|\t1\t|\t1\t|\t0\t|\t\t|\n"
    "131567\t|\t1\t|\tno rank\t|\t\t|\t8\t|\t1\t|\t1\t|\t1\t|\t0\t|\t1\t|\t1\t|\t0\t|\t\t|\n"
    "32199\t|\t2\t|\tgenus\t|\t\t|\t0\t|\t1\t|\t11\t|\t1\t|\t0\t|\t1\t|\t0\t|\t0\t|\t\t|\n"
)
_NAMES = (
    "1\t|\tall\t|\t\t|\tsynonym\t|\n"
    "1\t|\troot\t|\t\t|\tscientific name\t|\n"
    "2\t|\tBacteria\t|\tBacteria <bacteria>\t|\tscientific name\t|\n"
    "2\t|\teubacteria\t|\t\t|\tgenbank common name\t|\n"
    "9\t|\tBuchnera aphidicola\t|\t\t|\tscientific name\t|\n"
    "131567\t|\tcellular organisms\t|\t\t|\tscientific name\t|\n"
)
_MERGED = "12\t|\t9\t|\n36\t|\t2\t|\n"


@pytest.fixture()
def taxdir(tmp_path):
    (tmp_path / "nodes.dmp").write_text(_NODES)
    (tmp_path / "names.dmp").write_text(_NAMES)
    (tmp_path / "merged.dmp").write_text(_MERGED)
    return tmp_path


def test_read_nodes_prefix_of_wide_rows(taxdir):
    t = read_nodes_dmp(str(taxdir / "nodes.dmp"))
    assert t.column_names == ["node_id", "parent_id", "rank"]
    got = {r["node_id"]: (r["parent_id"], r["rank"]) for r in t.to_pylist()}
    assert got[1] == (1, "no rank")
    assert got[2] == (131567, "superkingdom")
    assert got[9] == (32199, "species")


def test_read_names_scientific_only_first_wins(taxdir):
    t = read_names_dmp(str(taxdir / "names.dmp"))
    got = dict(zip(t["node_id"].to_pylist(), t["name"].to_pylist()))
    # synonym and common-name rows dropped (taxonomy_io.cpp:93)
    assert got == {
        1: "root",
        2: "Bacteria",
        9: "Buchnera aphidicola",
        131567: "cellular organisms",
    }


def test_read_merged(taxdir):
    t = read_merged_dmp(str(taxdir / "merged.dmp"))
    assert t.to_pylist() == [
        {"old_id": 12, "new_id": 9},
        {"old_id": 36, "new_id": 2},
    ]


def test_load_ncbi_taxonomy_merge_names_root(taxdir):
    # add a node whose id AND parent hit the merger table
    with open(taxdir / "nodes.dmp", "a") as f:
        f.write(
            "12\t|\t36\t|\tspecies\t|\t\t|\t0\t|\t1\t|\t11\t|\t1\t|\t0\t|\t1\t|\t1\t|\t0\t|\t\t|\n"
        )
    tax = load_ncbi_taxonomy(
        str(taxdir / "nodes.dmp"),
        str(taxdir / "names.dmp"),
        str(taxdir / "merged.dmp"),
    )
    rows = {r["node_id"]: r for r in tax.to_pylist()}
    # merged row: 12 -> 9, parent 36 -> 2 (taxonomy_io.cpp:163-167);
    # the REAL node 9 row wins over the remapped stale alias, so
    # node_id is unique and 9 keeps its own parent (r4 review fix)
    assert 12 not in rows
    merged_rows = [r for r in tax.to_pylist() if r["node_id"] == 9]
    assert len(merged_rows) == 1
    assert merged_rows[0]["parent_id"] == 32199
    # root rank reset (taxonomy_io.cpp:177)
    assert rows[1]["rank"] == "root"
    # names joined; unnamed node gets "--" (none here), empty never
    assert rows[2]["name"] == "Bacteria"
    assert rows[32199]["name"] == "--"  # no names.dmp row for 32199
    # sorted by node_id
    ids = tax["node_id"].to_pylist()
    assert ids == sorted(ids)


def test_ncbi_rank_taxonomy_contraction(taxdir):
    """The .dmp output feeds the engine's ranked-LCA machinery: unlisted
    ranks (no-rank node 131567) contract away, children re-parent to
    the nearest listed ancestor."""
    from metacache_mpi_ray.sources.taxfiles import ncbi_rank_taxonomy

    tax_tab = load_ncbi_taxonomy(
        str(taxdir / "nodes.dmp"), str(taxdir / "names.dmp")
    )
    tax = ncbi_rank_taxonomy(
        tax_tab, ("root", "superkingdom", "genus", "species")
    )
    # 9 (species) -> 32199 (genus) -> 2 (superkingdom) -> [131567
    # dropped] -> 1 (root)
    assert tax.ancestor(np.array([9]), "genus")[0] == 32199
    assert tax.ancestor(np.array([9]), "superkingdom")[0] == 2
    assert tax.ranked_lca(np.array([9]), np.array([2]))[0] == 2
    assert 131567 not in tax.node_ids


def test_accession2taxid_with_header_and_comments(tmp_path, ray_session):
    p = tmp_path / "acc2tax.tsv"
    p.write_text(
        "# produced by a pipeline\n"
        "accession\taccession.version\ttaxid\tgi\n"
        "A1\tA1.1\t9\t100\n"
        "B7\tB7.2\t2\t101\n"
    )
    ds = read_accession2taxid(str(p))
    got = sorted(
        (r["key"], r["taxon_id"]) for r in ds.to_pandas().to_dict("records")
    )
    assert got == [("A1.1", 9), ("B7.2", 2)]


def test_accession2taxid_headerless_two_columns(tmp_path, ray_session):
    p = tmp_path / "plain.tsv"
    p.write_text("X9\t131567\nY3\t1\n")
    ds = read_accession2taxid(str(p))
    got = sorted(
        (r["key"], r["taxon_id"]) for r in ds.to_pandas().to_dict("records")
    )
    assert got == [("X9", 131567), ("Y3", 1)]


def test_accession2taxid_taxid_in_first_column(tmp_path, ray_session):
    """A header naming taxid in column 0 is still a header (the
    reference's taxcol<1 quirk would re-ingest it as data and swap the
    columns — r4 review fix)."""
    p = tmp_path / "swapped.tsv"
    p.write_text("taxid\taccession.version\nn9\tA1.1\n".replace("n9", "9"))
    ds = read_accession2taxid(str(p))
    got = [(r["key"], r["taxon_id"]) for r in ds.to_pandas().to_dict("records")]
    assert got == [("A1.1", 9)]


def test_accession2taxid_headerless_extra_columns_and_comments(tmp_path, ray_session):
    """Headerless files may carry trailing extra columns and leading
    comment lines (taxonomy_io.cpp tolerates both)."""
    p = tmp_path / "wide.tsv"
    p.write_text("# comment\nX9\t131567\tjunk\nY3\t1\tmore\n")
    ds = read_accession2taxid(str(p))
    got = sorted(
        (r["key"], r["taxon_id"]) for r in ds.to_pandas().to_dict("records")
    )
    assert got == [("X9", 131567), ("Y3", 1)]


def test_mapping_feeds_broadcast_join(tmp_path, ray_session):
    """End-to-end: the parsed mapping drives the engine's dimension
    join (reference: mode_build.cpp:174-238 streaming probe)."""
    import ray.data as rd

    from metacache_mpi_ray.stages.joins import broadcast_join

    p = tmp_path / "acc2tax.tsv"
    p.write_text("accession\taccession.version\ttaxid\nA1\tA1.1\t9\nB7\tB7.2\t2\n")
    mapping = read_accession2taxid(str(p)).to_pandas()
    docs = rd.from_arrow(
        pa.table({"key": ["A1.1", "B7.2", "A1.1"], "doc_id": [1, 2, 3]})
    )
    out = broadcast_join(docs, mapping, on="key").to_pandas()
    assert sorted(zip(out["doc_id"], out["taxon_id"])) == [(1, 9), (2, 2), (3, 9)]
