"""CLI mode dispatch (main.cpp / mode_* analog): build -> info ->
query -> dedup -> merge driven through the argparse surface in-process
(Ray session shared with the pytest fixture; _ensure_ray is guarded)."""

import json

import pyarrow.parquet as pq


def test_cli_build_query_info_dedup_merge(tmp_path, corpus_dir, capsys):
    from metacache_mpi_ray.__main__ import main

    idx = str(tmp_path / "index")
    out_q = str(tmp_path / "qout")
    out_d = str(tmp_path / "dout")
    out_m = str(tmp_path / "mout")
    pages = f"{corpus_dir}/pages"

    assert main(["build", "--pages", pages, "--index", idx, "--num-partitions", "4"]) == 0
    built = json.loads(capsys.readouterr().out.strip())
    assert built["docs"] == 500

    assert main(["info", "--index", idx]) == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert info["rows_signatures"] == 500
    assert info["rows_clusters"] == 500
    assert info["bucket_size_moments"]["n"] > 0
    assert info["config"]["n_perms"] == 128

    assert (
        main(
            ["query", "--pages", pages, "--index", idx, "--out", out_q,
             "--num-partitions", "4"]
        )
        == 0
    )
    q = pq.read_table(out_q)
    assert q.num_rows == 500
    # querying the index corpus against itself: every doc matches
    assert all(q["matched"].to_pylist())

    assert (
        main(["dedup", "--pages", pages, "--out", out_d, "--num-partitions", "4"]) == 0
    )
    d = pq.read_table(out_d)
    assert d.num_rows == 500
    assert {"doc_id", "cluster_id", "is_dup"} <= set(d.column_names)

    # merge the build's verified edges with themselves -> same clusters
    assert (
        main(
            ["merge", "--edges", f"{idx}/verified", "--edges", f"{idx}/verified",
             "--pages", pages, "--out", out_m, "--num-partitions", "4"]
        )
        == 0
    )
    m = pq.read_table(out_m).to_pandas().sort_values("doc_id")
    dd = d.to_pandas().sort_values("doc_id")
    assert (m["cluster_id"].values == dd["cluster_id"].values).all()


def test_cli_extend(tmp_path, corpus_dir, capsys):
    """Extend mode (the reference's 'modify' mode): add a disjoint page
    batch to an existing index; the clusters artifact then covers both."""
    from metacache_mpi_ray.__main__ import main
    from metacache_mpi_ray.sources.pages import write_pages_corpus

    idx = str(tmp_path / "index")
    pages = f"{corpus_dir}/pages"
    batch_dir = write_pages_corpus(str(tmp_path / "batch"), 100, seed=777)

    assert main(["build", "--pages", pages, "--index", idx, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    assert (
        main(
            ["extend", "--pages", f"{batch_dir}/pages", "--index", idx,
             "--num-partitions", "4"]
        )
        == 0
    )
    ext = json.loads(capsys.readouterr().out.strip())
    assert ext["docs"] == 600

    assert main(["info", "--index", idx]) == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert info["rows_clusters"] == 600
    assert info["rows_signatures"] == 600
    assert [r["batch_id"] for r in info["extends"]] == ["b0001"]
    assert info["extends"][0]["n_new"] == 100

    # a config override that disagrees with the stored index refuses
    import pytest

    from metacache_mpi_ray.state.checkpoint import ConfigMismatch

    with pytest.raises(ConfigMismatch):
        main(
            ["extend", "--pages", f"{batch_dir}/pages", "--index", idx,
             "--n-bands", "16"]
        )


def test_cli_annotate_and_pipeline(tmp_path, corpus_dir, capsys):
    """Annotate mode (M7 analog): mapping lookup + header rewrite, with
    unmapped keys kept as 'NA' like the reference's miss handling."""
    import pandas as pd
    import ray.data as rd

    from metacache_mpi_ray.__main__ import main
    from metacache_mpi_ray.pipelines.annotate import annotate_docs

    # library-level: missing keys annotate as NA, ints stay ints
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["en", "de", "xx"]})
    )
    mapping = pd.DataFrame({"lang": ["en", "de"], "n": [7, 9]})
    out = annotate_docs(
        docs, mapping, on="lang", annotation_col="n", header_cols=["lang"]
    ).to_pandas()
    got = dict(zip(out["doc_id"], out["header"]))
    assert got == {1: "en|7", 2: "de|9", 3: "xx|NA"}

    # CLI surface over the corpus pages
    mp = str(tmp_path / "mapping.parquet")
    pd.DataFrame(
        {"lang": ["en", "de", "fr", "es", "zh"], "label": list("ABCDE")}
    ).to_parquet(mp)
    out_a = str(tmp_path / "aout")
    rc = main(
        ["annotate", "--pages", f"{corpus_dir}/pages", "--mapping", mp,
         "--key", "lang", "--annotation", "label",
         "--header-cols", "url,lang", "--out", out_a]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["docs"] == 500
    written = pq.read_table(out_a).to_pandas()
    assert "header" in written.columns
    assert written["header"].str.count("\\|").min() >= 2


def test_cli_repl_mode(tmp_path, corpus_dir, capsys, monkeypatch):
    """repl mode: one JSON result per stdin line against a built index."""
    import io

    from metacache_mpi_ray.__main__ import main

    idx = str(tmp_path / "replidx")
    assert main(["build", "--pages", f"{corpus_dir}/pages", "--index", idx,
                 "--num-partitions", "4"]) == 0
    capsys.readouterr()

    pages = pq.read_table(f"{corpus_dir}/pages").to_pandas()
    known = pages["text"].iloc[0]
    monkeypatch.setattr(
        "sys.stdin", io.StringIO(known + "\n" + "unseen text " * 30 + "\n")
    )
    assert main(["repl", "--index", idx]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["ready"] is True
    assert lines[1]["matched"] is True
    assert lines[2]["matched"] is False


def test_cli_repl_option_reparsing(tmp_path, corpus_dir, capsys, monkeypatch):
    """S13 parity (mode_query.cpp:269-315): the shell accepts new query
    OPTIONS per input line — :set re-parses them for subsequent
    queries, :options echoes them, bad input errors without exiting.
    A verify_threshold of 1.01... is impossible, so 1.0 with a known
    text still matches (exact copy) while a tightened top_k bounds the
    match list."""
    import io

    from metacache_mpi_ray.__main__ import main

    idx = str(tmp_path / "replopt")
    assert main(["build", "--pages", f"{corpus_dir}/pages", "--index", idx,
                 "--num-partitions", "4"]) == 0
    capsys.readouterr()

    pages = pq.read_table(f"{corpus_dir}/pages").to_pandas()
    known = pages["text"].iloc[0]
    script = "\n".join(
        [
            ":options",
            ":set top_k 1",
            ":set verify_threshold 1.0",
            known,                      # exact copy: est_sim 1.0 still clears
            ":set verify_threshold 0.2",
            ":set bogus 3",             # error, shell keeps going
            ":set top_k zero",          # bad value, shell keeps going
            known,
        ]
    )
    monkeypatch.setattr("sys.stdin", io.StringIO(script + "\n"))
    assert main(["repl", "--index", idx]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["ready"] is True
    assert lines[1]["options"]["top_k"] == 5  # the CLI default echoed
    assert lines[2]["options"]["top_k"] == 1
    assert lines[3]["options"]["verify_threshold"] == 1.0
    assert lines[4]["matched"] is True and len(lines[4]["matches"]) == 1
    assert lines[4]["matches"][0]["est_sim"] == 1.0
    assert lines[5]["options"]["verify_threshold"] == 0.2
    assert "error" in lines[6] and "error" in lines[7]
    assert lines[8]["matched"] is True


def test_annotate_duplicate_mapping_keys_rejected():
    """r3 review regression: a duplicate-keyed mapping must fail with a
    clear error, not an opaque Arrow length mismatch mid-pipeline."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from metacache_mpi_ray.pipelines.annotate import annotate_docs

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1], "lang": ["en"]}))
    mapping = pd.DataFrame({"lang": ["en", "en"], "n": [7, 9]})
    with pytest.raises(ValueError, match="duplicate keys"):
        annotate_docs(
            docs, mapping, on="lang", annotation_col="n", header_cols=["lang"]
        )
