"""End-to-end CLI surface (python -m pageindex_ray ...) — the ray-job-submit
entry the README documents. Runs main() IN-PROCESS against the session's
Ray (main must not tear down a session it didn't start)."""

import json

import pyarrow.compute as pc
import pyarrow.parquet as pq


def test_cli_build_search_append(ray_session, tiny_corpus, tmp_path, capsys):
    import ray

    from pageindex_ray.__main__ import main

    src = pq.read_table(tiny_corpus["transcripts"])
    convs = sorted(set(src.column("conv_id").to_pylist()))
    cut = convs[2 * len(convs) // 3]
    p_head = str(tmp_path / "head.parquet")
    p_tail = str(tmp_path / "tail.parquet")
    pq.write_table(src.filter(pc.less(src.column("conv_id"), cut)), p_head)
    pq.write_table(src.filter(pc.greater_equal(src.column("conv_id"), cut)), p_tail)

    idx = str(tmp_path / "idx")
    assert main(["build", "--input", p_head, "--index", idx, "--partitions", "4"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_docs"] > 0 and ray.is_initialized()  # session NOT torn down

    assert main(["search", "--index", idx, "--query", "the", "-k", "5", "--scorers", "2"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hits and hits[0]["rank"] == 0 and "doc_id" in hits[0]

    out = str(tmp_path / "appended")
    assert main(["append", "--index", idx, "--input", p_tail, "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_waves"] == 2 and rep["n_docs"] == src.num_rows

    assert main(["search", "--index", out, "--query", "the", "--conv", "-k", "3"]) == 0
    conv_hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert conv_hits and "conv_id" in conv_hits[0] and "doc_id" not in conv_hits[0]

    assert main(
        ["bench-queries", "--index", out, "--queries", tiny_corpus["queries"]]
    ) == 0
    bq = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert bq["n_queries"] == 50 and bq["p50_ms"] > 0

    assert main(["info", "--index", out]) == 0
    inf = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert inf["n_docs"] == src.num_rows and inf["committed"]
    assert inf["merged_from"] == 2 and inf["lineage"]["n_postings"] > 0
    assert ray.is_initialized()


def test_cli_round3_surfaces(ray_session, tiny_corpus, tmp_path, capsys):
    """The new-surface CLI doors: similarity selection, boosts, pagination,
    export, ordered span-near. Builds its OWN index: the sidecar builds
    below must not mutate the shared session fixture (test_positions'
    fixture asserts its first build is not a resume)."""
    from pageindex_ray.__main__ import main

    built_index = {"index_dir": str(tmp_path / "cli_idx"), **tiny_corpus}
    assert main(["build", "--input", tiny_corpus["transcripts"],
                 "--index", built_index["index_dir"], "--partitions", "4"]) == 0
    capsys.readouterr()
    idx = built_index["index_dir"]

    assert main(["search", "--index", idx, "--query", "the", "--similarity", "lm"]) == 0
    lm_hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert lm_hits and lm_hits[0]["rank"] == 0

    assert main(["search", "--index", idx, "--query", "the of", "--similarity", "rrf"]) == 0
    rrf_hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # uniform hit shape across rankers (a consumer can flip --similarity)
    assert rrf_hits and {"rank", "doc_id", "score", "conv_id", "turn_idx"} <= set(rrf_hits[0])
    # unsupported flag combinations fail fast instead of silently dropping
    import pytest as _pt

    with _pt.raises(SystemExit):
        main(["search", "--index", idx, "--query", "x", "--similarity", "lm",
              "--where", "role=user"])
    with _pt.raises(SystemExit):
        main(["search", "--index", idx, "--query", "x", "--sort-by", "ts", "--wand"])

    # pagination: page 2 via the --after cursor disjoint from page 1
    assert main(["search", "--index", idx, "--query", "the", "-k", "5"]) == 0
    p1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cur = f'{p1[-1]["score"]},{p1[-1]["doc_id"]}'
    assert main(["search", "--index", idx, "--query", "the", "-k", "5", "--after", cur]) == 0
    p2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert p2 and not ({r["doc_id"] for r in p1} & {r["doc_id"] for r in p2})

    # boost needs the attrs sidecar
    assert main(["attrs", "--index", idx, "--input", built_index["transcripts"],
                 "--columns", "role"]) == 0
    capsys.readouterr()
    assert main(["search", "--index", idx, "--query", "the of",
                 "--boost", "role=assistant:2.0"]) == 0
    boosted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert boosted

    # multi-level tree rollup (round 4): nested drill-down rows; bad spans
    # and unsupported combinations fail fast
    assert main(["search", "--index", idx, "--query", "the of", "--tree", "16,4"]) == 0
    tree_hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tree_hits and {"conv_id", "l1_start", "l2_start", "turn_idx"} <= set(tree_hits[0])
    assert main(["search", "--index", idx, "--query", "the", "--tree", "16,4",
                 "--where", "role=user"]) == 0
    capsys.readouterr()
    # contract ValueErrors map to a clean message + exit 2 (not a traceback)
    assert main(["search", "--index", idx, "--query", "x", "--tree", "4,3"]) == 2
    with _pt.raises(SystemExit):
        main(["search", "--index", idx, "--query", "x", "--tree", "16,4", "--wand"])

    out = str(tmp_path / "cli_export")
    assert main(["export", "--index", idx, "--query", "the", "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] > 0

    assert main(["positions", "--index", idx, "--input", built_index["transcripts"]]) == 0
    capsys.readouterr()
    assert main(["span", "--index", idx, "--query", "the of", "--slop", "5"]) == 0
    spans = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(spans, list)


def test_cli_docvalues_sort(ray_session, tiny_corpus, tmp_path, capsys):
    from pageindex_ray.__main__ import main

    idx = str(tmp_path / "cli_dv_idx")
    assert main(["build", "--input", tiny_corpus["transcripts"],
                 "--index", idx, "--partitions", "4"]) == 0
    capsys.readouterr()
    assert main(["docvalues", "--index", idx, "--input", tiny_corpus["transcripts"]]) == 0
    capsys.readouterr()
    assert main(["search", "--index", idx, "--query", "the of", "--sort-by", "ts"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hits and "sort_value" in hits[0]
    vals = [h["sort_value"] for h in hits]
    assert vals == sorted(vals, reverse=True)
