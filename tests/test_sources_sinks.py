"""S3 tar member streaming, S12 tar.gz bundle sink, S14 Neo4j bulk CSVs,
S9 REST source (injected transport)."""

from __future__ import annotations

import glob
import io
import os
import tarfile

from kg_microbe_spark.sources.rest import fetch_json_records
from kg_microbe_spark.sources.sinks import write_kgx_tar, write_neo4j_bulk
from kg_microbe_spark.sources.tar_source import read_tar_members, read_tar_tsv


def _make_tar(path: str, members: dict[str, str], gz: bool = True) -> None:
    mode = "w:gz" if gz else "w"
    with tarfile.open(path, mode) as tar:
        for name, content in members.items():
            data = content.encode()
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_read_tar_members_and_tsv(spark, tmp_path):
    _make_tar(
        str(tmp_path / "a.tar.gz"),
        {
            "one.tsv": "id\tname\n1\talpha\n2\tbeta\n",
            "skip.txt": "not a tsv",
            "two.tsv": "id\tname\n3\tgamma\n",
        },
    )
    _make_tar(str(tmp_path / "b.tar.gz"), {"three.tsv": "id\tname\n4\tdelta\n"})

    members = read_tar_members(spark, str(tmp_path / "*.tar.gz"))
    got = {(os.path.basename(r.archive), r.member) for r in members.collect()}
    assert got == {("a.tar.gz", "one.tsv"), ("a.tar.gz", "two.tsv"), ("b.tar.gz", "three.tsv")}

    rows = read_tar_tsv(spark, str(tmp_path / "*.tar.gz"), columns=["id", "name"])
    data = sorted((r.id, r.name) for r in rows.collect())
    assert data == [("1", "alpha"), ("2", "beta"), ("3", "gamma"), ("4", "delta")]

    # member allow-list (the reference's relevant-file-list behavior)
    only = read_tar_tsv(
        spark, str(tmp_path / "*.tar.gz"), columns=["id", "name"], member_names=["two.tsv"]
    )
    assert [(r.id, r.name) for r in only.collect()] == [("3", "gamma")]


def _kg_frames(spark):
    nodes = spark.createDataFrame(
        [("B:2", "beta", "biolink:OrganismTaxon", "desc b"), ("A:1", "alpha", "biolink:ChemicalEntity", None)],
        "id string, name string, category string, description string",
    )
    edges = spark.createDataFrame(
        [("B:2", "biolink:interacts_with", "A:1", "RO:1", "infores:x")],
        "subject string, predicate string, object string, relation string, primary_knowledge_source string",
    )
    return nodes, edges


def test_write_kgx_tar_sorted_bundle(spark, tmp_path):
    nodes, edges = _kg_frames(spark)
    out = str(tmp_path / "merged-kg.tar.gz")
    write_kgx_tar(nodes, edges, out, work_dir=str(tmp_path / "work"))
    with tarfile.open(out, "r:gz") as tar:
        names = sorted(tar.getnames())
        assert names == ["merged-kg_edges.tsv", "merged-kg_nodes.tsv"]
        node_lines = tar.extractfile("merged-kg_nodes.tsv").read().decode().splitlines()
    assert node_lines[0].startswith("id\t")
    ids = [line.split("\t")[0] for line in node_lines[1:]]
    assert ids == sorted(ids) == ["A:1", "B:2"]  # globally sorted output


def test_write_neo4j_bulk_headers(spark, tmp_path):
    nodes, edges = _kg_frames(spark)
    out = str(tmp_path / "neo")
    write_neo4j_bulk(nodes, edges, out)
    def _read_all(sub):
        # Standard neo4j-admin split-header layout: ONE single-line header
        # file + headerless data parts (a header row inside each part would
        # be imported as bogus data under the regex-style invocation).
        with open(os.path.join(out, f"{sub}_header.csv")) as f:
            header_lines = f.read().splitlines()
        assert len(header_lines) == 1
        parts = sorted(glob.glob(os.path.join(out, sub, "part-*.csv")))
        assert parts
        body = ""
        for p in parts:
            with open(p) as f:
                body += f.read()
        assert header_lines[0] not in body  # parts are headerless
        return header_lines[0], body

    header, nbody = _read_all("nodes")
    assert header.split(",")[:2] == ["id:ID", ":LABEL"]
    assert "A:1,ChemicalEntity" in nbody
    eheader, ebody = _read_all("edges")
    assert eheader.split(",")[:3] == [":START_ID", ":END_ID", ":TYPE"]
    assert "interacts_with" in ebody and "biolink:interacts_with" not in ebody  # prefix stripped


def test_rest_source_retry_and_error_channel(spark):
    eps = spark.createDataFrame(
        [("a", "http://x/a"), ("b", "http://x/flaky"), ("c", "http://x/dead")],
        "id string, url string",
    )

    # per-url call counter lives in the task's worker process: all attempts
    # for one row happen inside one retry loop, so the flaky endpoint's
    # second attempt deterministically succeeds
    calls: dict[str, int] = {}

    def fetcher(url: str, _calls=calls) -> str:
        _calls[url] = _calls.get(url, 0) + 1
        if url.endswith("/a"):
            return '{"ok": 1}'
        if url.endswith("/flaky") and _calls[url] >= 2:
            return '{"ok": 2}'
        if url.endswith("/flaky"):
            raise ValueError("boom-once")
        raise RuntimeError("always down")

    out = {
        r.id: (r.body, r.error, r.attempts)
        for r in fetch_json_records(
            eps, fetcher, max_attempts=3, backoff_sec=0.0, max_partitions=1
        ).collect()
    }
    assert out["a"] == ('{"ok": 1}', None, 1)
    assert out["b"][0] == '{"ok": 2}' and out["b"][1] is None and out["b"][2] == 2
    assert out["c"][0] is None and "always down" in out["c"][1] and out["c"][2] == 3


def test_rest_source_rejects_zero_attempts(spark):
    import pytest

    eps = spark.createDataFrame([("a", "http://x/a")], "id string, url string")
    with pytest.raises(ValueError, match="max_attempts"):
        fetch_json_records(eps, lambda u: "{}", max_attempts=0)
