"""Checksum sidecar + deep validation + corruption fuzz.

Integrity analog of tantivy's per-file crc footers and the reference's
split validation/skip-corrupt contract (``QuickwitSplit.java:140-158``):
every committed artifact is covered by ``checksums.json``; a flipped
byte, truncation, removal, or stale sidecar is reported by
``validate --deep`` before wrong answers can be served.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from tantivy4java_ray.api import Index
from tantivy4java_ray.pipelines.integrity import (
    index_files, verify_checksums, write_checksums,
)


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(300)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(600, dtype=np.int64)),
        "text": pa.array([" ".join(rng.choice(words, 30))
                          for _ in range(600)]),
        "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(600)]),
    })
    out = str(tmp_path_factory.mktemp("integrity") / "idx")
    Index.create_from_documents(docs, out, num_shards=4,
                                target_docs_per_partition=200)
    return out


def _fresh(idx, tmp_path, name="copy"):
    import shutil
    dst = str(tmp_path / name)
    shutil.copytree(idx, dst)
    side = os.path.join(dst, "checksums.json")
    if os.path.exists(side):   # earlier tests may have stamped the base
        os.unlink(side)
    return dst


def test_checksum_roundtrip_green(idx):
    side = write_checksums(idx)
    assert set(side["files"]) == set(index_files(idx))
    assert "manifest.json" in side["files"]
    assert verify_checksums(idx) == []


def test_missing_sidecar_reported(idx, tmp_path):
    c = _fresh(idx, tmp_path)
    probs = verify_checksums(c)
    assert len(probs) == 1 and "absent" in probs[0]


def test_corruption_fuzz_every_artifact_class(idx, tmp_path):
    # one random byte flipped in EVERY artifact, one at a time: the
    # deep check must name exactly the corrupted file each time
    rng = np.random.default_rng(11)
    c = _fresh(idx, tmp_path)
    write_checksums(c)
    rels = [r for r in index_files(c) if r != "manifest.json"]
    assert any("postings.bin" in r for r in rels)
    assert any("terms.parquet" in r for r in rels)
    assert any("docdata" in r for r in rels)
    for rel in rels:
        p = os.path.join(c, rel)
        raw = bytearray(open(p, "rb").read())
        if not raw:
            continue
        pos = int(rng.integers(0, len(raw)))
        orig = raw[pos]
        raw[pos] ^= 1 << int(rng.integers(0, 8))
        with open(p, "wb") as f:
            f.write(raw)
        probs = verify_checksums(c)
        assert probs and all(rel in pr for pr in probs), (rel, probs)
        assert "crc32 mismatch" in probs[0]
        raw[pos] = orig
        with open(p, "wb") as f:
            f.write(raw)
    assert verify_checksums(c) == []


def test_truncation_and_removal_reported(idx, tmp_path):
    c = _fresh(idx, tmp_path)
    write_checksums(c)
    victim = next(os.path.join(c, r) for r in index_files(c)
                  if r.endswith("postings.bin"))
    raw = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(raw[:-3])
    probs = verify_checksums(c)
    assert any("size" in p and "truncated" in p for p in probs)
    os.unlink(victim)
    probs = verify_checksums(c)
    assert any("missing" in p for p in probs)


def test_stale_sidecar_on_manifest_change(idx, tmp_path):
    c = _fresh(idx, tmp_path)
    write_checksums(c)
    man = json.load(open(os.path.join(c, "manifest.json")))
    man["touched"] = True
    with open(os.path.join(c, "manifest.json"), "w") as f:
        json.dump(man, f)
    probs = verify_checksums(c)
    assert len(probs) == 1 and "stale" in probs[0]


def test_cli_checksum_and_deep_validate(idx, tmp_path):
    c = _fresh(idx, tmp_path)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run([sys.executable, "-m", "tantivy4java_ray",
                        "checksum", c], capture_output=True, text=True,
                       env=env)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["files"] >= 3 and out["total_bytes"] > 0
    r = subprocess.run([sys.executable, "-m", "tantivy4java_ray",
                        "validate", c, "--deep"], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stderr + r.stdout
    assert json.loads(r.stdout.strip().splitlines()[-1])["valid"]
    # corrupt one byte -> deep validate fails, plain validate may not
    victim = next(os.path.join(c, rel) for rel in index_files(c)
                  if rel.endswith("positions.bin"))
    raw = bytearray(open(victim, "rb").read())
    raw[len(raw) // 2] ^= 0x40
    with open(victim, "wb") as f:
        f.write(raw)
    r = subprocess.run([sys.executable, "-m", "tantivy4java_ray",
                        "validate", c, "--deep"], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 1
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert any("crc32 mismatch" in p for p in res["problems"])


def test_deep_api_surface(idx, tmp_path):
    c = _fresh(idx, tmp_path)
    ix = Index(c)
    ix.write_checksums()
    assert ix.validate(deep=True) == []


def test_bundle_checksum_roundtrip(idx, tmp_path):
    from tantivy4java_ray.pipelines.bundle import bundle_index
    c = _fresh(idx, tmp_path)
    write_checksums(c)                       # dir sidecar must NOT pack
    split = str(tmp_path / "b.split")
    bundle_index(c, split)
    side = write_checksums(split)            # single-file mode
    assert side.get("bundle") and os.path.exists(split + ".checksums.json")
    assert verify_checksums(split) == []
    raw = bytearray(open(split, "rb").read())
    raw[len(raw) // 3] ^= 0x10
    with open(split, "wb") as f:
        f.write(raw)
    probs = verify_checksums(split)
    assert probs == ["bundle crc32 mismatch (corrupt payload)"]


def test_bundle_excludes_dir_sidecar(idx, tmp_path):
    from tantivy4java_ray.pipelines.bundle import bundle_index
    from tantivy4java_ray.pipelines.search import IndexReader
    c = _fresh(idx, tmp_path)
    write_checksums(c)
    split = str(tmp_path / "b2.split")
    bundle_index(c, split)
    r = IndexReader(f"t4jrsplit://{split}")
    # the directory-form sidecar must not exist inside the bundle
    from tantivy4java_ray import storage as st
    assert not st.sexists(f"t4jrsplit://{split}/checksums.json")
    assert r.max_doc == 600


def test_per_field_component_sizes(idx, tmp_path):
    # getPerFieldComponentSizes analog (reference README.md:1265-1293)
    from tantivy4java_ray.pipelines.bundle import bundle_index
    from tantivy4java_ray.pipelines.search import IndexReader
    r = IndexReader(idx)
    sizes = r.per_field_component_sizes()
    assert sizes["text.postings"] > 0
    assert sizes["text.positions"] > 0      # TEXT fields index positions
    assert sizes["text.fieldnorm"] > 0
    assert sizes["lang.fastfield"] > 0 and sizes["doc_id.fastfield"] > 0
    # lang is a raw STRING field: no positions component
    assert "lang.positions" not in sizes
    # postings total must equal the dictionaries' own accounting
    want = 0
    for sid in range(r.num_shards):
        d = r._dict(sid)
        if d is not None:
            want += int(d["nbytes"].sum())
    got = sum(v for k, v in sizes.items() if k.endswith(".postings"))
    assert got == want
    # works identically on a packed bundle
    split = str(tmp_path / "sizes.split")
    bundle_index(idx, split)
    b = IndexReader(f"t4jrsplit://{split}").per_field_component_sizes()
    assert {k: v for k, v in b.items() if k.endswith(".postings")} == \
        {k: v for k, v in sizes.items() if k.endswith(".postings")}


def test_bundle_checksum_via_url_form(idx, tmp_path):
    # Index API opens bundles as t4jrsplit:// URLs; checksum/deep
    # validate must resolve the sidecar NEXT to the underlying file
    from tantivy4java_ray.pipelines.bundle import bundle_index
    c = _fresh(idx, tmp_path)
    split = str(tmp_path / "u.split")
    bundle_index(c, split)
    url = f"t4jrsplit://{split}"
    write_checksums(url)
    assert os.path.exists(split + ".checksums.json")
    assert verify_checksums(url) == []
    # malformed sidecar -> reported, not raised
    with open(split + ".checksums.json", "w") as f:
        f.write("{not json")
    probs = verify_checksums(url)
    assert probs and "malformed" in probs[0]


def test_cli_info_sizes(idx):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run([sys.executable, "-m", "tantivy4java_ray",
                        "info", idx, "--sizes"], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stderr
    meta = json.loads(r.stdout)
    cs = meta["component_sizes"]
    assert cs["text.postings"] > 0 and cs["text.fieldnorm"] > 0
