"""Regressions for the IO/durability review batch: torn put-if-absent
versions, checkpoint on an empty log, mixed-scheme sreplace, RangedBlob
stride guard, canonical JSON serialization across schemes."""

import json
import os

import numpy as np
import pytest

from tantivy4java_ray import storage as st
from tantivy4java_ray.state.manifest import (TransactionLog,
                                             exclusive_write_json)


def test_exclusive_write_never_exposes_partial(tmp_path):
    """The version file must appear with its FULL content: no moment
    where a reader can see an empty/torn v*.json."""
    p = str(tmp_path / "v00000000.json")
    assert exclusive_write_json(p, {"version": 0, "actions": []})
    assert json.load(open(p))["version"] == 0
    # second claim loses and does not clobber
    assert not exclusive_write_json(p, {"version": 99})
    assert json.load(open(p))["version"] == 0
    # no stray tmp files
    assert [f for f in os.listdir(tmp_path) if f != "v00000000.json"] == []


def test_checkpoint_on_empty_log_is_noop(tmp_path):
    log = TransactionLog(str(tmp_path / "idx"))
    assert log.create_checkpoint() == -1
    # nothing scaffolded, no malformed checkpoint--0000001.json
    assert not os.path.exists(str(tmp_path / "idx" / "txlog"))


def test_sreplace_rejects_mixed_schemes(tmp_path):
    src = str(tmp_path / "a")
    open(src, "w").write("x")
    with pytest.raises(ValueError, match="same-filesystem"):
        st.sreplace(src, "memory://bucket/b")


def test_ranged_blob_rejects_strided_slice():
    import fsspec
    fs = fsspec.filesystem("memory")
    with fs.open("/rb_step_test", "wb") as f:
        f.write(bytes(range(64)))
    blob = st.RangedBlob(fs, "/rb_step_test")
    assert bytes(blob[4:8]) == bytes([4, 5, 6, 7])
    assert bytes(blob[-4:]) == bytes([60, 61, 62, 63])
    with pytest.raises(ValueError, match="contiguous"):
        blob[0:16:2]


def test_write_json_atomic_same_bytes_local_and_url(tmp_path):
    obj = {"b": 2, "a": [1, {"z": None}]}
    lp = str(tmp_path / "x.json")
    st.write_json_atomic(lp, obj)
    st.write_json_atomic("memory://jsontest/x.json", obj)
    with st.sopen("memory://jsontest/x.json", "rb") as f:
        remote = f.read()
    assert open(lp, "rb").read() == remote


def test_tmp_names_are_unique():
    a = st._tmp_name("/x/y")
    b = st._tmp_name("/x/y")
    assert a != b and ".tmp-" in a
