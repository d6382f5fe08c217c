"""Real multi-process race over the txlog's put-if-absent version
claim: N processes append concurrently to one log; every transaction
must land at a UNIQUE version with its FULL content intact (the claim
is tmp-write + atomic hard link — no torn or clobbered v*.json under
contention)."""

import json
import multiprocessing as mp
import os

from tantivy4java_ray.state.manifest import TransactionLog


def _writer(args):
    index_dir, wid, n_appends = args
    log = TransactionLog(index_dir)
    got = []
    for i in range(n_appends):
        v = log.append([{"add_partition": {"pid": wid * 1000 + i,
                                           "writer": wid,
                                           "pad": "x" * 2048}}])
        got.append(v)
    return wid, got


def test_concurrent_appends_unique_complete_versions(tmp_path):
    index_dir = str(tmp_path / "idx")
    n_writers, n_appends = 6, 8
    with mp.get_context("spawn").Pool(n_writers) as pool:
        results = pool.map(_writer, [(index_dir, w, n_appends)
                                     for w in range(n_writers)])
    all_versions = [v for _w, vs in results for v in vs]
    # every claim unique, log contiguous from 0
    assert len(set(all_versions)) == n_writers * n_appends
    assert sorted(all_versions) == list(range(n_writers * n_appends))
    # every version file parses and carries exactly one full transaction
    log = TransactionLog(index_dir)
    seen_pids = set()
    for rec in log.versions():
        assert rec["version"] in set(all_versions)
        acts = rec["actions"]
        assert len(acts) == 1 and len(acts[0]["add_partition"]["pad"]) == 2048
        seen_pids.add(acts[0]["add_partition"]["pid"])
    assert len(seen_pids) == n_writers * n_appends
    # replayed state holds every partition exactly once
    state = log.read_state()
    assert len(state["partitions"]) == n_writers * n_appends
    # no stray tmp files leaked by losing claims
    stray = [f for f in os.listdir(os.path.join(index_dir, "txlog"))
             if ".tmp-" in f]
    assert stray == []
