"""Log-structured index merge: N indexes -> one (the LSM step).

Ray retelling of ``QuickwitSplit.mergeSplits``
(``split/merge/QuickwitSplit.java:1291``, ``native/src/quickwit_split/
merge_impl.rs:70``): instead of downloading splits into one process and
re-running a tantivy merge, each *term-shard* merges independently — a
``Dataset`` of shard ids mapped over a merge task, no shuffle at all
(SURVEY.md §3.3 "embarrassingly parallel per term-range").

Because posting doc ids are stored relative to an int64 ``run_base``, and
indexes are concatenated in doc-id order (index i's docs shift by the total
doc count before it), merging a shard without deletes is a *byte copy*:
postings/positions blobs are concatenated verbatim and only the dictionary
rows get ``run_base``/``offset`` adjustments. With delete queries
(``MergeConfig.getDeleteQueries``, ``QuickwitSplit.java:918``) postings are
decoded, filtered, and re-encoded; deleted doc ids are also recorded in the
manifest so fast-field queries (range/exists/all) exclude them.

Requires all inputs to share ``num_shards`` and schema (the builder's
deterministic term-shard hash makes same-term co-location structural).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from tantivy4java_ray import postings as pcodec
from tantivy4java_ray.state.manifest import TransactionLog, atomic_write_json


@dataclass
class SkippedSplit:
    """A merge input dropped by ``skip_corrupt=True`` — the analog of the
    reference's skipped-split records (``QuickwitSplit.java:140-158``,
    ``native/src/quickwit_split/resilient_ops.rs:17-50``): one bad input
    must not kill a 10^4-shard merge hours in."""
    index_dir: str
    reason: str


@dataclass
class MergeResult:
    index_dir: str
    num_docs: int
    num_deleted: int
    elapsed_s: float
    skipped: list[SkippedSplit] | None = None


def _read_all(st, path: str) -> bytes:
    with st.sopen(path, "rb") as f:
        return f.read()


def _stream_copy(st, src: str, dst_f, chunk: int = 8 << 20) -> None:
    with st.sopen(src, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                return
            dst_f.write(b)


def _load_states(index_dirs: list[str]) -> list[dict]:
    from tantivy4java_ray import storage as st
    return [st.read_json_any(st.sjoin(d, "manifest.json"))
            for d in index_dirs]


def _validate_input(index_dir: str) -> str | None:
    """Structural soundness of one merge input; returns a skip reason or
    None. Footer-only cost (terms.parquet dictionaries + parquet
    metadata + file sizes) — the same open-the-split work the reference
    does before a merge, never a full blob read."""
    from tantivy4java_ray import storage as st
    try:
        state = st.read_json_any(st.sjoin(index_dir, "manifest.json"))
    except Exception as e:
        return f"manifest unreadable: {type(e).__name__}: {e}"
    if not state.get("committed"):
        return "index not committed"
    try:
        meta = state["meta"]
        nshards = int(meta["plan"]["num_shards"])
        meta["stats"]["num_docs"]
    except Exception as e:
        return f"manifest incomplete: {type(e).__name__}: {e}"
    for sid in range(nshards):
        sd = st.sjoin(index_dir, "shards", f"shard-{sid:05d}")
        tp = st.sjoin(sd, "terms.parquet")
        if not st.sexists(tp):
            continue   # legal: shard had no terms for this input
        try:
            t = st.read_parquet_any(tp, columns=["offset", "nbytes",
                                                 "pos_offset", "pos_nbytes"])
        except Exception as e:
            return f"shard {sid}: terms.parquet corrupt: {e}"
        if len(t) == 0:
            continue
        off = t.column("offset").to_numpy()
        nb = t.column("nbytes").to_numpy()
        need_p = int((off + nb).max())
        ppath = st.sjoin(sd, "postings.bin")
        have_p = st.ssize(ppath) if st.sexists(ppath) else -1
        if have_p < need_p:
            return (f"shard {sid}: postings.bin truncated "
                    f"({have_p} B < dictionary's {need_p} B)")
        po = t.column("pos_offset").to_numpy()
        pn = t.column("pos_nbytes").to_numpy()
        haspos = po >= 0
        if haspos.any():
            need_q = int((po[haspos] + pn[haspos]).max())
            qpath = st.sjoin(sd, "positions.bin")
            have_q = st.ssize(qpath) if st.sexists(qpath) else -1
            if have_q < need_q:
                return (f"shard {sid}: positions.bin truncated "
                        f"({have_q} B < dictionary's {need_q} B)")
        try:
            tb = st.read_parquet_any(tp, columns=["bm_offset", "bm_nbytes"])
        except Exception:
            tb = None   # pre-frontier input: no block-max sidecar
        if tb is not None and len(tb):
            bo = tb.column("bm_offset").to_numpy()
            bn = tb.column("bm_nbytes").to_numpy()
            hasbm = bo >= 0
            if hasbm.any():
                need_b = int((bo[hasbm] + bn[hasbm]).max())
                bpath = st.sjoin(sd, "blockmax.bin")
                have_b = st.ssize(bpath) if st.sexists(bpath) else -1
                if have_b < need_b:
                    return (f"shard {sid}: blockmax.bin truncated "
                            f"({have_b} B < dictionary's {need_b} B)")
    for p in state.get("partitions", {}).values():
        dpath = st.sjoin(index_dir, "docdata",
                         f"part-{p['pid']:05d}.parquet")
        try:
            st.parquet_file_any(dpath).metadata  # footer parse
        except Exception as e:
            return f"docdata part {p['pid']}: unreadable: {e}"
    return None


class _ShardMerger:
    def __init__(self, index_dirs: list[str], out_dir: str,
                 doc_offsets: list[int],
                 deleted_per_index: list[np.ndarray] | None):
        self.index_dirs = index_dirs
        self.out_dir = out_dir
        self.doc_offsets = doc_offsets
        self.deleted = deleted_per_index

    def __call__(self, batch: pa.Table):
        for sid in batch.column("sid").to_pylist():
            yield self._merge_shard(sid)

    def _merge_shard(self, sid: int) -> pa.Table:
        from tantivy4java_ray import storage as st
        dicts = []
        # per-input blob paths (postings, positions|None, blockmax|None)
        srcs: list[tuple[str, str | None, str | None]] = []
        cur_p, cur_q, cur_b = 0, 0, 0
        for i, d in enumerate(self.index_dirs):
            sd = st.sjoin(d, "shards", f"shard-{sid:05d}")
            tp = st.sjoin(sd, "terms.parquet")
            if not st.sexists(tp):
                continue
            t = st.read_parquet_any(tp).to_pandas()
            t["run_base"] += self.doc_offsets[i]
            if "bm_offset" not in t.columns:  # pre-frontier input
                t["bm_offset"] = -1
                t["bm_nbytes"] = 0
            dicts.append(t)
            ppath = st.sjoin(sd, "postings.bin")
            qpath = st.sjoin(sd, "positions.bin")
            bpath = st.sjoin(sd, "blockmax.bin")
            qlen = st.ssize(qpath) if st.sexists(qpath) else 0
            blen = st.ssize(bpath) if st.sexists(bpath) else 0
            srcs.append((ppath, qpath if qlen else None,
                         bpath if blen else None))
            t["offset"] += cur_p
            t.loc[t["pos_offset"] >= 0, "pos_offset"] += cur_q
            t.loc[t["bm_offset"] >= 0, "bm_offset"] += cur_b
            cur_p += st.ssize(ppath)
            cur_q += qlen
            cur_b += blen
        if not dicts:
            return pa.table({"sid": pa.array([sid], pa.int32()),
                             "num_terms": pa.array([0], pa.int64())})
        import pandas as pd
        dict_df = pd.concat(dicts, ignore_index=True)
        shard_dir = st.sjoin(self.out_dir, "shards", f"shard-{sid:05d}")

        if self.deleted is not None and any(len(x) for x in self.deleted):
            # delete path decodes/re-encodes intersecting runs, so it
            # needs the joined blobs in memory
            post_blob = b"".join(_read_all(st, p) for p, _, _ in srcs)
            pos_blob = b"".join(_read_all(st, q) for _, q, _ in srcs if q)
            bm_blob = b"".join(_read_all(st, b) for _, _, b in srcs if b)
            dict_df, post_blob, pos_blob, bm_blob = self._apply_deletes(
                dict_df, post_blob, pos_blob, bm_blob)
            for name, blob in (("postings.bin", post_blob),
                               ("positions.bin", pos_blob),
                               ("blockmax.bin", bm_blob)):
                st.write_bytes_atomic(blob, st.sjoin(shard_dir, name))
        else:
            # pure byte-copy merge STREAMS each input blob to the
            # atomic output in chunks — peak memory is one chunk, not
            # the multi-GB sum of every input shard's postings
            with st.open_bytes_atomic(
                    st.sjoin(shard_dir, "postings.bin")) as pf:
                for p, _, _ in srcs:
                    _stream_copy(st, p, pf)
            with st.open_bytes_atomic(
                    st.sjoin(shard_dir, "positions.bin")) as xf:
                for _, q, _ in srcs:
                    if q:
                        _stream_copy(st, q, xf)
            with st.open_bytes_atomic(
                    st.sjoin(shard_dir, "blockmax.bin")) as bf:
                for _, _, bq in srcs:
                    if bq:
                        _stream_copy(st, bq, bf)

        # stable numpy argsort on the object key column (pandas sort_values
        # truncates object strings at NUL — see build._write_shard); equal
        # keys keep concat order = index order = ascending run_base
        order = np.argsort(dict_df["key"].to_numpy(), kind="stable")
        dict_df = dict_df.iloc[order].reset_index(drop=True)
        out_t = pa.Table.from_pandas(dict_df, preserve_index=False)
        # terms.parquet lands last: completion marker
        st.write_parquet_atomic(out_t, st.sjoin(shard_dir, "terms.parquet"))
        return pa.table({"sid": pa.array([sid], pa.int32()),
                         "num_terms": pa.array([len(dict_df)], pa.int64())})

    def _apply_deletes(self, dict_df, post_blob: bytes, pos_blob: bytes,
                       bm_blob: bytes = b""):
        """Filter deleted global docs out of each run.

        Runs whose doc RANGE contains no tombstone (the vast majority —
        a delete usually touches a handful of docs in a 100M-doc index)
        are byte-copied verbatim: the range check reads only the run's
        skip header, never decoding. Only intersecting runs pay the
        decode -> filter -> re-encode."""
        deleted_global = np.sort(np.concatenate(
            [dels.astype(np.int64) + off
             for dels, off in zip(self.deleted, self.doc_offsets)
             if len(dels)]))
        cols = {k: dict_df[k].to_numpy() for k in dict_df.columns}
        new_post, new_pos, new_bm = bytearray(), bytearray(), bytearray()
        rows: dict[str, list] = {k: [] for k in dict_df.columns}
        has_bm = "bm_offset" in dict_df.columns

        def emit(i: int, **over) -> None:
            for k in dict_df.columns:
                rows[k].append(over.get(k, cols[k][i]))

        for i in range(len(dict_df)):
            offset = int(cols["offset"][i])
            base = int(cols["run_base"][i])
            skip = pcodec.read_skip(post_blob, offset)
            hi = base + int(skip.last_doc[-1]) + 1
            if (np.searchsorted(deleted_global, base)
                    == np.searchsorted(deleted_global, hi)):
                over = {"offset": len(new_post)}
                nb = int(cols["nbytes"][i])
                new_post.extend(post_blob[offset:offset + nb])
                if int(cols["pos_offset"][i]) >= 0:
                    p0 = int(cols["pos_offset"][i])
                    pnb = int(cols["pos_nbytes"][i])
                    over["pos_offset"] = len(new_pos)
                    new_pos.extend(pos_blob[p0:p0 + pnb])
                if has_bm and int(cols["bm_offset"][i]) >= 0:
                    b0 = int(cols["bm_offset"][i])
                    bnb = int(cols["bm_nbytes"][i])
                    over["bm_offset"] = len(new_bm)
                    new_bm.extend(bm_blob[b0:b0 + bnb])
                emit(i, **over)
                continue
            docs, tfs = pcodec.decode_postings(post_blob, offset)
            gdocs = docs.astype(np.int64) + base
            idx = np.searchsorted(deleted_global, gdocs)
            idx_ok = idx < len(deleted_global)
            dead = np.zeros(len(gdocs), bool)
            dead[idx_ok] = deleted_global[idx[idx_ok]] == gdocs[idx_ok]
            if dead.all():
                continue
            keep = ~dead
            pos_bytes = b""
            if int(cols["pos_offset"][i]) >= 0:
                pos = pcodec.decode_positions(pos_blob,
                                              int(cols["pos_offset"][i]))
                off = np.concatenate(([0], np.cumsum(tfs, dtype=np.int64)))
                keep_pos = np.concatenate(
                    [pos[off[j]:off[j + 1]] for j in np.flatnonzero(keep)]
                ) if keep.any() else np.empty(0, np.uint32)
                pos_bytes = pcodec.encode_positions(keep_pos)
            blob = pcodec.encode_postings(docs[keep], tfs[keep])
            over = {"df": int(keep.sum()), "ttf": int(tfs[keep].sum()),
                    "offset": len(new_post), "nbytes": len(blob)}
            if has_bm:
                # re-encoded run: block boundaries moved and the merge
                # has no doc->fieldnorm map here — drop the frontier
                # (readers then never prune this run; still correct)
                over["bm_offset"] = -1
                over["bm_nbytes"] = 0
            new_post.extend(blob)
            if pos_bytes:
                over["pos_offset"] = len(new_pos)
                over["pos_nbytes"] = len(pos_bytes)
                new_pos.extend(pos_bytes)
            emit(i, **over)
        import pandas as pd
        return pd.DataFrame(rows), bytes(new_post), bytes(new_pos), \
            bytes(new_bm)


def merge_indexes(index_dirs: list[str], out_dir: str,
                  delete_queries: list | None = None,
                  concurrency: int | None = None,
                  skip_corrupt: bool = False) -> MergeResult:
    """Merge N indexes built with identical schema + num_shards.

    ``skip_corrupt=True`` validates every input up front (footer-only)
    and drops unreadable/truncated ones with a ``SkippedSplit`` record
    instead of aborting — the reference's skipped-splits contract
    (``QuickwitSplit.java:140-158``). The merge then completes over the
    sound inputs; skipped dirs are recorded in ``MergeResult.skipped``
    and in the output manifest's ``plan.skipped_inputs``."""
    import ray
    import ray.data

    t0 = time.monotonic()
    skipped: list[SkippedSplit] = []
    # validate every input up front — footer-only, distributed (10^4
    # inputs is a Dataset map, not a driver loop). Without this, the
    # byte-copy fast path would stream a truncated postings.bin into the
    # output and the corruption surfaces only at query time.
    items = [{"d": d} for d in index_dirs]

    def check(b: pa.Table) -> pa.Table:
        ds_ = b.column("d").to_pylist()
        return pa.table({
            "d": pa.array(ds_),
            "reason": pa.array([_validate_input(x) or "" for x in ds_])})

    res = (ray.data.from_items(items)
           .map_batches(check, batch_format="pyarrow").take_all())
    bad = {r["d"]: r["reason"] for r in res if r["reason"]}
    if bad and not skip_corrupt:
        raise ValueError(
            "corrupt merge input(s) (pass skip_corrupt=True to merge "
            "the sound inputs and record these as skipped): "
            + "; ".join(f"{d}: {r}" for d, r in bad.items()))
    skipped = [SkippedSplit(d, bad[d]) for d in index_dirs if d in bad]
    index_dirs = [d for d in index_dirs if d not in bad]
    if not index_dirs:
        raise ValueError(
            "every merge input was skipped: "
            + "; ".join(f"{s.index_dir}: {s.reason}" for s in skipped))
    states = _load_states(index_dirs)
    metas = [s["meta"] for s in states]
    nshards = {m["plan"]["num_shards"] for m in metas}
    if len(nshards) != 1:
        raise ValueError(f"inputs disagree on num_shards: {nshards}")
    nshards = nshards.pop()
    schemas = {json.dumps(m["schema"], sort_keys=True) for m in metas}
    if len(schemas) != 1:
        raise ValueError("inputs disagree on schema")
    # capability stamps must agree too: stamping metas[0]'s features on
    # a merge that includes an input WITHOUT them (e.g. pre-u128 IP
    # terms) would make readers trust queries that silently miss every
    # doc from the older input
    feats = {tuple(sorted((m.get("config") or {})
                          .get("index_features", []))) for m in metas}
    if len(feats) != 1:
        raise ValueError(
            f"inputs disagree on index_features: {sorted(feats)} — "
            f"rebuild the older input before merging")
    # placement/column-affecting config must agree too: the output
    # stamps metas[0]'s config, so an input with MORE hot salts would
    # have runs readers never probe, and a mixed exact_fieldnorms /
    # phash_fields merge crashes every docdata read of the missing
    # dl__/_phash_ columns
    crit = {(int((m.get("config") or {}).get("hot_salts", 4)),
             bool((m.get("config") or {}).get("exact_fieldnorms", False)),
             tuple(sorted((m.get("config") or {}).get("phash_fields")
                          or ())),
             # bm25 k1/b: the merged meta stamps metas[0]'s values and
             # IndexReader scores with them — mixed inputs would
             # silently rescore the others' docs under foreign params
             tuple(sorted(((m.get("config") or {}).get("bm25")
                           or {"k1": 1.2, "b": 0.75}).items()))) for m in metas}
    if len(crit) != 1:
        raise ValueError(
            f"inputs disagree on hot_salts/exact_fieldnorms/phash_fields/"
            f"bm25: {sorted(crit)} — rebuild with matching config before "
            f"merging")

    doc_offsets: list[int] = []
    base = 0
    for m in metas:
        doc_offsets.append(base)
        base += m["stats"]["num_docs"]

    from tantivy4java_ray import storage as st

    # carry forward the inputs' existing tombstones: docdata files are
    # copied verbatim below, so the merged index must keep masking those
    # rows. Input postings already EXCLUDE their own tombstoned docs (the
    # delete re-encode happened when they were created), so carried
    # tombstones do NOT force the re-encode path — only new
    # ``delete_queries`` deletions do.
    carried: list[np.ndarray] = []
    for d in index_dirs:
        dpath = st.sjoin(d, "deleted_docs.npy")
        if st.sexists(dpath):
            with st.sopen(dpath, "rb") as f:
                carried.append(np.load(f).astype(np.int64))
        else:
            carried.append(np.empty(0, np.int64))

    deleted_per_index: list[np.ndarray] | None = None
    num_deleted = 0
    if delete_queries:
        from tantivy4java_ray.pipelines.search import IndexReader
        deleted_per_index = []
        for d, off in zip(index_dirs, doc_offsets):
            r = IndexReader(d)
            dels = []
            for entry in delete_queries:
                # (query, cutoff): opstamp-ordered writer deletes — the
                # query only affects OUTPUT doc ids under the cutoff
                # (docs that existed when the delete was staged)
                q, cutoff = (entry if isinstance(entry, tuple)
                             else (entry, None))
                arr = r.evaluate(q)[0]
                if cutoff is not None:
                    arr = arr[arr + off < cutoff]
                dels.append(arr)
            arr = (np.unique(np.concatenate(dels)) if dels
                   else np.empty(0, np.int64))
            deleted_per_index.append(arr)
            num_deleted += len(arr)
    st.smakedirs(out_dir)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    conc = max(1, min(concurrency or nshards, nshards, cpus - 2))
    shard_ds = ray.data.from_items([{"sid": s} for s in range(nshards)],
                                   override_num_blocks=nshards)
    stats = shard_ds.map_batches(
        _ShardMerger,
        fn_constructor_kwargs=dict(index_dirs=index_dirs, out_dir=out_dir,
                                   doc_offsets=doc_offsets,
                                   deleted_per_index=deleted_per_index),
        batch_format="pyarrow", batch_size=None,
        concurrency=conc, num_cpus=1).take_all()

    # docdata + manifest: re-base partitions, copy docdata files
    st.smakedirs(st.sjoin(out_dir, "docdata"))
    parts_out = []
    new_pid = 0
    for i, s in enumerate(states):
        parts = sorted(s["partitions"].values(), key=lambda p: p["doc_base"])
        for p in parts:
            src = st.sjoin(index_dirs[i], "docdata",
                           f"part-{p['pid']:05d}.parquet")
            dst = st.sjoin(out_dir, "docdata",
                           f"part-{new_pid:05d}.parquet")
            if not st.sexists(dst):
                if not st.is_url(src) and not st.is_url(dst):
                    try:
                        os.link(src, dst)
                    except OSError:
                        shutil.copyfile(src, dst)
                else:
                    with st.sopen(src, "rb") as fi:
                        st.write_bytes_atomic(fi.read(), dst)
            q = dict(p)
            q["pid"] = new_pid
            q["doc_base"] = p["doc_base"] + doc_offsets[i]
            q["lineage"] = {"merged_from": index_dirs[i],
                            "source_pid": p["pid"]}
            parts_out.append(q)
            new_pid += 1

    total_tokens: dict[str, int] = {}
    for m in metas:
        for f_, t_ in m["stats"]["total_tokens"].items():
            total_tokens[f_] = total_tokens.get(f_, 0) + t_
    num_docs = base
    meta0 = metas[0]
    stats_obj = {"num_docs": num_docs, "total_tokens": total_tokens,
                 "avgdl": {f_: t_ / num_docs if num_docs else 0.0
                           for f_, t_ in total_tokens.items()}}

    txlog = TransactionLog(out_dir)
    actions: list[dict] = [{"set_meta": {
        "plan": {"files": sum((m["plan"]["files"] for m in metas), []),
                 "num_docs": num_docs, "num_partitions": len(parts_out),
                 "num_shards": nshards,
                 "merged_from": index_dirs,
                 "skipped_inputs": [{"index_dir": s.index_dir,
                                     "reason": s.reason}
                                    for s in skipped]},
        "schema": meta0["schema"], "config": meta0["config"]}}]
    actions += [{"add_partition": p} for p in parts_out]
    actions += [{"add_shard": {k: (v.item() if hasattr(v, "item") else v)
                               for k, v in s.items()}} for s in stats]
    actions.append({"set_meta": {"stats": stats_obj}})
    tomb_parts = [d + off for d, off in zip(carried, doc_offsets)
                  if len(d)]
    if deleted_per_index is not None:
        tomb_parts += [d + off for d, off
                       in zip(deleted_per_index, doc_offsets) if len(d)]
    if tomb_parts:
        all_del = np.unique(np.concatenate(tomb_parts))
        import io as _io
        _b = _io.BytesIO()
        np.save(_b, all_del)
        st.write_bytes_atomic(_b.getvalue(),
                              st.sjoin(out_dir, "deleted_docs.npy"))
        actions.append({"set_meta": {"deleted_docs": int(len(all_del))}})
    actions.append({"commit": {"ts": time.time()}})
    txlog.append(actions)
    txlog.create_checkpoint()
    atomic_write_json(st.sjoin(out_dir, "manifest.json"),
                      txlog.read_state())
    return MergeResult(out_dir, num_docs, num_deleted,
                       time.monotonic() - t0, skipped=skipped or None)
