"""SIGKILL-resume soak against an EMULATED OBJECT STORE (moto S3).

The round-3 soak proved hard-kill resume parity on local disk; this one
moves every index artifact — partials, shards, docdata, txlog — to an
in-process S3 server and repeats the protocol:

  1. child A starts a distributed build writing to s3://<bucket>/idx
  2. the parent polls the STORE for landed partial checkpoints and
     SIGKILLs child A's whole process group mid-map
  3. child B re-runs the same build command in a fresh process — it must
     resume from the s3 txlog/checkpoints, skipping finished partitions
  4. child C builds the same corpus single-shot to s3://<bucket>/idx2
  5. the two s3 indexes must agree EXACTLY: num_docs, per-term doc
     freqs, and top-20 (score, doc) hits for term/boolean/phrase queries

Run: python scripts/soak_kill_resume_s3.py  (prints a JSON verdict).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUCKET = "t4jr-kill-soak"
N_DOCS = 40_000
DATA = "/tmp/t4jr_soak_kill/data"

BUILD_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.schema import IndexSchema
s = IndexSchema()
s.add_text_field("text", index_option="position")
s.add_string_field("lang", fast=True)
res = build_index({data!r} + "/*.parquet", {idx!r}, s,
                  num_shards=4, target_docs_per_partition=2000,
                  html_fallback=("text", "html"))
print("BUILT", res.num_docs)
ray.shutdown()
"""


def start_moto() -> tuple[str, object]:
    from wsgiref.simple_server import WSGIServer, make_server

    from moto.moto_server.werkzeug_app import (DomainDispatcherApplication,
                                               create_backend_app)

    class _Threading(WSGIServer):
        daemon_threads = True

        def process_request(self, request, client_address):
            t = threading.Thread(target=self._work,
                                 args=(request, client_address), daemon=True)
            t.start()

        def _work(self, request, client_address):
            try:
                self.finish_request(request, client_address)
            except Exception:
                pass
            finally:
                self.shutdown_request(request)

    import wsgiref.simple_server as ss
    app = DomainDispatcherApplication(create_backend_app)

    class _Quiet(ss.WSGIRequestHandler):
        def log_message(self, *a):
            pass

    srv = make_server("127.0.0.1", 0, app, server_class=_Threading,
                      handler_class=_Quiet)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_port}", srv


def child_env(endpoint: str) -> dict:
    env = dict(os.environ)
    env.update({"AWS_ACCESS_KEY_ID": "soak-key",
                "AWS_SECRET_ACCESS_KEY": "soak-secret",
                "AWS_ENDPOINT_URL": endpoint,
                "AWS_DEFAULT_REGION": "us-east-1",
                # don't let a leftover conf file shadow the env
                "T4JR_S3_CONF": "/tmp/t4jr_soak_kill/conf-absent.json",
                "PYTHONPATH": REPO})
    return env


def run_build(idx: str, env: dict, kill_after_partials: int | None,
              s3) -> tuple[int, int]:
    """Returns (returncode, n_partials_at_kill)."""
    code = BUILD_SNIPPET.format(repo=REPO, data=DATA, idx=idx)
    p = subprocess.Popen([sys.executable, "-c", code], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         start_new_session=True)
    npart = 0
    if kill_after_partials is None:
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            print(out.decode()[-2000:])
        return p.returncode, 0
    prefix = idx.split("/", 3)[3] + "/_partials/"
    deadline = time.time() + 300
    while time.time() < deadline:
        if p.poll() is not None:
            raise SystemExit(
                f"build finished before the kill (partials seen {npart}) — "
                f"corpus too small for this host; raise N_DOCS")
        r = s3.list_objects_v2(Bucket=BUCKET, Prefix=prefix)
        done = {k["Key"].split("/")[-2] for k in r.get("Contents", [])
                if k["Key"].endswith(".complete-v3")}
        npart = len(done)
        if npart >= kill_after_partials:
            os.killpg(p.pid, signal.SIGKILL)
            p.wait()
            return -9, npart
        time.sleep(0.15)
    raise SystemExit("timed out waiting for partials to land")


def main() -> None:
    os.makedirs(os.path.dirname(DATA), exist_ok=True)
    endpoint, srv = start_moto()
    import boto3
    s3 = boto3.client("s3", endpoint_url=endpoint,
                      aws_access_key_id="soak-key",
                      aws_secret_access_key="soak-secret",
                      region_name="us-east-1")
    s3.create_bucket(Bucket=BUCKET)

    if not os.path.exists(DATA):
        sys.path.insert(0, REPO)
        from tantivy4java_ray.sources.webpages import write_webpages
        write_webpages(DATA, N_DOCS, n_files=4, rows_per_row_group=1000)

    env = child_env(endpoint)
    idx_a = f"s3://{BUCKET}/idx"
    idx_c = f"s3://{BUCKET}/idx2"

    rc, npart = run_build(idx_a, env, kill_after_partials=2, s3=s3)
    assert rc == -9, rc
    print(f"killed -9 mid-map with {npart} partial checkpoints on s3")

    rc, _ = run_build(idx_a, env, kill_after_partials=None, s3=s3)
    assert rc == 0, "resume build failed"
    rc, _ = run_build(idx_c, env, kill_after_partials=None, s3=s3)
    assert rc == 0, "single-shot build failed"

    # compare the two s3 indexes in THIS process
    os.environ.update({k: env[k] for k in
                       ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY",
                        "AWS_ENDPOINT_URL", "AWS_DEFAULT_REGION",
                        "T4JR_S3_CONF")})
    sys.path.insert(0, REPO)
    from tantivy4java_ray.sources.s3boto import (S3BotoFileSystem,
                                                 ensure_registered)
    S3BotoFileSystem.clear_instance_cache()
    ensure_registered()
    from tantivy4java_ray.pipelines.search import IndexReader
    ra, rc_ = IndexReader(idx_a), IndexReader(idx_c)
    assert ra.num_docs == rc_.num_docs == N_DOCS
    terms = [f"w{i:04d}" for i in range(0, 2000, 97)] + ["needleterm"]
    for t in terms:
        assert ra.doc_freq("text", t) == rc_.doc_freq("text", t), t
    queries = ["needleterm", "w0001 AND w0042",
               'text:"alpha bravo charlie"']
    for q in queries:
        ha = ra.search(q, 20).hits
        hc = rc_.search(q, 20).hits
        assert [h[1] for h in ha] == [h[1] for h in hc], q
        assert [h[0] for h in ha] == [h[0] for h in hc], q
    print(json.dumps({"soak": "kill_resume_s3", "ok": True,
                      "num_docs": N_DOCS,
                      "partials_at_kill": npart,
                      "terms_checked": len(terms),
                      "queries_checked": len(queries)}))
    srv.shutdown()


if __name__ == "__main__":
    main()
