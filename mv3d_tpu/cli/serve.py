"""Minimal production serving endpoint over an exported AOT artifact.

    python -m mv3d_tpu.cli.serve --artifact artifacts/mv3d --port 8472

Serves the frozen lidar->boxes program (mv3d_tpu/serving jax.export
artifact — StableHLO + weights + meta; no model code needed) over plain
HTTP with zero dependencies beyond the stdlib:

  * ``GET  /healthz``  -> 200 JSON: artifact meta (shapes, flags, versions)
  * ``POST /predict``  -> body is an ``.npz`` archive with ``points``
    (M, 4) float32 and ``rgb`` (H, W, 3); response is an ``.npz`` with
    ``boxes3d`` (K, 8, 3) and ``probs`` (K,). Send
    ``Accept: application/json`` for a JSON response instead.

The reference has no serving story at all — deployment re-runs the TF
graph-building source in-process (reference mv3d.py:666-691). Batch
assembly is the client's business here: the endpoint is frame-at-a-time
(batch_size=1 artifacts); put a standard HTTP load balancer in front for
fan-out, or use `parallel.make_sharded_infer_step` in-process for
multi-chip batch serving.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="serve an exported MV3D "
                                             "artifact over HTTP")
    ap.add_argument("--artifact", required=True,
                    help="artifact dir written by cli/export")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8472)
    return ap.parse_args(argv)


def make_server(artifact_dir: str, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``server_address[1]`` is the
    bound port (useful with port=0 in tests)."""
    from ..serving import load_serving

    model = load_serving(artifact_dir)
    if model.meta["batch_size"] != 1:
        raise ValueError("serve needs a batch_size=1 artifact "
                         f"(got {model.meta['batch_size']}); re-export with "
                         "--batch-size 1")
    lock = threading.Lock()   # one XLA program; serialize executions

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet: stderr access log off
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, b'{"error": "not found"}',
                                   "application/json")
            self._reply(200, json.dumps(
                {"status": "ok", **model.meta}).encode(),
                "application/json")

        def do_POST(self):
            if self.path != "/predict":
                return self._reply(404, b'{"error": "not found"}',
                                   "application/json")
            try:
                raw = self.rfile.read(int(self.headers["Content-Length"]))
                with np.load(io.BytesIO(raw)) as z:
                    points = z["points"]
                    rgb = z["rgb"]
                with lock:
                    boxes3d, probs = model.predict(points, rgb)
            except Exception as e:  # noqa: BLE001 — client gets the cause
                return self._reply(400, json.dumps(
                    {"error": repr(e)[:500]}).encode(), "application/json")
            if "application/json" in (self.headers.get("Accept") or ""):
                body = json.dumps({"boxes3d": boxes3d.tolist(),
                                   "probs": probs.tolist()}).encode()
                return self._reply(200, body, "application/json")
            buf = io.BytesIO()
            np.savez_compressed(buf, boxes3d=boxes3d, probs=probs)
            self._reply(200, buf.getvalue(), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    args = parse_args(argv)
    srv = make_server(args.artifact, args.host, args.port)
    host, port = srv.server_address[:2]
    print(f"serving {args.artifact} on http://{host}:{port} "
          f"(POST /predict, GET /healthz)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
