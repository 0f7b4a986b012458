"""Minimal production serving endpoint over an exported AOT artifact.

    python -m mv3d_tpu.cli.serve --artifact artifacts/mv3d --port 8472

Serves the frozen lidar->boxes program (mv3d_tpu/serving jax.export
artifact — StableHLO + weights + meta; no model code needed) over plain
HTTP with zero dependencies beyond the stdlib:

  * ``GET  /healthz``  -> 200 JSON: artifact meta (shapes, flags, versions)
  * ``POST /predict``  -> body is an ``.npz`` archive with ``points``
    (M, 4) float32 and ``rgb`` (H, W, 3); response is an ``.npz`` with
    ``boxes3d`` (K, 8, 3) and ``probs`` (K,). Send
    ``Accept: application/json`` for a JSON response instead. For a
    batched request against a batch>1 artifact, pack up to B frames as
    ``points_0/rgb_0 .. points_{F-1}/rgb_{F-1}``; the response carries
    ``boxes3d_i``/``probs_i`` per frame (JSON: a ``frames`` list).

The reference has no serving story at all — deployment re-runs the TF
graph-building source in-process (reference mv3d.py:666-691). Artifacts of
any frozen batch size are served: single-frame requests are padded to the
batch with empty frames (``ServingModel.predict_batch``); put a standard
HTTP load balancer in front for fan-out, or use
`parallel.make_sharded_infer_step` in-process for multi-chip batch serving.
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
                frames = []
                with np.load(io.BytesIO(raw)) as z:
                    if "points" in z.files:        # single frame
                        frames = [(z["points"], z["rgb"])]
                        batched = False
                    else:                          # points_0/rgb_0, ...
                        batched = True
                        i = 0
                        while f"points_{i}" in z.files:
                            frames.append((z[f"points_{i}"], z[f"rgb_{i}"]))
                            i += 1
                        if not frames:
                            raise ValueError(
                                "npz needs points/rgb or points_i/rgb_i")
                with lock:
                    results = model.predict_batch(frames)
            except Exception as e:  # noqa: BLE001 — client gets the cause
                return self._reply(400, json.dumps(
                    {"error": repr(e)[:500]}).encode(), "application/json")
            if "application/json" in (self.headers.get("Accept") or ""):
                if batched:
                    body = json.dumps({"frames": [
                        {"boxes3d": b.tolist(), "probs": p.tolist()}
                        for b, p in results]}).encode()
                else:
                    b, p = results[0]
                    body = json.dumps({"boxes3d": b.tolist(),
                                       "probs": p.tolist()}).encode()
                return self._reply(200, body, "application/json")
            buf = io.BytesIO()
            if batched:
                np.savez_compressed(buf, **{
                    k: v for i, (b, p) in enumerate(results)
                    for k, v in ((f"boxes3d_{i}", b), (f"probs_{i}", p))})
            else:
                np.savez_compressed(buf, boxes3d=results[0][0],
                                    probs=results[0][1])
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
