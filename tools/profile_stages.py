"""Stage attribution for the serving pipeline via full-program deltas.

Per docs/PALLAS_NOTES.md, partial-program timings through the remote-attached
TPU are unreliable (small-output executions are acknowledged early); the only
trustworthy numbers are steady-state timings of FULL pipelines with distinct
inputs. This tool times the complete lidar->boxes program under a set of
stage toggles and reports the deltas:

  pure        all 27 BEV channels in-graph + front + net + NMS  (the baseline)
  aux0        heights in-graph, aux channels passed in          (aux cost)
  front0      front view passed in                              (front cost)
  xla-heights pure, but heights via XLA scatter (no Pallas)     (kernel win)
  net-only    all views passed in                               (voxelize cost)

Usage:  python tools/profile_stages.py [--batch 8] [--iters 12]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--distinct", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mv3d_tpu.config import kitti_config
    from mv3d_tpu.models.mv3d_net import MV3DNet
    from mv3d_tpu.ops import voxelize

    B, N_MEAS, N_DIST = args.batch, args.iters, args.distinct
    on_tpu = jax.default_backend() != "cpu"
    base_cfg = kitti_config()
    log(f"devices: {jax.devices()}  batch={B}")

    cfg_pallas = dataclasses.replace(base_cfg, pipeline=dataclasses.replace(
        base_cfg.pipeline, use_pallas_heights=on_tpu))
    model = MV3DNet(cfg_pallas)
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    n_pts = cfg_pallas.pipeline.max_points
    rng = np.random.RandomState(0)

    def cloud(b):
        return np.stack([
            rng.uniform(0, 80, (b, n_pts)), rng.uniform(-30, 30, (b, n_pts)),
            rng.uniform(-4.2, 0.8, (b, n_pts)), rng.uniform(0, 1, (b, n_pts)),
        ], axis=-1).astype(np.float32)

    pts = [jax.device_put(jnp.asarray(cloud(B))) for _ in range(N_DIST)]
    rgbs = [jax.device_put(jnp.asarray(
        rng.rand(B, *cfg_pallas.rgb_shape).astype(np.float32)))
        for _ in range(N_DIST)]
    t = cfg_pallas.top
    aux0 = jax.device_put(jnp.zeros((B, t.xn, t.yn, 2), jnp.float32))
    front0 = jax.device_put(jnp.zeros((B, *cfg_pallas.front_shape),
                                      jnp.float32))
    top0 = jax.device_put(jnp.zeros((B, *cfg_pallas.top_shape), jnp.float32))

    def timed(name, fn, arglists):
        f = jax.jit(fn)
        out = f(*arglists[0])
        jax.block_until_ready(out)
        for i in range(2 * N_DIST):
            out = f(*arglists[i % N_DIST])
        jax.block_until_ready(out)
        t0 = time.time()
        outs = []
        for i in range(N_MEAS):
            outs.append(f(*arglists[i % N_DIST]))
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / N_MEAS / B * 1000
        log(f"{name:14s} {dt:7.2f} ms/frame   ({B/(dt*B/1000):.1f} fps)")
        return dt

    def make_full(cfg, mdl, aux=False, frontz=False):
        def fn(variables, points, rgb, *extra):
            i = 0
            auxv = None
            if aux:
                auxv, i = extra[i], i + 1
            top = voxelize.lidar_to_top_batch(points, cfg, aux=auxv)
            front = (extra[i] if frontz
                     else voxelize.lidar_to_front_batch(points, cfg))
            dets, _ = mdl.forward_inference(variables, top, rgb, front,
                                            score_threshold=0.05)
            return dets.boxes3d, dets.probs, dets.mask
        return fn

    results = {}
    results["pure"] = timed(
        "pure", make_full(cfg_pallas, model),
        [(variables, pts[i], rgbs[i]) for i in range(N_DIST)])
    results["aux0"] = timed(
        "aux0", make_full(cfg_pallas, model, aux=True),
        [(variables, pts[i], rgbs[i], aux0) for i in range(N_DIST)])
    results["front0"] = timed(
        "front0", make_full(cfg_pallas, model, frontz=True),
        [(variables, pts[i], rgbs[i], front0) for i in range(N_DIST)])

    if on_tpu:
        cfg_xla = dataclasses.replace(base_cfg, pipeline=dataclasses.replace(
            base_cfg.pipeline, use_pallas_heights=False))
        model_xla = MV3DNet(cfg_xla)
        results["xla-heights"] = timed(
            "xla-heights", make_full(cfg_xla, model_xla),
            [(variables, pts[i], rgbs[i]) for i in range(N_DIST)])

    def net_only(variables, top, rgb, front):
        dets, _ = model.forward_inference(variables, top, rgb, front,
                                          score_threshold=0.05)
        return dets.boxes3d, dets.probs, dets.mask

    fronts = [jax.jit(lambda p: voxelize.lidar_to_front_batch(p, cfg_pallas)
                      )(pts[i]) for i in range(N_DIST)]
    results["net-only"] = timed(
        "net-only", net_only,
        [(variables, top0, rgbs[i], fronts[i]) for i in range(N_DIST)])

    log("")
    log("deltas (ms/frame):")
    log(f"  aux channels (intensity+density scatters): "
        f"{results['pure'] - results['aux0']:+.2f}")
    log(f"  front view:                                "
        f"{results['pure'] - results['front0']:+.2f}")
    if "xla-heights" in results:
        log(f"  Pallas height kernel vs XLA scatter:       "
            f"{results['xla-heights'] - results['pure']:+.2f}")
    log(f"  total voxelize (pure - net-only):          "
        f"{results['pure'] - results['net-only']:+.2f}")
    print(results)


if __name__ == "__main__":
    main()
