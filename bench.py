"""Benchmark: end-to-end lidar -> 3D boxes throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "e2e_fps", "value": <frames/sec>, "unit": "frames/sec",
     "vs_baseline": <value / 100.0>}

The denominator is the BASELINE.md target envelope (>=100 fps lidar->boxes on
one v5e for the full fusion pipeline); the reference itself publishes no
numbers (BASELINE.md) and its TF-1/CUDA stack cannot run here. vs_baseline > 1
means the target is beaten. Supplementary measurements go to stderr.

Configurations measured (every number is a measured steady-state wall time —
nothing is asserted from overlap arithmetic):

  pure-device   all 27 BEV channels + front + net + NMS in ONE XLA program
                (fused Pallas voxelizer sweep); inputs device-resident.
                This is the headline.
  streaming     the real BatchLoader prefetch thread computes the 2 aux BEV
                channels on the host (native C++) while the device runs the
                25 height channels + net; includes host->device transfers of
                every batch. Reported for the serving story; on this bench
                host the TPU sits behind a network relay, so transfer cost
                is an upper bound vs a real PCIe-attached host.

Measurement notes: the axon remote relay caches executions with identical
inputs and adds per-dispatch latency, so we (a) cycle through distinct input
batches and (b) enqueue the whole run before blocking once.

Robustness contract (the round-3 bench died rc=1 when the TPU relay was
down and recorded NOTHING): this script always prints exactly one parseable
JSON line on stdout and exits 0. Backend acquisition happens in a killable
subprocess probe with retries; on persistent TPU failure the bench falls
back to a scaled-down CPU run marked {"backend": "cpu", "degraded": true};
a SIGALRM/SIGTERM watchdog emits whatever has been measured so far if the
relay hangs mid-run (the axon retry loop can sleep forever).
"""

import dataclasses
import json
import os
import signal
import subprocess
import sys
import time
import traceback

import numpy as np

# serving batch: measured batch-32 knee on v5e — late-round-3 curve
# 16/32/64 = 203.9/213.0/210.6 fps (as the per-frame tail shrank, the
# fixed per-step dispatch amortizes further; b64 regresses on HBM
# pressure). Earlier knees for the record: b16 at 150.6-195.6 fps configs.
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
LOADER_WORKERS = int(os.environ.get("BENCH_LOADER_WORKERS", "1"))
N_WARM = 2
N_MEAS = 12
N_DISTINCT = 6
V5E_BF16_PEAK = 197e12      # TPU v5e: 197 TFLOP/s bf16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# The one official record. Updated in place as measurements land so the
# watchdog / exception paths can always emit the best-known partial state.
RESULT = {"metric": "e2e_fps", "value": 0.0, "unit": "frames/sec",
          "vs_baseline": 0.0}


def emit():
    print(json.dumps(RESULT), flush=True)


# Probe runs in a SUBPROCESS: when the relay is down, in-process backend
# init either raises (BENCH_r03) or sleeps in a retry loop forever — a
# subprocess is the only formulation that survives both failure modes.
_PROBE_SRC = ("import jax, sys; "
              "sys.exit(0 if any(d.platform != 'cpu' for d in jax.devices())"
              " else 3)")


def probe_tpu() -> bool:
    """True iff a non-CPU jax backend initializes, with retry+backoff.

    Patience is env-tunable and spans minutes by default (VERDICT r4: a
    relay that flaps back up inside the driver's bench window must not be
    missed): BENCH_PROBE_BACKOFF is a comma list of sleep-before-attempt
    seconds, BENCH_PROBE_TIMEOUT the per-attempt hang cutoff."""
    if os.environ.get("BENCH_FORCE_CPU"):
        return False
    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "150"))
    backoff = [float(x) for x in os.environ.get(
        "BENCH_PROBE_BACKOFF", "0,20,40,90,180").split(",")]
    for attempt, delay in enumerate(backoff, 1):
        if delay:
            log(f"TPU probe: retrying in {delay:.0f}s ...")
            time.sleep(delay)
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                               timeout=timeout, capture_output=True,
                               text=True)
        except subprocess.TimeoutExpired:
            log(f"TPU probe attempt {attempt}: hung >{timeout:.0f}s (relay "
                f"down?)")
            continue
        if r.returncode == 0:
            return True
        err = (r.stderr.strip().splitlines() or [""])[-1]
        log(f"TPU probe attempt {attempt}: rc={r.returncode} {err[:200]}")
    return False


# Pinned tiny-config CPU proxy throughput (frames/sec), measured on the
# round-5 build host at load ~1 (see BASELINE.md "CPU proxy" row). The
# proxy makes a chipless round regression-sensitive: the full-size degraded
# CPU number (0.21 fps, r04) is XLA:CPU-scatter noise, but the tiny-config
# pipeline compiles in seconds and tracks real e2e regressions, so every
# bench run emits cpu_proxy_fps + cpu_proxy_vs_pin against this value.
CPU_PROXY_PIN = 1.16   # fps, batch 4, round-5 build host, load ~1


def _cpu_proxy_main():
    """BENCH_CPU_PROXY_ONLY mode: tiny-config e2e fps on the CPU backend.

    Runs in its own interpreter so the platform pin can happen before any
    backend init (the axon plugin overrides JAX_PLATFORMS at interpreter
    start). Prints ONE JSON line {"cpu_proxy_fps": N, "batch": B}."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _host_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_config
    from mv3d_tpu.models.mv3d_net import MV3DNet
    from mv3d_tpu.ops import voxelize

    cfg = _tiny_config()
    model = MV3DNet(cfg)
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    b = int(os.environ.get("BENCH_CPU_PROXY_BATCH", "4"))
    n_pts = cfg.pipeline.max_points
    rng = np.random.RandomState(0)

    def cloud():
        return np.stack([
            rng.uniform(0, 16, (b, n_pts)), rng.uniform(-6, 6, (b, n_pts)),
            rng.uniform(-4, 0.8, (b, n_pts)), rng.uniform(0, 1, (b, n_pts)),
        ], axis=-1).astype(np.float32)

    batches = [jnp.asarray(cloud()) for _ in range(3)]
    rgbs = [jnp.asarray(rng.rand(b, *cfg.rgb_shape).astype(np.float32))
            for _ in range(3)]

    def full(variables, points, rgb):
        top, occ = voxelize.lidar_to_top_batch(points, cfg, return_occ=True)
        front = voxelize.lidar_to_front_batch(points, cfg)
        dets, _ = model.forward_inference(variables, top, rgb, front,
                                          score_threshold=0.05, top_occ=occ)
        return dets.boxes3d, dets.probs, dets.mask

    f = jax.jit(full)
    t0 = time.time()
    jax.block_until_ready(f(variables, batches[0], rgbs[0]))
    log(f"cpu proxy compile: {time.time()-t0:.1f}s")
    for i in range(6):
        out = f(variables, batches[i % 3], rgbs[i % 3])
    jax.block_until_ready(out)
    n_meas = 10
    t0 = time.time()
    outs = []
    for i in range(n_meas):
        outs.append(f(variables, batches[i % 3], rgbs[i % 3]))
        if len(outs) > 3:
            outs.pop(0)
    jax.block_until_ready(outs)
    fps = b / ((time.time() - t0) / n_meas)
    print(json.dumps({"cpu_proxy_fps": round(fps, 2), "batch": b}),
          flush=True)


def measure_cpu_proxy(timeout: float = 420.0):
    """Run the tiny-config CPU proxy in a subprocess; merge into RESULT."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "BENCH_CPU_PROXY_ONLY": "1"},
            capture_output=True, text=True, timeout=timeout)
        for ln in r.stderr.splitlines():
            log(f"proxy: {ln}")
        lines = [ln for ln in r.stdout.strip().splitlines() if ln]
        rec = json.loads(lines[-1])
        RESULT["cpu_proxy_fps"] = rec["cpu_proxy_fps"]
        if CPU_PROXY_PIN:
            RESULT["cpu_proxy_vs_pin"] = round(
                rec["cpu_proxy_fps"] / CPU_PROXY_PIN, 3)
        log(f"cpu proxy (tiny config, batch {rec['batch']}): "
            f"{rec['cpu_proxy_fps']} fps (pin {CPU_PROXY_PIN})")
    except Exception as e:   # the proxy must never sink the official line
        log(f"cpu proxy failed: {e!r}")


def _host_cache_dir():
    """Host-keyed persistent XLA compile cache (same scheme as conftest.py:
    AOT entries from a different machine type load with SIGILL risk)."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    key = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".jax_cache", key)


def main(on_tpu: bool):
    global BATCH, N_WARM, N_MEAS, N_DISTINCT
    import jax
    import jax.numpy as jnp

    from mv3d_tpu.config import kitti_config
    from mv3d_tpu.models.mv3d_net import MV3DNet
    from mv3d_tpu.ops import voxelize, voxelize_ref

    if not on_tpu:
        # Degraded CPU fallback: tiny batch, few steps, headline only —
        # the point is a parseable record, not a meaningful CPU number.
        BATCH = int(os.environ.get("BENCH_CPU_BATCH", "2"))
        N_WARM, N_MEAS, N_DISTINCT = 1, 3, 2
        jax.config.update("jax_compilation_cache_dir", _host_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    run_supplementary = on_tpu or bool(os.environ.get("BENCH_CPU_FULL"))
    cfg = kitti_config()
    if on_tpu:
        # Pallas kernels (compiled path only): fused sweep for pure-device,
        # height-only kernel for the streaming path. Serving layout "s2d2p":
        # the kernel's lane-padded block output IS the split conv stem's
        # (H/2, W2P, 128) input — zero relayout anywhere — function-
        # equivalent to the standard view (bit-exact vs s2d2 on TPU, and
        # s2d2 is a tested channel permutation of the standard view).
        # Measured r3 (batch 16): s2d2 151.9 -> s2d2p 164.8 -> 168.1 fps
        # (dynamic chunk counts + 4096-supercell tiles).
        cfg = dataclasses.replace(cfg, pipeline=dataclasses.replace(
            cfg.pipeline, use_pallas_fused=True, use_pallas_heights=True,
            view_layout="s2d2p", top_view_dtype="bfloat16"))
        # ROI-align as separable MXU einsums instead of XLA gathers:
        # measured r5 delta -0.30 ms/frame at batch 32 (6.48 -> 6.18 on the
        # non-s2d2p attribution config; tools/profile_net_stages.py
        # --roi-matmul). Parity: tests/test_ops.py roi_align_matmul_parity.
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, roi_align_impl="matmul"))
    model = MV3DNet(cfg)
    log(f"devices: {jax.devices()}  batch={BATCH} "
        f"pallas_fused={cfg.pipeline.use_pallas_fused}")

    t0 = time.time()
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    log(f"init: {time.time()-t0:.1f}s")

    n_pts = cfg.pipeline.max_points
    rng = np.random.RandomState(0)

    def cloud(b):
        return np.stack([
            rng.uniform(0, 80, (b, n_pts)), rng.uniform(-30, 30, (b, n_pts)),
            rng.uniform(-4.2, 0.8, (b, n_pts)), rng.uniform(0, 1, (b, n_pts)),
        ], axis=-1).astype(np.float32)

    host_clouds = [cloud(BATCH) for _ in range(N_DISTINCT)]
    batches = [jax.device_put(jnp.asarray(c)) for c in host_clouds]
    rgbs = [jax.device_put(jnp.asarray(
        rng.rand(BATCH, *cfg.rgb_shape).astype(np.float32)))
        for _ in range(N_DISTINCT)]

    # ---- pure-device: one XLA program, device-resident inputs --------------
    def full(variables, points, rgb):
        top, occ = voxelize.lidar_to_top_batch(points, cfg,
                                               return_occ=True)
        front = voxelize.lidar_to_front_batch(points, cfg)
        dets, _ = model.forward_inference(variables, top, rgb, front,
                                          score_threshold=0.05, top_occ=occ)
        return dets.boxes3d, dets.probs, dets.mask

    f = jax.jit(full)
    t0 = time.time()
    out = f(variables, batches[0], rgbs[0])
    jax.block_until_ready(out)
    log(f"compile: {time.time()-t0:.1f}s")

    for i in range(N_WARM * N_DISTINCT):
        out = f(variables, batches[i % N_DISTINCT], rgbs[i % N_DISTINCT])
    jax.block_until_ready(out)

    t0 = time.time()
    outs = []
    for i in range(N_MEAS):
        outs.append(f(variables, batches[i % N_DISTINCT],
                      rgbs[i % N_DISTINCT]))
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / N_MEAS
    fps = BATCH / dt
    log(f"e2e pure-device: {dt*1000:.2f} ms/step ({dt/BATCH*1000:.2f} "
        f"ms/frame) = {fps:.1f} frames/sec")
    # record the headline immediately: any later hang/crash still reports it
    RESULT.update(value=round(fps, 2), vs_baseline=round(fps / 100.0, 3),
                  batch=BATCH)

    if not run_supplementary:
        return

    # MFU: XLA's own FLOP count for the full program / measured time / peak
    from mv3d_tpu.utils.macs import flops_of
    fl = flops_of(full, variables, batches[0], rgbs[0])
    if fl:
        mfu = fl / BATCH / (dt / BATCH) / V5E_BF16_PEAK
        log(f"compiled flops: {fl/BATCH/1e9:.2f} GFLOP/frame -> "
            f"MFU {mfu*100:.1f}% of v5e bf16 peak "
            f"(detection is scatter/vector-bound, not MXU-bound)")

    # ---- supplementary: int8 serving quantization (BENCH_QUANT=1) ----------
    # model.quant="int8": trunk/ROI-tower/fusion matmuls run int8 on the MXU
    # (ops/quantized.py; v5e int8 peak is 2x bf16). The param tree is
    # identical to the float model's, so the same `variables` serve both.
    if os.environ.get("BENCH_QUANT"):
        try:
            qm_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
                cfg.model, quant="int8"))
            qmodel = MV3DNet(qm_cfg)

            def full_q(variables, points, rgb):
                top, occ = voxelize.lidar_to_top_batch(points, qm_cfg,
                                                       return_occ=True)
                front = voxelize.lidar_to_front_batch(points, qm_cfg)
                dets, _ = qmodel.forward_inference(variables, top, rgb, front,
                                                   score_threshold=0.05,
                                                   top_occ=occ)
                return dets.boxes3d, dets.probs, dets.mask

            fQ = jax.jit(full_q)
            t0 = time.time()
            outq = fQ(variables, batches[0], rgbs[0])
            jax.block_until_ready(outq)
            log(f"int8 compile: {time.time()-t0:.1f}s")
            for i in range(N_WARM * N_DISTINCT):
                outq = fQ(variables, batches[i % N_DISTINCT],
                          rgbs[i % N_DISTINCT])
            jax.block_until_ready(outq)
            t0 = time.time()
            outs_q = []
            for i in range(N_MEAS):
                outs_q.append(fQ(variables, batches[i % N_DISTINCT],
                                 rgbs[i % N_DISTINCT]))
                if len(outs_q) > 4:
                    outs_q.pop(0)
            jax.block_until_ready(outs_q)
            dt_qm = (time.time() - t0) / N_MEAS
            # detection agreement vs the float pipeline on batch 0
            bf, pf, mf = (np.asarray(x) for x in
                          f(variables, batches[0], rgbs[0]))
            bq, pq, mq = (np.asarray(x) for x in
                          fQ(variables, batches[0], rgbs[0]))
            agree = (mf == mq).mean()
            log(f"e2e pure-device INT8 (model.quant=int8): "
                f"{dt_qm*1000:.2f} ms/step ({dt_qm/BATCH*1000:.2f} ms/frame) "
                f"= {BATCH/dt_qm:.1f} frames/sec ({(BATCH/dt_qm)/fps:.2f}x "
                f"the bf16 pipeline); detection-mask agreement vs float "
                f"{agree*100:.1f}%")
        except Exception as e:   # keep the official JSON line alive
            log(f"int8 bench section failed: {e!r}")

    # ---- supplementary: multi-chip serving fan-out (BENCH_MESH=1) ----------
    # Shards the pure-device program over ALL visible devices with
    # make_sharded_infer_step (batch P("data"), params replicated) — the
    # ROADMAP "multi-slice serving fan-out" row. Inference has no
    # cross-device communication, so fps should scale ~linearly with chips;
    # on this 1-chip bench host it degenerates to the headline measurement
    # and exists so any multi-chip deployment gets its number for free.
    if os.environ.get("BENCH_MESH"):
        try:
            from mv3d_tpu.parallel.mesh import (make_mesh, replicate,
                                                make_sharded_infer_step)
            ndev = len(jax.devices())
            mesh = make_mesh(ndev)
            mvars = replicate(variables, mesh)
            infer = make_sharded_infer_step(model, mesh,
                                            score_threshold=0.05)
            gb = BATCH * ndev
            mbatches = [jax.device_put(jnp.asarray(np.concatenate(
                [host_clouds[(i + j) % N_DISTINCT] for j in range(ndev)])))
                for i in range(N_DISTINCT)]
            mrgbs = [jax.device_put(jnp.asarray(rng.rand(
                gb, *cfg.rgb_shape).astype(np.float32)))
                for _ in range(N_DISTINCT)]
            t0 = time.time()
            d = infer(mvars, mbatches[0], mrgbs[0])
            jax.block_until_ready(d)
            log(f"mesh compile ({ndev} devices): {time.time()-t0:.1f}s")
            for i in range(N_WARM * N_DISTINCT):
                d = infer(mvars, mbatches[i % N_DISTINCT],
                          mrgbs[i % N_DISTINCT])
            jax.block_until_ready(d)
            t0 = time.time()
            ds_ = []
            for i in range(N_MEAS):
                ds_.append(infer(mvars, mbatches[i % N_DISTINCT],
                                 mrgbs[i % N_DISTINCT]))
                if len(ds_) > 2:
                    ds_.pop(0)
            jax.block_until_ready(ds_)
            dt_m = (time.time() - t0) / N_MEAS
            log(f"e2e sharded serving fan-out ({ndev} devices, global batch "
                f"{gb}): {dt_m*1000:.2f} ms/step = {gb/dt_m:.1f} frames/sec "
                f"({(gb/dt_m)/fps:.2f}x the 1-chip headline)")
        except Exception as e:   # keep the official JSON line alive
            log(f"mesh bench section failed: {e!r}")

    # ---- streaming: real BatchLoader thread feeds the device ---------------
    from mv3d_tpu import native
    try:
        streaming_available = native.available()
    except Exception:
        streaming_available = False
    if streaming_available:
        from mv3d_tpu.data.kitti import Frame
        from mv3d_tpu.data.loader import BatchLoader

        class SynthDataset:
            """In-memory synthetic drive (raw-sized clouds, uint8 images)."""

            def __init__(self, n):
                r = np.random.RandomState(1)
                self.clouds = [np.stack([
                    r.uniform(-10, 90, 110000), r.uniform(-40, 40, 110000),
                    r.uniform(-4.5, 1.2, 110000), r.uniform(0, 1, 110000)],
                    1).astype(np.float32) for _ in range(n)]
                h, w, _ = cfg.rgb_shape
                self.rgb = [(r.rand(h, w, 3) * 255).astype(np.uint8)
                            for _ in range(n)]

            def __len__(self):
                return len(self.clouds)

            def load_frame(self, i):
                return Frame(tag=f"{i:05d}", points=self.clouds[i],
                             rgb=self.rgb[i],
                             gt_boxes3d=np.zeros((0, 8, 3), np.float32),
                             gt_labels=np.zeros(0, np.int32))

        # minimal-transfer serving program: f32 points + uint8 rgb cross the
        # link; every BEV/front channel is computed on-device (fused kernel)
        def full_stream(variables, points, num_points, rgb_u8):
            top, occ = voxelize.lidar_to_top_batch(points, cfg,
                                                   num_points,
                                                   return_occ=True)
            front = voxelize.lidar_to_front_batch(points, cfg, num_points)
            rgb = rgb_u8.astype(jnp.float32)
            dets, _ = model.forward_inference(variables, top, rgb, front,
                                              score_threshold=0.05,
                                              top_occ=occ)
            return dets.boxes3d, dets.probs, dets.mask

        fh = jax.jit(full_stream)
        ds = SynthDataset(N_DISTINCT * BATCH)
        step_bytes = BATCH * (n_pts * 16 + 4 +
                              int(np.prod(cfg.rgb_shape)))

        def stream(n_steps, loader):
            outs = []
            for _ in range(n_steps):
                b = loader.load()
                outs.append(fh(variables,
                               jax.device_put(jnp.asarray(b["points"])),
                               jax.device_put(jnp.asarray(b["num_points"])),
                               jax.device_put(jnp.asarray(
                                   b["rgb"].astype(np.uint8)))))
                if len(outs) > 4:
                    outs.pop(0)
            jax.block_until_ready(outs)

        # loader does crop+pad only — aux channels are on-device here
        lcfg = dataclasses.replace(cfg, pipeline=dataclasses.replace(
            cfg.pipeline, host_aux_channels=False))
        with BatchLoader(ds, lcfg, batch_size=BATCH, prefetch=4, workers=LOADER_WORKERS,
                         seed=3) as loader:
            stream(2, loader)                     # compile + warm
            stream(N_DISTINCT, loader)
            t0 = time.time()
            stream(N_MEAS, loader)
            dt_s = (time.time() - t0) / N_MEAS
        fps_s = BATCH / dt_s
        bw = step_bytes / dt_s / 1e6
        log(f"e2e streaming (BatchLoader thread feeding the device, incl. "
            f"host->device transfer of {step_bytes/1e6:.1f} MB/step): "
            f"{dt_s*1000:.2f} ms/step ({dt_s/BATCH*1000:.2f} ms/frame) = "
            f"{fps_s:.1f} frames/sec  [effective link {bw:.0f} MB/s — on "
            f"this bench host the chip sits behind a network relay; a "
            f"PCIe-attached host moves the same bytes in <1 ms]")

        # loader-only throughput: the host half of the streaming story.
        # Drain the prefetch queue first so the timed loads measure the
        # worker thread's PRODUCTION rate (crop_pad over 110k-pt frames +
        # batch assembly), not queue pops.
        with BatchLoader(ds, lcfg, batch_size=BATCH, prefetch=4, workers=LOADER_WORKERS,
                         seed=3) as loader:
            for _ in range(5):           # warm + drain the prefetch buffer
                loader.load()
            t0 = time.time()
            for _ in range(N_MEAS):
                loader.load()
            dt_l = (time.time() - t0) / N_MEAS
        log(f"loader-only (prefetch thread: crop+pad {BATCH} raw 110k-pt "
            f"frames/batch, no device): {dt_l*1000:.2f} ms/step = "
            f"{BATCH/dt_l:.1f} frames/sec host production rate "
            f"(device rate above: {fps:.1f} fps)")

        # quantized transfer diet (pipeline.stream_quantized): uint16 xyz +
        # uint8 reflectance, dequantized in-graph (ops/quantize.py) — 7/16
        # the point bytes over the same link
        from mv3d_tpu.ops.quantize import dequantize_points

        def full_stream_q(variables, points_q, refl_q, num_points, rgb_u8):
            pts = dequantize_points(points_q, refl_q, cfg)
            return full_stream(variables, pts, num_points, rgb_u8)

        fq = jax.jit(full_stream_q)

        def stream_q(n_steps, loader):
            outs = []
            for _ in range(n_steps):
                b = loader.load()
                outs.append(fq(variables,
                               jax.device_put(jnp.asarray(b["points_q"])),
                               jax.device_put(jnp.asarray(b["refl_q"])),
                               jax.device_put(jnp.asarray(b["num_points"])),
                               jax.device_put(jnp.asarray(
                                   b["rgb"].astype(np.uint8)))))
                if len(outs) > 4:
                    outs.pop(0)
            jax.block_until_ready(outs)

        qcfg = dataclasses.replace(cfg, pipeline=dataclasses.replace(
            cfg.pipeline, host_aux_channels=False, stream_quantized=True))
        qstep_bytes = BATCH * (n_pts * 7 + 4 + int(np.prod(cfg.rgb_shape)))
        with BatchLoader(ds, qcfg, batch_size=BATCH, prefetch=4, workers=LOADER_WORKERS,
                         seed=3) as loader:
            stream_q(2, loader)
            stream_q(N_DISTINCT, loader)
            t0 = time.time()
            stream_q(N_MEAS, loader)
            dt_q = (time.time() - t0) / N_MEAS
        fps_q = BATCH / dt_q
        log(f"e2e streaming QUANTIZED ({qstep_bytes/1e6:.1f} MB/step, "
            f"uint16+uint8 points dequantized in-graph): "
            f"{dt_q*1000:.2f} ms/step ({dt_q/BATCH*1000:.2f} ms/frame) = "
            f"{fps_q:.1f} frames/sec ({fps_q/fps_s:.2f}x the f32 stream "
            f"on this link)")

        try:
            # ---- BEV-only streaming (BASELINE target row "BEV-only RPN
            # proposals + NMS, streaming on TPU"): cfg.USE_TOP_ONLY parity —
            # no camera image crosses the link at all, so a thin serving link
            # carries only the 7-byte quantized points
            tcfg = dataclasses.replace(qcfg, model=dataclasses.replace(
                qcfg.model, use_top_only=True, use_siamese_fusion=False))
            tmodel = MV3DNet(tcfg)
            tvars = jax.jit(tmodel.init_variables)(jax.random.PRNGKey(0))
            zrgb = jax.device_put(jnp.zeros((BATCH, *cfg.rgb_shape),
                                            jnp.float32))
            zfront = jax.device_put(jnp.zeros((BATCH, *cfg.front_shape),
                                              jnp.float32))

            def top_only_stream(variables, points_q, refl_q, num_points):
                pts = dequantize_points(points_q, refl_q, tcfg)
                top, occ = voxelize.lidar_to_top_batch(pts, tcfg, num_points,
                                                       return_occ=True)
                dets, _ = tmodel.forward_inference(variables, top, zrgb, zfront,
                                                   score_threshold=0.05,
                                                   top_occ=occ)
                return dets.boxes3d, dets.probs, dets.mask

            ft = jax.jit(top_only_stream)

            def stream_t(n_steps, loader):
                outs = []
                for _ in range(n_steps):
                    b = loader.load()
                    outs.append(ft(tvars,
                                   jax.device_put(jnp.asarray(b["points_q"])),
                                   jax.device_put(jnp.asarray(b["refl_q"])),
                                   jax.device_put(jnp.asarray(
                                       b["num_points"]))))
                    if len(outs) > 4:
                        outs.pop(0)
                jax.block_until_ready(outs)

            tstep_bytes = BATCH * (n_pts * 7 + 4)
            with BatchLoader(ds, tcfg, batch_size=BATCH, prefetch=4, workers=LOADER_WORKERS,
                             seed=3) as loader:
                stream_t(2, loader)
                stream_t(N_DISTINCT, loader)
                t0 = time.time()
                stream_t(N_MEAS, loader)
                dt_to = (time.time() - t0) / N_MEAS
            fps_to = BATCH / dt_to
            log(f"e2e streaming TOP-ONLY quantized (use_top_only=True, "
                f"{tstep_bytes/1e6:.1f} MB/step — points only, no rgb): "
                f"{dt_to*1000:.2f} ms/step ({dt_to/BATCH*1000:.2f} ms/frame) = "
                f"{fps_to:.1f} frames/sec")
        except Exception as e:  # never lose the official JSON line to a supplementary section
            log(f"top-only streaming section failed: {e!r}")

    # ---- supplementary: full train-step throughput (BENCH_TRAIN=1) ---------
    # The reference's only training-speed hook is a wall-clock "sec / 1000
    # iters" log line (mv3d.py:1091-1093, 1 GPU, batch 1, ~6 host<->device
    # crossings per step). Here ONE jitted step voxelizes, runs all three
    # trunks fwd+bwd and applies Adam — flag-gated so the default bench run
    # stays short.
    if os.environ.get("BENCH_TRAIN"):
        from mv3d_tpu.models.nets import SUBNET_NAMES
        from mv3d_tpu.train.trainer import Trainer

        TB = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
        g = cfg.pipeline.max_gt
        from mv3d_tpu.ops import boxes3d as box3d_ops
        gt3d = np.zeros((TB, g, 8, 3), np.float32)
        gt_labels = np.zeros((TB, g), np.int32)
        gt_mask = np.zeros((TB, g), bool)
        for i in range(TB):
            for j in range(8):
                gt3d[i, j] = np.asarray(box3d_ops.box3d_compose(
                    [20.0 + 5 * j, -10.0 + 2.5 * j, -1.5], [1.5, 1.6, 4.0],
                    [0, 0, 0.3 * j], cfg))
                gt_labels[i, j] = 1
                gt_mask[i, j] = True

        class _TrainSet:
            """Device-resident synthetic batch: on this bench host the
            TPU sits behind a ~20 MB/s relay, so re-transferring the 53 MB
            batch every step would swamp the step itself (measured 2.36
            s/step transfer-bound vs the compute below); a real pipeline
            overlaps transfers via the prefetch loader."""

            def __init__(self):
                self.b = {
                    "points": jax.device_put(jnp.asarray(cloud(TB))),
                    "num_points": jax.device_put(
                        jnp.full((TB,), n_pts, jnp.int32)),
                    "rgb": jax.device_put(jnp.asarray(
                        rng.rand(TB, *cfg.rgb_shape).astype(np.float32))),
                    "gt_boxes3d": jax.device_put(jnp.asarray(gt3d)),
                    "gt_labels": jax.device_put(jnp.asarray(gt_labels)),
                    "gt_mask": jax.device_put(jnp.asarray(gt_mask)),
                }

            def load(self):
                return self.b

            def get_shape(self):
                return cfg.top_shape, cfg.front_shape, cfg.rgb_shape

        import tempfile
        tdir = tempfile.mkdtemp(prefix="benchtrain_")
        tr = Trainer(_TrainSet(), train_targets=list(SUBNET_NAMES), cfg=cfg,
                     log_tag="bench", checkpoint_dir=tdir + "/c",
                     log_dir=tdir + "/l")
        ds = _TrainSet()
        t0 = time.time()
        tr.fit_iteration(ds.load())
        log(f"train compile+first: {time.time()-t0:.1f}s")
        for _ in range(3):
            tr.fit_iteration(ds.load())
        t0 = time.time()
        n_tsteps = 10
        for _ in range(n_tsteps):
            losses = tr.fit_iteration(ds.load())
        dt_t = (time.time() - t0) / n_tsteps
        log(f"train step (batch {TB}, in-graph voxelize + 3 trunks fwd+bwd "
            f"+ Adam): {dt_t*1000:.1f} ms/step = {TB/dt_t:.1f} frames/sec "
            f"({dt_t*1000:.1f} sec/1000 iters; the reference trains batch-1 "
            f"steps with ~6 host crossings each) losses={losses}")

    # ---- supplementary: AOT serving artifact (BENCH_EXPORT=1) --------------
    # Freezes the pure-device program via jax.export (mv3d_tpu/serving) and
    # measures the deserialized artifact — the deployment path must not cost
    # anything over the in-process jit path.
    if os.environ.get("BENCH_EXPORT"):
        try:
            import tempfile

            from mv3d_tpu.serving import export_serving, load_serving
            edir = tempfile.mkdtemp(prefix="benchexport_")
            t0 = time.time()
            export_serving(variables, cfg, edir, batch_size=BATCH,
                           score_threshold=0.05)
            served = load_serving(edir)
            log(f"export+reload: {time.time()-t0:.1f}s "
                f"({sum(os.path.getsize(os.path.join(edir, f)) for f in os.listdir(edir))/1e6:.1f} MB artifact)")
            nums = [jax.device_put(jnp.full((BATCH,), n_pts, jnp.int32))]
            outs = []
            for i in range(N_WARM * N_DISTINCT):
                outs.append(served._call(served._variables,
                                         batches[i % N_DISTINCT], nums[0],
                                         rgbs[i % N_DISTINCT]))
                if len(outs) > 4:
                    outs.pop(0)
            jax.block_until_ready(outs)
            t0 = time.time()
            outs = []
            for i in range(N_MEAS):
                outs.append(served._call(served._variables,
                                         batches[i % N_DISTINCT], nums[0],
                                         rgbs[i % N_DISTINCT]))
                if len(outs) > 4:
                    outs.pop(0)
            jax.block_until_ready(outs)
            dt_e = (time.time() - t0) / N_MEAS
            log(f"e2e AOT artifact (deserialized jax.export program): "
                f"{dt_e*1000:.2f} ms/step ({dt_e/BATCH*1000:.2f} ms/frame) = "
                f"{BATCH/dt_e:.1f} frames/sec ({fps/ (BATCH/dt_e):.2f}x = "
                f"in-process jit / artifact ratio)")
        except Exception as e:   # keep the official JSON line alive
            log(f"export bench section failed: {e!r}")

    # ---- supplementary: voxelizer throughput + CPU-oracle comparison -------
    vox = jax.jit(lambda p: voxelize.lidar_to_top_batch(p, cfg))
    jax.block_until_ready(vox(batches[0]))
    t0 = time.time()
    vs = []
    for i in range(N_MEAS):
        vs.append(vox(batches[i % N_DISTINCT]))
        if len(vs) > 2:      # cap live (B, 800, 600, 27) buffers (OOM at b16)
            vs.pop(0)
    jax.block_until_ready(vs)
    vox_dt = (time.time() - t0) / N_MEAS / BATCH
    one = np.asarray(batches[0][0])
    t0 = time.time()
    voxelize_ref.lidar_to_top_np(one, cfg)
    cpu_dt = time.time() - t0
    log(f"voxelize: TPU {vox_dt*1000:.3f} ms/frame "
        f"({n_pts/vox_dt/1e6:.0f} Mpts/s), numpy oracle {cpu_dt*1000:.0f} ms "
        f"-> {cpu_dt/vox_dt:.0f}x (the reference's pure-python loop is "
        f"orders slower still)")


def _emit_and_die(signum, frame):
    RESULT["error"] = (f"signal {signum} (deadline/term) — emitting "
                       f"partial results")
    if RESULT["value"] <= 0:
        RESULT["degraded"] = True
    emit()
    os._exit(0)


if __name__ == "__main__":
    if os.environ.get("BENCH_CPU_PROXY_ONLY"):
        _cpu_proxy_main()
        sys.exit(0)

    signal.signal(signal.SIGALRM, _emit_and_die)
    signal.signal(signal.SIGTERM, _emit_and_die)
    signal.alarm(int(os.environ.get("BENCH_DEADLINE", "5100")))

    on_tpu = probe_tpu()
    import jax
    if not on_tpu:
        RESULT.update(backend="cpu", degraded=True)
        log("TPU backend unavailable after retries — degraded CPU fallback")
        # env vars are NOT enough: the axon plugin registers itself at
        # interpreter start and overrides JAX_PLATFORMS; only an in-process
        # config update before first backend use pins CPU.
        jax.config.update("jax_platforms", "cpu")
    else:
        RESULT["backend"] = "tpu"

    try:
        main(on_tpu)
        if not os.environ.get("BENCH_NO_PROXY"):
            # tiny-config CPU proxy rides along on EVERY run (chip up or
            # not) so consecutive rounds stay comparable even across relay
            # outages — see CPU_PROXY_PIN
            measure_cpu_proxy()
    except BaseException as e:  # noqa: BLE001 — the record must survive
        if isinstance(e, KeyboardInterrupt):
            RESULT["error"] = "interrupted"
        else:
            log(traceback.format_exc())
            RESULT["error"] = repr(e)[:300]
        if RESULT["value"] <= 0:
            RESULT["degraded"] = True
            if on_tpu and not os.environ.get("BENCH_FORCE_CPU"):
                # TPU path died before the headline landed: one bounded
                # CPU retry in a subprocess, passing its record through.
                remaining = max(signal.alarm(0) - 60, 120)
                log(f"TPU run failed pre-headline; CPU fallback "
                    f"({remaining}s budget)")
                try:
                    r = subprocess.run(
                        [sys.executable, os.path.abspath(__file__)],
                        env={**os.environ, "BENCH_FORCE_CPU": "1",
                             "BENCH_DEADLINE": str(remaining)},
                        stdout=subprocess.PIPE, stderr=sys.stderr,
                        timeout=remaining + 30)
                    line = (r.stdout or b"").decode().strip().splitlines()
                    if r.returncode == 0 and line:
                        rec = json.loads(line[-1])
                        rec["tpu_error"] = RESULT["error"]
                        print(json.dumps(rec), flush=True)
                        sys.exit(0)
                except Exception as e2:
                    log(f"CPU fallback also failed: {e2!r}")
    emit()
    sys.exit(0)
