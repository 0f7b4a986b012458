"""Trainer/Predictor API tests on the tiny config: optimization actually
reduces loss, staged training freezes non-target subnets, checkpoints
round-trip, and predict() returns host detections."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tpu.models.nets import SUBNET_NAMES, TOP_VIEW_RPN
from mv3d_tpu.train.trainer import MV3D, Trainer

from test_model import CFG, make_batch


class FixedDataset:
    """Always returns the same synthetic frame."""

    def __init__(self, batch):
        self.batch = batch

    def load(self):
        return self.batch

    def get_shape(self):
        return CFG.top_shape, CFG.front_shape, CFG.rgb_shape


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.RandomState(0)
    return FixedDataset(make_batch(rng))


@pytest.mark.slow   # >50s: quick tier targets <5 min on one core
def test_rpn_training_reduces_loss(tmp_path, dataset):
    tr = Trainer(dataset, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                 log_tag="t1", checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "log"), lr=1e-3)
    first = tr.fit_iteration(dataset.load())
    for _ in range(14):
        last = tr.fit_iteration(dataset.load())
    total0 = first["top_cls_loss"] + first["top_reg_loss"]
    total1 = last["top_cls_loss"] + last["top_reg_loss"]
    assert np.isfinite(total1)
    assert total1 < total0, (total0, total1)


def test_staged_training_freezes_other_subnets(tmp_path, dataset):
    tr = Trainer(dataset, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                 log_tag="t2", checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "log"), lr=1e-2)
    before = jax.tree.map(np.asarray, tr.variables["fusion"]["params"])
    rpn_before = jax.tree.map(np.asarray, tr.variables[TOP_VIEW_RPN]["params"])
    for _ in range(3):
        tr.fit_iteration(dataset.load())
    after = tr.variables["fusion"]["params"]
    rpn_after = tr.variables[TOP_VIEW_RPN]["params"]

    diffs_frozen = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, after)
    assert max(jax.tree_util.tree_leaves(diffs_frozen)) == 0.0
    diffs_rpn = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        rpn_before, rpn_after)
    assert max(jax.tree_util.tree_leaves(diffs_rpn)) > 0.0


def test_checkpoint_roundtrip(tmp_path, dataset):
    tr = Trainer(dataset, train_targets=list(SUBNET_NAMES), cfg=CFG,
                 log_tag="t3", checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "log"))
    tr.fit_iteration(dataset.load())
    tr.save_weights(step=5)

    m2 = MV3D(cfg=CFG, log_tag="t3", checkpoint_dir=str(tmp_path / "ckpt"),
              log_dir=str(tmp_path / "log"), seed=99)
    # fresh init differs
    a = np.asarray(jax.tree_util.tree_leaves(
        tr.variables[TOP_VIEW_RPN]["params"])[0])
    b0 = np.asarray(jax.tree_util.tree_leaves(
        m2.variables[TOP_VIEW_RPN]["params"])[0])
    assert not np.array_equal(a, b0)
    m2.load_weights()
    for name in SUBNET_NAMES:
        la = jax.tree_util.tree_leaves(tr.variables[name]["params"])
        lb = jax.tree_util.tree_leaves(m2.variables[name]["params"])
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_predict_api(tmp_path, dataset):
    m = MV3D(cfg=CFG, log_tag="t4", checkpoint_dir=str(tmp_path / "ckpt"),
             log_dir=str(tmp_path / "log"))
    b = dataset.load()
    boxes3d, labels, probs = m.predict(
        np.asarray(b["top"][0]), np.asarray(b["front"][0]),
        np.asarray(b["rgb"][0]), score_threshold=0.0)
    assert boxes3d.ndim == 3 and boxes3d.shape[1:] == (8, 3)
    assert len(probs) == len(boxes3d)


def test_trainer_loop_runs(tmp_path, dataset):
    tr = Trainer(dataset, validation_set=dataset,
                 train_targets=[TOP_VIEW_RPN], cfg=CFG, log_tag="t5",
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "log"))
    last = tr(max_iter=3)
    assert "top_cls_loss" in last
    assert tr.n_global_step == 3
    # final weights + progress were written
    assert tr.checkpointers[TOP_VIEW_RPN].latest_step() is not None


def test_validation_rows_report_online_iou(tmp_path, dataset):
    """Validation steps compute the online 3D-IoU of predictions vs gt and
    write it to the log + metrics JSONL (parity: mv3d.py:945-954)."""
    import dataclasses
    import json
    cfg = dataclasses.replace(CFG, train=dataclasses.replace(
        CFG.train, validation_every=2))
    tr = Trainer(dataset, validation_set=dataset,
                 train_targets=[TOP_VIEW_RPN], cfg=cfg, log_tag="tiou",
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "log"))
    tr(max_iter=3)
    with open(tr.metrics.path) as f:
        recs = [json.loads(l) for l in f]
    val = [r for r in recs if r["phase"] == "validation"]
    assert val, "no validation rows written"
    for r in val:
        assert "iou" in r and 0.0 <= r["iou"] <= 1.0
    train_rows = [r for r in recs if r["phase"] == "training"]
    assert all("iou" not in r for r in train_rows)


def test_trainer_consumes_loader_batches(tmp_path):
    """Integration: Trainer trains from real BatchLoader batches (points +
    host aux channels + tags present)."""
    from mv3d_tpu.data.kitti import Frame
    from mv3d_tpu.data.loader import BatchLoader
    from mv3d_tpu.ops import boxes3d as box3d_ops

    rng = np.random.RandomState(0)

    class SynthDataset:
        def __len__(self):
            return 4

        def load_frame(self, i):
            pts = np.stack([rng.uniform(0, 16, 3000),
                            rng.uniform(-6, 6, 3000),
                            rng.uniform(-4, 0.8, 3000),
                            rng.uniform(0, 1, 3000)], 1).astype(np.float32)
            gt = np.asarray(box3d_ops.box3d_compose(
                [8.0, 0.0, -1.5], [1.5, 1.6, 4.0], [0, 0, 0.2], CFG))[None]
            return Frame(tag=f"f{i}", points=pts,
                         rgb=np.zeros((64, 96, 3), np.uint8),
                         gt_boxes3d=gt.astype(np.float32),
                         gt_labels=np.ones(1, np.int32))

    with BatchLoader(SynthDataset(), CFG, batch_size=1) as bl:
        batch = bl.load()
        assert "top_aux" in batch and "tags" in batch
        tr = Trainer(bl, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                     log_tag="ld", checkpoint_dir=str(tmp_path / "c"),
                     log_dir=str(tmp_path / "l"))
        losses = tr.fit_iteration(batch)
        assert np.isfinite(losses["top_cls_loss"])
        # loop path too
        tr(max_iter=2)


def test_tester_rpn(tmp_path, dataset):
    from mv3d_tpu.train.trainer import TesterRPN
    t = TesterRPN(cfg=CFG, log_tag="trpn",
                  checkpoint_dir=str(tmp_path / "c"),
                  log_dir=str(tmp_path / "l"), load=False)
    b = dataset.load()
    rois, scores, heatmap = t(np.asarray(b["top"][0]))
    assert rois.ndim == 2 and rois.shape[1] == 5
    assert heatmap.shape[0] == CFG.top_feature_shape()[0]


def test_tester_3dop(tmp_path, dataset):
    from mv3d_tpu.ops import boxes3d as box3d_ops
    from mv3d_tpu.train.trainer import Tester3DOP
    t = Tester3DOP(cfg=CFG, log_tag="t3dop",
                   checkpoint_dir=str(tmp_path / "c"),
                   log_dir=str(tmp_path / "l"), load=False)
    b = dataset.load()
    rois3d = np.stack([np.asarray(box3d_ops.box3d_compose(
        [6.0 + 2 * i, 0.0, -1.5], [1.5, 1.6, 4.0], [0, 0, 0.1], CFG))
        for i in range(4)])
    probs, boxes3d = t(np.asarray(b["top"][0]), np.asarray(b["front"][0]),
                       np.asarray(b["rgb"][0]), rois3d, score_threshold=0.0)
    assert boxes3d.shape[1:] == (8, 3)
    assert len(probs) == len(boxes3d)


def test_metrics_and_debug_images(tmp_path, dataset):
    import json
    from mv3d_tpu.utils.metrics import MetricsWriter, dump_debug_images
    mw = MetricsWriter(str(tmp_path), tag="x")
    mw.write(0, {"a": 1.0})
    mw.write(1, {"a": 3.0}, phase="train")
    assert mw.means()["a"] == 2.0
    mw.close()
    with open(mw.path) as f:
        recs = [json.loads(l) for l in f]
    assert recs[1]["phase"] == "train"

    from mv3d_tpu.ops import boxes3d as box3d_ops
    top = np.random.RandomState(0).rand(*CFG.top_shape).astype(np.float32)
    gt = np.asarray(box3d_ops.box3d_compose(
        [8.0, 0.0, -1.5], [1.5, 1.6, 4.0], [0, 0, 0.2], CFG))[None]
    d = dump_debug_images(str(tmp_path / "imgs"), 7, top,
                          rgb=np.zeros((64, 96, 3), np.uint8),
                          gt_boxes3d=gt, cfg=CFG)
    assert os.path.exists(os.path.join(d, "top.png"))
    assert os.path.exists(os.path.join(d, "camera.png"))


def test_orbax_checkpointer_sharded_roundtrip(tmp_path):
    """The orbax backend saves and restores SHARDED jax.Arrays with their
    shardings intact on the virtual 8-device CPU mesh — the multi-host
    checkpoint capability the npz backend lacks (SURVEY.md §5)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mv3d_tpu.train.checkpoint import SubnetCheckpointer

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh_batch = NamedSharding(mesh, P("data"))
    sh_repl = NamedSharding(mesh, P())
    tree = {
        "params": {
            "w": jax.device_put(np.arange(64, dtype=np.float32).reshape(8, 8),
                                sh_batch),
            "b": jax.device_put(np.ones(8, np.float32), sh_repl),
        }
    }

    ck = SubnetCheckpointer("top_view_rpn", str(tmp_path / "ck"),
                            backend="orbax")
    ck.save(tree, step=3)
    assert ck.latest_step() == 3

    # restore with target shardings: arrays come back distributed
    back = ck.load(restore_target=tree)
    assert back["params"]["w"].sharding.is_equivalent_to(sh_batch, 2)
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(back["params"]["b"]),
                                  np.asarray(tree["params"]["b"]))

    # restore without a target: host arrays, values intact
    back2 = ck.load()
    np.testing.assert_array_equal(np.asarray(back2["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))

    # missing checkpoint -> None (reference fallback parity)
    assert SubnetCheckpointer("fusion", str(tmp_path / "ck"),
                              backend="orbax").load() is None


def test_debug_mode_dump_and_nan_guard(tmp_path, dataset):
    """debug_mode turns on jax_debug_nans (the file-based equivalent of the
    reference's tf_debug session wrapper, mv3d.py:1349-1353) and debug_dump
    writes per-weight statistics."""
    try:
        m = MV3D(cfg=CFG, log_tag="dbg", checkpoint_dir=str(tmp_path / "c"),
                 log_dir=str(tmp_path / "l"), debug_mode=True)
        assert jax.config.jax_debug_nans
        path = m.debug_dump()
        text = open(path).read()
        assert "min=" in text and "nan=0" in text
        # a NaN-producing program now raises instead of propagating silently
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(
                jax.jit(lambda x: x / x)(jnp.zeros(4)))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_remat_training_matches_baseline(tmp_path, dataset):
    """TrainConfig.remat (jax.checkpoint over the three trunks) changes HBM
    residency, not math: two steps produce the same losses and the same
    updated parameters as the non-remat step."""
    import dataclasses

    def run(remat):
        cfg = dataclasses.replace(CFG, train=dataclasses.replace(
            CFG.train, remat=remat))
        tr = Trainer(dataset, train_targets=list(SUBNET_NAMES), cfg=cfg,
                     log_tag=f"remat{int(remat)}",
                     checkpoint_dir=str(tmp_path / f"c{int(remat)}"),
                     log_dir=str(tmp_path / f"l{int(remat)}"), seed=3)
        losses = tr.fit_iteration(dataset.load())
        return losses, jax.tree.map(np.asarray,
                                    tr.variables[TOP_VIEW_RPN]["params"])

    # one step only: the forward (hence the loss) is the same program, and
    # the post-step params differ only by backward-pass fusion reordering.
    # Comparing SECOND-step losses would be meaningless — target subsampling
    # and proposal top-k make the step function discontinuous in params, so
    # ulp-level gradient differences amplify to percent-level loss changes.
    (l0, p0), (l1, p1) = run(False), run(True)
    for k in l0:
        np.testing.assert_allclose(l0[k], l1[k], rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5),
        p0, p1)


def test_grad_clip_norm_plumbing(tmp_path, dataset):
    """grad_clip_norm builds a clip->adam chain over the trained subnets:
    updates for gradients of global norm G >> clip equal the updates for the
    same gradients pre-scaled to the clip norm (and training still steps)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, train=dataclasses.replace(
        CFG.train, grad_clip_norm=1.0))
    tr = Trainer(dataset, train_targets=[TOP_VIEW_RPN], cfg=cfg,
                 log_tag="clip", checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "log"))
    losses = tr.fit_iteration(dataset.load())
    assert all(np.isfinite(v) for v in losses.values())

    # direct property check on the built optimizer
    params = {n: tr.variables[n]["params"] for n in SUBNET_NAMES}
    big = jax.tree.map(lambda a: jnp.full_like(a, 100.0), params)
    gnorm = float(optax_global_norm(big, [TOP_VIEW_RPN]))
    scaled = jax.tree.map(lambda a: a * (1.0 / gnorm), big)
    # zero the frozen subnets exactly as multi_transform's freeze branch does
    for t in (big, scaled):
        for n in SUBNET_NAMES:
            if n != TOP_VIEW_RPN:
                t[n] = jax.tree.map(jnp.zeros_like, t[n])
    s1 = tr.optimizer.init(params)
    u_big, _ = tr.optimizer.update(big, s1, params)
    s2 = tr.optimizer.init(params)
    u_scaled, _ = tr.optimizer.update(scaled, s2, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
        u_big[TOP_VIEW_RPN], u_scaled[TOP_VIEW_RPN])


def optax_global_norm(tree, subnets):
    leaves = []
    for n in subnets:
        leaves += jax.tree_util.tree_leaves(tree[n])
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def test_continue_train_resumes_step_and_weights(tmp_path, dataset):
    """Simulated preemption: a fresh Trainer with continue_train=True picks
    up the saved global step AND the saved weights, and keeps training
    (parity: reference continue_train + load_progress, mv3d.py:879-883,
    963-977)."""
    tr = Trainer(dataset, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                 log_tag="resume", checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "log"), lr=1e-2)
    tr(3)   # trains 3 iters, saves weights + progress at the end
    trained = jax.tree.map(np.asarray, tr.variables[TOP_VIEW_RPN]["params"])
    assert tr.n_global_step == 3

    tr2 = Trainer(dataset, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                  log_tag="resume", checkpoint_dir=str(tmp_path / "ckpt"),
                  log_dir=str(tmp_path / "log"), lr=1e-2,
                  continue_train=True)
    assert tr2.n_global_step == 3
    restored = jax.tree.map(np.asarray, tr2.variables[TOP_VIEW_RPN]["params"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, trained, restored)

    last = tr2(2)
    assert tr2.n_global_step == 5
    assert all(np.isfinite(v) for v in last.values())


def test_nan_crash_save_and_restore(tmp_path, dataset):
    """A NaN loss mid-run writes a forensic <subnet>-crash.npz before
    raising, does NOT repoint progress, and continue_train resumes from the
    last GOOD cadence checkpoint (the reference saves nothing on a NaN,
    mv3d.py:1050-1115)."""
    from mv3d_tpu.train.checkpoint import load_progress

    tr = Trainer(dataset, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                 log_tag="nan", checkpoint_dir=str(tmp_path / "c"),
                 log_dir=str(tmp_path / "l"))
    tr(3)       # clean warmup: good weights + progress saved at step 3
    good = jax.tree.map(np.asarray, tr.variables[TOP_VIEW_RPN])

    real_fit = tr.fit_iteration

    def poisoned(batch, is_validation=False):
        out = dict(real_fit(batch, is_validation=is_validation))
        out["top_cls_loss"] = float("nan")
        return out

    tr.fit_iteration = poisoned
    with pytest.raises(FloatingPointError, match="crash checkpoint"):
        tr(max_iter=10)

    # forensic file exists, but it is invisible to latest_step()/progress
    crash = (tmp_path / "c" / "nan" / TOP_VIEW_RPN /
             f"{TOP_VIEW_RPN}-crash.npz")
    assert crash.exists()
    assert load_progress(str(tmp_path / "l"), "nan") == 3
    assert tr.checkpointers[TOP_VIEW_RPN].latest_step() == 3

    tr2 = Trainer(dataset, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                  log_tag="nan", checkpoint_dir=str(tmp_path / "c"),
                  log_dir=str(tmp_path / "l"), continue_train=True)
    assert tr2.n_global_step == 3
    got = jax.tree.map(np.asarray, tr2.variables[TOP_VIEW_RPN])
    jax.tree.map(np.testing.assert_array_equal, got, good)


def test_nan_gradients_resume_finite(tmp_path, dataset):
    """The REAL NaN failure mode: a poisoned batch NaNs the loss, the
    gradients, and (through apply_updates) the trained weights themselves.
    Resume must come back with finite weights — the last good cadence save —
    not the poisoned state (ADVICE r4 medium: the old crash-save stored
    post-update weights and repointed progress at them)."""

    class PoisonableDataset:
        def __init__(self, batch):
            self.batch = batch
            self.poison = False

        def load(self):
            b = dict(self.batch)
            if self.poison:
                b["top"] = np.full_like(np.asarray(b["top"]), np.nan)
            return b

        def get_shape(self):
            return CFG.top_shape, CFG.front_shape, CFG.rgb_shape

    ds = PoisonableDataset(dataset.load())
    tr = Trainer(ds, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                 log_tag="nangrad", checkpoint_dir=str(tmp_path / "c"),
                 log_dir=str(tmp_path / "l"))
    tr(2)       # good weights + progress at step 2
    good = jax.tree.map(np.asarray, tr.variables[TOP_VIEW_RPN])

    ds.poison = True
    with pytest.raises(FloatingPointError, match="crash checkpoint"):
        tr(max_iter=10)

    # the live trainer weights really are poisoned — the scenario is real
    live = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(
        jax.tree.map(np.asarray, tr.variables[TOP_VIEW_RPN]["params"]))])
    assert not np.all(np.isfinite(live))

    tr2 = Trainer(ds, train_targets=[TOP_VIEW_RPN], cfg=CFG,
                  log_tag="nangrad", checkpoint_dir=str(tmp_path / "c"),
                  log_dir=str(tmp_path / "l"), continue_train=True)
    assert tr2.n_global_step == 2
    restored = jax.tree.map(np.asarray, tr2.variables[TOP_VIEW_RPN])
    jax.tree.map(np.testing.assert_array_equal, restored, good)
    flat = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(
        restored["params"])])
    assert np.all(np.isfinite(flat))
