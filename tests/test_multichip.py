"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the full
data-parallel train step (dryrun_multichip) and sharded inference."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_mesh_shapes():
    from mv3d_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(8, model_axis=2)
    assert mesh2.devices.shape == (4, 2)


@pytest.mark.slow   # >50s: quick tier targets <5 min on one core
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow   # >50s: quick tier targets <5 min on one core
def test_dryrun_multichip_2():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)


def test_sharded_inference():
    import __graft_entry__ as ge
    from mv3d_tpu.models.mv3d_net import MV3DNet
    from mv3d_tpu.parallel.mesh import (make_mesh, make_sharded_infer_step,
                                        replicate, shard_batch)

    cfg = ge._tiny_config()
    model = MV3DNet(cfg)
    mesh = make_mesh(4)
    variables = replicate(model.init_variables(jax.random.PRNGKey(0)), mesh)

    rng = np.random.RandomState(0)
    b, n = 4, cfg.pipeline.max_points
    pts = np.stack([rng.uniform(0, 16, (b, n)), rng.uniform(-6, 6, (b, n)),
                    rng.uniform(-4, 0.8, (b, n)), rng.uniform(0, 1, (b, n))],
                   axis=-1).astype(np.float32)
    rgb = rng.rand(b, *cfg.rgb_shape).astype(np.float32)
    batch = shard_batch({"points": pts, "rgb": rgb}, mesh)

    infer = make_sharded_infer_step(model, mesh)
    dets = infer(variables, batch["points"], batch["rgb"])
    assert np.asarray(dets.boxes3d).shape[0] == b
    assert np.isfinite(np.asarray(dets.boxes3d)).all()
