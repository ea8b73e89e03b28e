"""Distribution tests on the forced 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vdetlib_tpu.dist.sharding import make_mesh, psum_metrics, replicate, shard_batch, shard_videos


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)


def test_shard_batch_and_replicate():
    mesh = make_mesh(8)
    batch = {"x": np.arange(16.0).reshape(16, 1), "y": np.ones((16,))}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == P("data")
    params = replicate(mesh, {"w": np.ones((3, 3))})
    assert params["w"].sharding.spec == P()


def test_data_parallel_train_step_on_mesh():
    """The detector train step under an 8-way data-parallel mesh."""
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.train import init_train_state, make_optimizer, train_step

    mesh = make_mesh(8)
    H = W = 32
    R, C, B = 4, 3, 16
    cfg = detector_preset("tiny", num_classes=C)
    model, params = init_detector(cfg, (H, W), max_rois=R, seed=0)
    tx = make_optimizer(1e-3)
    with mesh:
        params = replicate(mesh, params)
        state = init_train_state(model, params, tx)
        rng = np.random.default_rng(0)
        batch = {
            "images_u8": rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8),
            "rois": np.tile(np.array([[2.0, 2.0, 20.0, 20.0]], np.float32), (B, R, 1)),
            "labels": rng.integers(0, C, (B, R)).astype(np.int32),
            "bbox_targets": np.zeros((B, R, 4), np.float32),
        }
        batch = shard_batch(mesh, batch)
        new_state, aux = train_step(model, state, tx, batch)
        assert np.isfinite(float(aux["loss"]))
        # grads were all-reduced: params stay replicated
        leaf = jax.tree.leaves(new_state.params)[0]
        assert leaf.sharding.spec == P()


def test_psum_metrics_shard_map():
    mesh = make_mesh(8)
    from jax import shard_map

    def per_shard(x):
        local = {"frames": jnp.sum(x), "videos": jnp.asarray(1.0)}
        return psum_metrics(local)

    x = jnp.arange(8.0)
    out = shard_map(
        per_shard, mesh=mesh, in_specs=P("data"), out_specs=P()
    )(x)
    assert float(out["frames"]) == 28.0
    assert float(out["videos"]) == 8.0


def test_shard_videos_partition():
    vids = [f"v{i}" for i in range(10)]
    shards = [shard_videos(vids, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == sorted(vids)
    assert all(len(s) >= 3 for s in shards)
