"""Checkpoint IO tests (≙ reference io.py behaviors, SURVEY.md §5 checkpoint/resume)."""

import numpy as np
import pytest

from tts_tpu.train.checkpoint import (
    latest_checkpoint, load_checkpoint, partial_restore, save_best_model,
    save_checkpoint,
)


def _params():
    return {
        "encoder": {"kernel": np.ones((4, 4), np.float32),
                    "bias": np.zeros(4, np.float32)},
        "decoder": {"kernel": np.full((2, 3), 2.0, np.float32)},
    }


def test_save_load_roundtrip(tmp_path):
    p = save_checkpoint(str(tmp_path), params=_params(), step=100, epoch=2, r=5,
                        config={"model": "tacotron2"})
    ckpt = load_checkpoint(p)
    assert ckpt["meta"]["step"] == 100
    assert ckpt["meta"]["r"] == 5
    np.testing.assert_array_equal(ckpt["params"]["encoder"]["kernel"],
                                  np.ones((4, 4)))
    assert (tmp_path / "config.json").exists()


def test_latest_checkpoint(tmp_path):
    save_checkpoint(str(tmp_path), params=_params(), step=10)
    save_checkpoint(str(tmp_path), params=_params(), step=200)
    save_checkpoint(str(tmp_path), params=_params(), step=30)
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_200.ckpt")


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None


def test_save_best_model(tmp_path):
    best = save_best_model(1.0, float("inf"), str(tmp_path), params=_params(),
                           step=1)
    assert best == 1.0
    assert (tmp_path / "best_model.ckpt").exists()
    best2 = save_best_model(2.0, best, str(tmp_path), params=_params(), step=2)
    assert best2 == 1.0  # no improvement -> unchanged


def test_partial_restore_shape_filter(tmp_path):
    init = _params()
    restored = {
        "encoder": {"kernel": np.full((4, 4), 7.0, np.float32),
                    "bias": np.zeros(8, np.float32)},   # shape mismatch
        "decoder": {"kernel": np.full((2, 3), 9.0, np.float32)},
        "extra": {"kernel": np.ones(2)},                 # not in init
    }
    merged = partial_restore(init, restored)
    np.testing.assert_array_equal(merged["encoder"]["kernel"], 7.0 * np.ones((4, 4)))
    np.testing.assert_array_equal(merged["encoder"]["bias"], np.zeros(4))  # kept init
    assert "extra" not in merged


def test_partial_restore_reinit_layers():
    init = _params()
    restored = {
        "encoder": {"kernel": np.full((4, 4), 7.0, np.float32),
                    "bias": np.ones(4, np.float32)},
        "decoder": {"kernel": np.full((2, 3), 9.0, np.float32)},
    }
    merged = partial_restore(init, restored, reinit_layers=["decoder"])
    np.testing.assert_array_equal(merged["decoder"]["kernel"],
                                  init["decoder"]["kernel"])
    np.testing.assert_array_equal(merged["encoder"]["bias"], np.ones(4))


def test_optimizer_state_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax
    from tts_tpu.train.optim import make_optimizer

    tx = make_optimizer(lr=1e-3)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    p = save_checkpoint(str(tmp_path), params=params, opt_state=opt_state, step=1)
    ckpt = load_checkpoint(p)
    assert ckpt["opt_state"] is not None


def test_mesh_checkpoint_roundtrip_across_device_counts(tmp_path):
    """Save a state replicated over an 8-device mesh, restore it placed on a
    1-device and a (4, 2) mesh — values must be identical (host/device-count
    -agnostic restore, SURVEY.md §5 checkpoint bullet)."""
    import jax
    import jax.numpy as jnp

    from tts_tpu.parallel import make_mesh, replicate
    from tts_tpu.train.checkpoint import (restore_for_mesh,
                                          save_checkpoint_multihost)

    params = {"enc": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                      "bias": np.ones(4, np.float32)}}
    mesh8 = make_mesh((("data", -1),))
    placed = replicate({"params": params}, mesh8)
    path = save_checkpoint_multihost(str(tmp_path),
                                     params=placed["params"], step=3, r=2)
    assert path is not None

    mesh1 = make_mesh((("data", 1),), devices=jax.devices()[:1])
    ckpt1 = restore_for_mesh(path, mesh1)
    assert ckpt1["meta"]["step"] == 3 and ckpt1["meta"]["r"] == 2
    np.testing.assert_array_equal(
        np.asarray(ckpt1["params"]["enc"]["kernel"]), params["enc"]["kernel"])
    assert ckpt1["params"]["enc"]["kernel"].sharding.mesh.shape["data"] == 1

    mesh42 = make_mesh((("data", 4), ("model", 2)))
    ckpt42 = restore_for_mesh(path, mesh42)
    np.testing.assert_array_equal(
        np.asarray(ckpt42["params"]["enc"]["bias"]), params["enc"]["bias"])

    # no mesh: plain numpy trees
    ckpt = restore_for_mesh(path)
    np.testing.assert_array_equal(ckpt["params"]["enc"]["kernel"],
                                  params["enc"]["kernel"])
