"""Orbax checkpoint save/restore round-trip incl. metadata sidecar."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.train import checkpoints as C


def _params(seed=0):
    rng = np.random.RandomState(seed)
    return {"layer": {"kernel": jnp.asarray(rng.randn(3, 3, 4, 8),
                                            jnp.float32),
                      "bias": jnp.asarray(rng.randn(8), jnp.float32)}}


def test_save_restore_round_trip(tmp_path):
    params = _params()
    meta = {"epoch": 3, "loader": "{\"epoch\": 3, \"batch\": 1}"}
    path = C.save_train_state(str(tmp_path), 42, params, metadata=meta)
    assert path.endswith("step_42")
    assert C.latest_step(str(tmp_path)) == 42

    restored = C.restore_train_state(str(tmp_path))
    assert int(restored["step"]) == 42
    assert restored["metadata"] == meta
    np.testing.assert_array_equal(restored["params"]["layer"]["kernel"],
                                  np.asarray(params["layer"]["kernel"]))


def test_restore_latest_of_several(tmp_path):
    C.save_train_state(str(tmp_path), 1, _params(1))
    C.save_train_state(str(tmp_path), 7, _params(7))
    restored = C.restore_train_state(str(tmp_path))
    assert int(restored["step"]) == 7


def test_load_params_dispatch(tmp_path):
    with pytest.raises(FileNotFoundError, match="checkpoint not found"):
        C.load_params(str(tmp_path / "missing.pth.tar"))
    with pytest.raises(ValueError, match="unrecognized checkpoint"):
        C.load_params(str(tmp_path / "weights.bin"))
    # orbax dir path
    C.save_train_state(str(tmp_path), 3, _params(3))
    params = C.load_params(str(tmp_path))
    assert "layer" in params


def test_opt_state_round_trip(tmp_path):
    import optax
    params = _params(2)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    opt_state = tx.init(params)
    C.save_train_state(str(tmp_path), 5, params, opt_state)
    like = {"params": params, "opt_state": opt_state,
            "step": np.asarray(0)}
    restored = C.restore_train_state(str(tmp_path), like=like)
    # the structured restore must give back real optax state containers
    # usable by tx.update (the --resume path)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, restored["opt_state"], restored["params"])
    assert jax.tree.leaves(updates)
