"""Factory functions + loader device_put path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu import pwc_dc_net, pwc_dc_net_old, PWCDCNet


def test_pwc_dc_net_fresh_init():
    model, params = pwc_dc_net()
    assert isinstance(model, PWCDCNet) and model.variant == "new"
    out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 6)))
    assert out.shape == (1, 16, 16, 2)


def test_pwc_dc_net_old_fresh_init():
    model, params = pwc_dc_net_old()
    assert model.variant == "old"
    # old variant has 2 convs/level: conv1aa must not exist
    assert "conv1aa" not in params and "conv1a" in params


def test_pwc_dc_net_loads_torch_checkpoint(tmp_path):
    import torch
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from oracles.torch_pwcnet import OraclePWC
    torch.manual_seed(1)
    oracle = OraclePWC("new")
    p = str(tmp_path / "w.pth.tar")
    torch.save(oracle.state_dict_flat(), p)  # flat layout
    model, params = pwc_dc_net(p)
    np.testing.assert_allclose(
        np.asarray(params["conv1a"]["kernel"]),
        oracle.m["conv1a"][0].weight.detach().numpy().transpose(2, 3, 1, 0))


def test_loader_device_put():
    from opticalflow_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32), "name": f"s{i}"}

    loader = Loader(DS(), 2, shuffle=False, num_workers=1, device_put=True)
    batches = list(loader)
    assert len(batches) == 2
    assert isinstance(batches[0]["x"], jax.Array)
    assert batches[0]["name"] == ["s0", "s1"]
    np.testing.assert_array_equal(np.asarray(batches[0]["x"]),
                                  [[0, 0, 0], [1, 1, 1]])


@pytest.mark.parametrize("layout", ["state_dict", "model", "model_state_dict"])
def test_importer_tolerates_all_reference_layouts(tmp_path, layout):
    """The three torch.save layouts in the wild (models/PWCNet.py:500-506,
    train.py:165-171, train2.py:412-432), with DataParallel prefixes."""
    import torch
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from oracles.torch_pwcnet import OraclePWC
    torch.manual_seed(2)
    oracle = OraclePWC("new")
    sd = {f"module.{k}": v for k, v in oracle.state_dict_flat().items()}
    p = str(tmp_path / "w.pth.tar")
    torch.save({layout: sd, "epoch": 7}, p)
    _, params = pwc_dc_net(p)
    np.testing.assert_allclose(
        np.asarray(params["dc_conv7"]["bias"]),
        oracle.m["dc_conv7"].bias.detach().numpy())
