"""TRAIN.LOAD_IMAGENET: encoder init from a torch ResNet state_dict with
stem widening (reference train_single_ddp.py:186-196)."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tcvom_tpu.models import registry
from tcvom_tpu.utils.checkpoint import load_imagenet_encoder


@pytest.mark.slow
def test_load_imagenet_encoder_fba(rng, tmp_path):
    # a resnet50-GN-shaped state_dict stands in for the ImageNet weights
    # (torchvision resnet50 has the same key schema: conv1, bn1, layerN.M.*)
    from models.FBA.resnet_GN_WS import l_resnet50
    torch.manual_seed(0)
    net = l_resnet50()          # 3-channel stem, like an ImageNet checkpoint
    ckpt = tmp_path / "imagenet_resnet50.pth"
    torch.save(net.state_dict(), str(ckpt))

    module = registry.build_model("fba")
    h = w = 64
    x = jnp.zeros((1, h, w, 11))
    extras = (jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 2)))
    key = jax.random.PRNGKey(0)
    init_vars = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, extras=extras, train=False))()

    merged, missing, unexpected = load_imagenet_encoder(
        "fba", init_vars, str(ckpt))

    # stem widened 3 -> 11 with zero-init extra channels, first 3 preserved
    stem = np.asarray(merged["params"]["encoder"]["conv1"]["kernel"])
    assert stem.shape[2] == 11
    want = net.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem[:, :, :3], want, atol=1e-6)
    assert np.all(stem[:, :, 3:] == 0)

    # a deep layer actually landed
    got = np.asarray(
        merged["params"]["encoder"]["layer3_2"]["conv2"]["kernel"])
    want = net.state_dict()["layer3.2.conv2.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # decoder params are untouched (still the init values) and reported
    # as missing from the ImageNet dict
    assert any(p[1] == "decoder" for p in missing)
    a = jax.tree.leaves(merged["params"]["decoder"])
    b = jax.tree.leaves(init_vars["params"]["decoder"])
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))
