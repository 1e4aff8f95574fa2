"""LPIPS-alex local-weights path: torch parity of the AlexNet feature
stack + metric invariants + file-resolution behavior."""
import numpy as np
import jax.numpy as jnp
import pytest

from hierslam_tpu.eval import lpips as L


def _random_params(rng):
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    params = {}
    for i, s in enumerate(shapes, start=1):
        params[f"conv{i}_w"] = rng.normal(0, 0.05, s).astype(np.float32)
        params[f"conv{i}_b"] = rng.normal(0, 0.05, s[0]).astype(np.float32)
        params[f"lin{i}_w"] = np.abs(rng.normal(0, 1, s[0])).astype(np.float32)
    return params


def test_alexnet_features_match_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    params = _random_params(rng)
    x = rng.normal(0, 1, (3, 67, 93)).astype(np.float32)

    feats = L.alexnet_features({k: jnp.asarray(v) for k, v in params.items()},
                               jnp.asarray(x))

    h = torch.tensor(x)[None]
    tfeats = []
    for i, (_, stride, pad, pool) in enumerate(L.ALEX_LAYERS, start=1):
        h = F.conv2d(h, torch.tensor(params[f"conv{i}_w"]),
                     torch.tensor(params[f"conv{i}_b"]), stride=stride, padding=pad)
        h = F.relu(h)
        tfeats.append(h[0].numpy())
        if pool:
            h = F.max_pool2d(h, 3, 2)

    for a, b in zip(feats, tfeats):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4)


def test_lpips_distance_invariants(tmp_path):
    rng = np.random.default_rng(1)
    params = _random_params(rng)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **params)
    fn = L.lpips_fn(str(path))
    assert fn is not None
    img = rng.uniform(0, 1, (3, 64, 96)).astype(np.float32)
    other = rng.uniform(0, 1, (3, 64, 96)).astype(np.float32)
    assert fn(img, img) == pytest.approx(0.0, abs=1e-6)
    d = fn(img, other)
    assert np.isfinite(d) and d > 0
    # symmetry
    assert fn(other, img) == pytest.approx(d, rel=1e-5)


def test_lpips_missing_weights_prints_path(capsys, monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    fn = L.lpips_fn("/nonexistent/lpips_alex.npz")
    assert fn is None
    out = capsys.readouterr().out
    assert "lpips_alex.npz" in out and "LPIPS_WEIGHTS" in out
