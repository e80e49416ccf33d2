"""Parity tests for positional encoding and SSIM against the reference math
(implemented with torch CPU as oracle)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from behindthescenes_tpu.ops import PositionalEncoding, ssim


def _torch_posenc(x, num_freqs, freq_factor, include_input):
    # Re-derivation of reference code.py:30-42 semantics.
    freqs = freq_factor * 2.0 ** torch.arange(0, num_freqs)
    _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    _phases = torch.zeros(2 * num_freqs)
    _phases[1::2] = np.pi * 0.5
    _phases = _phases.view(1, -1, 1)
    xt = torch.from_numpy(x)
    embed = xt.unsqueeze(1).repeat(1, num_freqs * 2, 1)
    embed = torch.sin(torch.addcmul(_phases, embed, _freqs))
    embed = embed.view(x.shape[0], -1)
    if include_input:
        embed = torch.cat((xt, embed), dim=-1)
    return embed.numpy()


@pytest.mark.parametrize("include_input", [True, False])
@pytest.mark.parametrize("freq_factor", [1.5, float(np.pi)])
def test_posenc_parity(include_input, freq_factor):
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=freq_factor,
                            include_input=include_input)
    got = np.asarray(pe(jnp.asarray(x)))
    expected = _torch_posenc(x, 6, freq_factor, include_input)
    assert got.shape[-1] == pe.d_out
    np.testing.assert_allclose(got, expected, atol=1e-5)


class _TorchGaussianAverage(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.window = torch.Tensor([
            [0.0947, 0.1183, 0.0947],
            [0.1183, 0.1478, 0.1183],
            [0.0947, 0.1183, 0.0947]])

    def forward(self, x):
        kernel = self.window.to(x.dtype).repeat(x.shape[1], 1, 1, 1)
        return F.conv2d(x, kernel, padding=0, groups=x.shape[1])


def _torch_ssim(x, y, pad_reflection, gaussian_average, comp_mode):
    # Re-derivation of reference layers.py:92-150 semantics.
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    pad = torch.nn.ReflectionPad2d(1) if pad_reflection else torch.nn.ZeroPad2d(1)
    pool = _TorchGaussianAverage() if gaussian_average else torch.nn.AvgPool2d(3, 1)
    xt, yt = pad(xt), pad(yt)
    mu_x, mu_y = pool(xt), pool(yt)
    sigma_x = pool(xt ** 2) - mu_x ** 2
    sigma_y = pool(yt ** 2) - mu_y ** 2
    sigma_xy = pool(xt * yt) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sigma_xy + 0.03 ** 2)
    d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sigma_x + sigma_y + 0.03 ** 2)
    if comp_mode:
        return (torch.clamp(1 - n / d, 0, 1) / 2).numpy()
    return torch.clamp((1 - n / d) / 2, 0, 1).numpy()


@pytest.mark.parametrize("pad_reflection", [False, True])
@pytest.mark.parametrize("gaussian_average", [False, True])
@pytest.mark.parametrize("comp_mode", [False, True])
def test_ssim_parity(pad_reflection, gaussian_average, comp_mode):
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 3, 8, 9)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    expected = _torch_ssim(x, y, pad_reflection, gaussian_average, comp_mode)
    got = np.asarray(ssim(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
        pad_reflection=pad_reflection, gaussian_average=gaussian_average,
        comp_mode=comp_mode))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), expected,
                               atol=1e-5)
