"""Positional encoding vs the torch reference formula."""
import numpy as np
import torch

from pixelnerf_tpu.models.code import PositionalEncoding


def _torch_reference(x, num_freqs, freq_factor, include_input):
    """Independent torch computation of the reference's encoding
    (sin(phases + x * interleaved_freqs), frequency-major layout)."""
    freqs = freq_factor * 2.0 ** torch.arange(0, num_freqs)
    _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    _phases = torch.zeros(2 * num_freqs)
    _phases[1::2] = np.pi * 0.5
    _phases = _phases.view(1, -1, 1)
    embed = x.unsqueeze(1).repeat(1, num_freqs * 2, 1)
    embed = torch.sin(torch.addcmul(_phases, embed, _freqs))
    embed = embed.view(x.shape[0], -1)
    if include_input:
        embed = torch.cat((x, embed), dim=-1)
    return embed


def test_matches_reference_defaults():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 3)).astype(np.float32)
    pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=1.5, include_input=True)
    assert pe.d_out == 39
    ours = np.asarray(pe(x))
    theirs = _torch_reference(torch.tensor(x), 6, 1.5, True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_no_include_input():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 4)).astype(np.float32)
    pe = PositionalEncoding(num_freqs=3, d_in=4, freq_factor=np.pi, include_input=False)
    assert pe.d_out == 24
    ours = np.asarray(pe(x))
    theirs = _torch_reference(torch.tensor(x), 3, np.pi, False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_batched_leading_dims():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 7, 3)).astype(np.float32)
    pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=1.5)
    out = np.asarray(pe(x))
    flat = np.asarray(pe(x.reshape(-1, 3)))
    np.testing.assert_allclose(out.reshape(-1, pe.d_out), flat, atol=1e-6)
