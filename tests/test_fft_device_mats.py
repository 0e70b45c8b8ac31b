"""Device-generated DFT bases (large n_fft) vs host f64 tables and torch.

At n_fft 8192 the baked cos/sin constants are ~270 MB of HLO — past the
remote compiler's request limit — so large transforms build their bases
on device from integer (t*k) mod n iotas. These tests pin the numerics.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from sesa_tpu.ops.fft import (_irdft_mats, _irdft_mats_dev, _rdft_mats,
                              _rdft_mats_dev, irdft, rdft)
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri


@pytest.mark.parametrize("n", [8192])
def test_device_mats_match_host(n):
    c, s = _rdft_mats(n)
    cd, sd = _rdft_mats_dev(n)
    np.testing.assert_allclose(np.asarray(cd), c, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd), s, atol=1e-6)
    ci, si = _irdft_mats(n)
    cid, sid = _irdft_mats_dev(n)
    np.testing.assert_allclose(np.asarray(cid), ci, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sid), si, atol=1e-9)


def test_rdft_roundtrip_8192():
    x = np.random.default_rng(0).standard_normal((2, 8192)).astype(np.float32)
    spec = rdft(jnp.asarray(x))
    back = irdft(spec, 8192)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-4)


def test_stft_torch_parity_8192():
    """The MDX23C InstVocHQ transform: n_fft 8192 / hop 1024."""
    x = np.random.default_rng(1).standard_normal((2, 44100)).astype(np.float32)
    win = hann_window(8192)
    s = stft_ri(jnp.asarray(x), 8192, 1024, win)
    ref = torch.stft(torch.from_numpy(x), 8192, 1024,
                     window=torch.hann_window(8192), center=True,
                     return_complex=True)
    ref = torch.view_as_real(ref).numpy()
    np.testing.assert_allclose(np.asarray(s), ref, atol=2e-3)

    y = istft_ri(s, 8192, 1024, win, length=44100)
    yref = torch.istft(torch.from_numpy(ref[..., 0] + 1j * ref[..., 1]),
                       8192, 1024, window=torch.hann_window(8192),
                       center=True, length=44100).numpy()
    np.testing.assert_allclose(np.asarray(y), yref, atol=2e-4)
