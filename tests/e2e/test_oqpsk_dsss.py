"""802.15.4-style OQPSK-DSSS composition, zero new core code:

- 4-bit symbols -> 32-chip sequences (cyclic shifts of one base PN — the
  802.15.4 structure; table values here are generated, not the standard's)
- half-sine OQPSK chip shaping == MSK, so the CPM transmitter
  (chains.tx.make_cpfsk_tx at h=1/2) is the chip modulator and the
  coherent Laurent receiver (chains.msk) is the chip demod
- symbol recovery = one [nsym, 32] x [32, 16] correlation matmul against
  all sequences (the dsss all-shifts trick)

Demonstrates that a standards-shaped PHY assembles from the framework's
existing pieces."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.dsss import pn_msequence
from srcdsp_tpu.chains.msk import laurent_c0, msk_coherent_demod
from srcdsp_tpu.chains.tx import cpm_tx_apply, cpm_tx_init, make_cpfsk_tx
from srcdsp_tpu.testing.channel import add_noise_snr


def test_oqpsk_dsss_symbol_link():
    sps, sf, nsyms = 4, 32, 64
    # 16 sequences = cyclic shifts (stride 2) of one base 32-chip PN
    base = np.concatenate([pn_msequence((5, 2), 5), [1.0]])  # 31+1 chips
    seqs = np.stack([np.roll(base, 2 * s) for s in range(16)])  # [16, 32]
    chips_pm1 = seqs                                           # +-1

    rng = np.random.default_rng(0)
    syms = rng.integers(0, 16, nsyms)
    chip_bits = ((1.0 - chips_pm1[syms].reshape(-1)) / 2).astype(int)

    # half-sine OQPSK == MSK: CPM with h=1/2, rectangular pulse
    txp = make_cpfsk_tx(0.0, sps=sps, dev=0.25 / sps)
    _, x = cpm_tx_apply(txp, cpm_tx_init(txp), jnp.asarray(chip_bits))
    x = add_noise_snr(jax.random.PRNGKey(1), x, 8.0)   # chip Eb/N0 ~8 dB

    c0 = laurent_c0(sps, bt=None, c_span=2)
    chip_hat, soft = msk_coherent_demod(x, sps, c0)
    soft = np.asarray(soft)                            # alpha_k products

    # chips from the differential soft stream; find the demod's group
    # delay on the alpha streams first
    from srcdsp_tpu.metrics import align_sequences
    want_alpha = 2.0 * chip_bits[1:] - 1.0
    hat_alpha = np.sign(soft)
    lag, a, b = align_sequences((want_alpha > 0).astype(int),
                                (hat_alpha > 0).astype(int), max_lag=8)
    assert lag >= 0 and np.mean(a != b) < 0.02, (lag, np.mean(a != b))

    # alpha_k = 2 b_k - 1 = -chip_k: the differential soft output IS the
    # (negated) chip stream directly — no cumulative reconstruction, so
    # chip errors do not propagate. soft[j] covers chip index j+1+lag.
    flat = chips_pm1[syms].reshape(-1)
    chips_hat = -hat_alpha                           # estimate of flat[j+1+lag]
    off = 1 + lag
    n_use = min(chips_hat.size, flat.size - off)
    # correlate whole symbols fully covered by [off, off + n_use)
    s0 = (off + sf - 1) // sf
    s1 = (off + n_use) // sf
    frames = np.stack([chips_hat[s * sf - off: (s + 1) * sf - off]
                       for s in range(s0, s1)])
    corr = frames @ chips_pm1.T                      # [nsym_used, 16]
    got = np.argmax(corr, axis=-1)
    errs = int((got != syms[s0:s1]).sum())
    assert s1 - s0 >= nsyms - 3                      # almost all symbols
    assert errs == 0, errs
